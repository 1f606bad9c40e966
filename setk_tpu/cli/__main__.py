"""Dispatcher: ``python -m setk_tpu.cli <command> [args...]``.

Set SETK_TPU_PLATFORM=cpu (or tpu/axon) to pin the jax platform: the
axon sitecustomize imports jax at interpreter start, so JAX_PLATFORMS
alone cannot switch platforms in a subprocess — this applies the
override programmatically before any backend initializes.
"""

import importlib
import os
import pkgutil
import sys

import setk_tpu.cli as cli_pkg

_platform = os.environ.get("SETK_TPU_PLATFORM")
if _platform:
    import jax
    jax.config.update("jax_platforms", _platform)

_EXCLUDE = {"common", "__main__"}


def available_commands():
    return sorted(
        name for _, name, _ in pkgutil.iter_modules(cli_pkg.__path__)
        if name not in _EXCLUDE)


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("Usage: python -m setk_tpu.cli <command> [args...]\n")
        print("Commands:")
        for name in available_commands():
            print(f"  {name}")
        return 0
    command = sys.argv[1]
    if command not in available_commands():
        print(f"Unknown command: {command}", file=sys.stderr)
        return 1
    mod = importlib.import_module(f"setk_tpu.cli.{command}")
    args = mod.make_parser().parse_args(sys.argv[2:])
    mod.run(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
