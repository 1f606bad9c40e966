"""Command-line surface mirroring the reference sptk command set.

Every command is a module with ``make_parser()`` + ``run(args)`` and can
be invoked as ``python -m setk_tpu.cli.<command> ...`` or through the
``python -m setk_tpu.cli <command> ...`` dispatcher.  Flag names follow
the reference CLIs (frame-len/frame-hop/center/round-power-of-two/window,
scp/ark/dir conventions) so existing recipes translate directly.
"""
