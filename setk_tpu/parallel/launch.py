"""Multi-host launch helpers.

The reference dispatches SGE task arrays (utils/queue.pl); the TPU-native
equivalent is one process per host joined through jax.distributed, with
manifest shards assigned by process index (executor.shard_manifest).
"""

import os

from setk_tpu.utils.logger import get_logger

logger = get_logger(__name__)

__all__ = ["init_distributed", "process_info"]


def init_distributed(coordinator_address=None,
                     num_processes=None,
                     process_id=None):
    """Initialize jax.distributed from args or the standard env vars.

    No-op on single-process setups (when no coordinator is configured).
    """
    import jax
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        logger.info("Single-process mode (no coordinator configured)")
        return False
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info(f"jax.distributed up: process {jax.process_index()} "
                f"of {jax.process_count()}")
    return True


def process_info():
    """(process_index, process_count) — manifest shard assignment."""
    import jax
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1
