from setk_tpu.parallel.mesh import make_mesh, factor_devices
from setk_tpu.parallel.enhance_step import (sharded_enhance_step,
                                            seq_parallel_covar)
from setk_tpu.parallel.wpe_step import (sharded_wpe_step,
                                        sharded_wpd_step)

__all__ = [
    "make_mesh", "factor_devices", "sharded_enhance_step",
    "seq_parallel_covar", "sharded_wpe_step", "sharded_wpd_step"
]
