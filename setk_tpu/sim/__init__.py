from setk_tpu.sim.rir import (rir_generate, beta_from_t60, t60_from_beta,
                              MIC_PATTERNS)
from setk_tpu.sim.sampler import UniformSampler
from setk_tpu.sim import mixer

__all__ = [
    "rir_generate", "beta_from_t60", "t60_from_beta", "MIC_PATTERNS",
    "UniformSampler", "mixer"
]
