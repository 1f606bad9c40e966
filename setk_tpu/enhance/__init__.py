from setk_tpu.enhance.masks import (compute_mask, sigmoid_compress,
                                    tangent_compress)
from setk_tpu.enhance import beamformer

__all__ = [
    "compute_mask", "sigmoid_compress", "tangent_compress", "beamformer"
]
