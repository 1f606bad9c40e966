from setk_tpu.ops.linalg import (hermitianize, solve_pevd, generalized_eigh,
                                 principal_eigvec, regularized_inverse,
                                 power_iteration)

__all__ = [
    "hermitianize", "solve_pevd", "generalized_eigh", "principal_eigvec",
    "regularized_inverse", "power_iteration"
]
