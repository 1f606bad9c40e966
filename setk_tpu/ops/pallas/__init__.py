from setk_tpu.ops.pallas.covariance import masked_covar_pallas

__all__ = ["masked_covar_pallas"]
