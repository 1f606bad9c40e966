from setk_tpu.models.mask_net import MaskNet, make_model

__all__ = ["MaskNet", "make_model"]
