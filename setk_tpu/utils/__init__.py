from setk_tpu.utils.logger import get_logger
from setk_tpu.utils.common import EPSILON, MAX_INT16, nextpow2, filekey, check_doa

__all__ = [
    "get_logger", "EPSILON", "MAX_INT16", "nextpow2", "filekey", "check_doa"
]
