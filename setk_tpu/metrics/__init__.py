from setk_tpu.metrics.sisnr import si_snr, permute_si_snr, batch_si_snr
from setk_tpu.metrics.wer import edit_distance, permute_ed
from setk_tpu.metrics.bss import bss_eval_sdr

__all__ = [
    "si_snr", "permute_si_snr", "batch_si_snr", "edit_distance", "permute_ed",
    "bss_eval_sdr"
]
