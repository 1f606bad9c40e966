from setk_tpu.dsp.window import make_window, window_sumsquare
from setk_tpu.dsp.stft import (StftConfig, forward_stft, inverse_stft,
                               frame_signal, num_frames)
from setk_tpu.dsp.griffin_lim import griffin_lim
from setk_tpu.dsp.mel import mel_filterbank, mel_fbank

__all__ = [
    "make_window", "window_sumsquare", "StftConfig", "forward_stft",
    "inverse_stft", "frame_signal", "num_frames", "griffin_lim",
    "mel_filterbank", "mel_fbank"
]
