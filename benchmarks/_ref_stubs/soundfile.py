"""Minimal soundfile shim so the REFERENCE toolkit can run as a
subprocess in this image (soundfile/libsndfile are not installed).

Only the surface `/root/reference/scripts/sptk/libs/utils.py:45-92`
touches: ``read(fname, start=, stop=, dtype=)`` -> (samps, sr) with
samps N or N x C, and ``write(fname, samps, sr)``.  Backed by the
stdlib ``wave`` module (PCM16); float data is scaled/clipped to int16
on write and back to [-1, 1) float32 on read — bit-fidelity is not
required here (the head-to-head parses only the printed RTF), byte IO
realism is.
"""

import wave as _wave

import numpy as np


def read(fname, start=0, stop=None, dtype="float32", **_kw):
    start = 0 if start is None else start
    with _wave.open(fname, "rb") as fd:
        sr = fd.getframerate()
        channels = fd.getnchannels()
        width = fd.getsampwidth()
        if width != 2:
            raise ValueError(f"stub soundfile reads PCM16 only, got "
                             f"width={width} in {fname}")
        total = fd.getnframes()
        stop = total if stop is None else min(stop, total)
        fd.setpos(start)
        raw = fd.readframes(max(stop - start, 0))
    samps = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    if dtype == "float32":
        samps = samps.astype(np.float32) / 32768.0
    else:
        samps = samps.astype(dtype)
    if channels == 1:
        samps = samps[:, 0]
    return samps, sr


def write(fname, samps, sr, **_kw):
    samps = np.asarray(samps)
    if samps.ndim == 1:
        samps = samps[:, None]          # N -> N x 1
    if np.issubdtype(samps.dtype, np.floating):
        samps = np.clip(samps, -1.0, 32767.0 / 32768.0)
        samps = (samps * 32768.0).astype("<i2")
    else:
        samps = samps.astype("<i2")
    with _wave.open(fname, "wb") as fd:
        fd.setnchannels(samps.shape[1])
        fd.setsampwidth(2)
        fd.setframerate(int(sr))
        fd.writeframes(np.ascontiguousarray(samps).tobytes())
