"""Import-only librosa shim for running the reference toolkit as a
subprocess (librosa is not installed in this image).  The simulation
path (`wav_simulate.py`) never calls into it — `libs/utils.py` merely
imports the module at top level.  Any actual call is a loud error.
"""


def _unavailable(*_a, **_kw):
    raise NotImplementedError(
        "librosa is not installed; this stub only satisfies the "
        "reference's top-level import for non-STFT code paths")


stft = _unavailable
istft = _unavailable
