"""Tracing & throughput observability.

The reference has no profiling subsystem — only an ad-hoc RTF printout
in wav_simulate (/root/reference/scripts/sptk/wav_simulate.py:319-325)
and timeit notes in docstrings (libs/utils.py:31-37).  Here both are
first-class:

  * ``ThroughputMeter`` — audio-seconds/s (+ RTF, the inverse) counters
    with periodic logging, used by the batch executors and CLIs.
  * ``trace`` — context manager around ``jax.profiler.trace`` producing
    TensorBoard/XProf traces of the compiled TPU programs.
  * ``annotate`` — named trace regions (shows up on the TraceViewer
    timeline and in ``jax.profiler`` summaries).
"""

import contextlib
import time

from setk_tpu.utils.logger import get_logger

logger = get_logger(__name__)

__all__ = ["ThroughputMeter", "trace", "annotate"]


class ThroughputMeter:
    """Accumulate processed audio seconds against wall-clock time.

    ``update(audio_seconds)`` after each batch; ``rate()`` returns
    audio-seconds per wall second (higher is better), ``rtf()`` the
    real-time factor (processing seconds per audio second, lower is
    better — the reference's simulation metric).
    """

    def __init__(self, name: str = "pipeline", report_every: int = 0):
        self.name = name
        self.report_every = report_every
        self.audio_seconds = 0.0
        self.num_updates = 0
        self._start = time.perf_counter()

    def reset(self):
        self.audio_seconds = 0.0
        self.num_updates = 0
        self._start = time.perf_counter()

    @property
    def wall_seconds(self) -> float:
        return time.perf_counter() - self._start

    def update(self, audio_seconds: float):
        self.audio_seconds += float(audio_seconds)
        self.num_updates += 1
        if self.report_every and self.num_updates % self.report_every == 0:
            self.report()

    def rate(self) -> float:
        wall = self.wall_seconds
        return self.audio_seconds / wall if wall > 0 else 0.0

    def rtf(self) -> float:
        return self.wall_seconds / self.audio_seconds \
            if self.audio_seconds > 0 else float("inf")

    def report(self):
        logger.info(
            "%s: %.1f audio-s in %.2f s (%.1f audio-s/s, RTF %.2e)",
            self.name, self.audio_seconds, self.wall_seconds, self.rate(),
            self.rtf())


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax profiler trace into ``logdir`` (no-op if falsy).

    View with TensorBoard's profile plugin or xprof; covers XLA
    compilation, device compute, and host<->device transfers.
    """
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(str(logdir)):
        yield
    logger.info("jax profiler trace written to %s", logdir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region on the profiler timeline (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
