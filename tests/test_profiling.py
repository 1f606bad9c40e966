"""Observability layer: throughput meters and jax profiler tracing."""

import os

import jax.numpy as jnp

from setk_tpu.utils.profiling import ThroughputMeter, trace, annotate


def test_throughput_meter_rates():
    meter = ThroughputMeter("test")
    meter.update(4.0)
    meter.update(6.0)
    assert meter.audio_seconds == 10.0
    assert meter.num_updates == 2
    wall = meter.wall_seconds
    assert meter.rate() > 0 and meter.rtf() > 0
    # consistency against a wall snapshot (the live clock keeps moving)
    assert meter.rate() <= 10.0 / wall + 1e-6
    assert meter.rtf() >= wall / 10.0 - 1e-6
    meter.report()  # smoke: logs without raising
    meter.reset()
    assert meter.audio_seconds == 0.0 and meter.num_updates == 0


def test_trace_noop_when_disabled():
    with trace(""):
        pass  # must not require jax import side effects


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace(logdir):
        with annotate("matmul"):
            x = jnp.ones((8, 8))
            float(jnp.sum(x @ x))
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(f for f in files if f.endswith(".xplane.pb"))
    assert found, f"no trace artifacts under {logdir}"
