"""Profiling, logging, and metric-formatting utilities."""
import logging

import jax
import jax.numpy as jnp
import numpy as np

from chd_tpu.utils import metrics as metrics_lib
from chd_tpu.utils.log import get_logger, stage_timer
from chd_tpu.utils.profiling import benchmark


def test_benchmark_times_jitted_fn():
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    stats = benchmark(f, jnp.arange(1024.0), warmup=1, iters=3)
    assert stats["mean_s"] > 0
    assert np.isclose(stats["iters_per_s"], 1.0 / stats["mean_s"])


def test_stage_timer_logs(caplog):
    log = get_logger("test")
    root = get_logger()
    root.propagate = True  # chd_tpu logger doesn't propagate by default
    try:
        with caplog.at_level(logging.INFO, logger="chd_tpu"):
            with stage_timer("unit-stage", log):
                pass
    finally:
        root.propagate = False
    text = " | ".join(r.getMessage() for r in caplog.records)
    assert "unit-stage" in text and "done" in text


def test_format_metrics():
    c = metrics_lib.Confusion(
        jnp.asarray(10), jnp.asarray(2), jnp.asarray(3), jnp.asarray(40)
    )
    m = metrics_lib.metrics_from_confusion(c)
    s = metrics_lib.format_metrics(m)
    assert "accuracy" in s and "F1" in s
    assert np.isclose(float(m["accuracy"]), (10 + 40) / 55)
