"""Vectorized One-Euro filter.

Speed-adaptive low-pass filter (Casiez/Roussel). The reference vendors the
original scalar-object implementation (src/optimize/OneEuroFilter.py:13-81)
and loops it over every (joint, dim) track (openpose_utils.filter_poses:78-96);
here the recurrence is a single ``lax.scan`` over time carrying the filter
state for ALL tracks at once.

Parity notes (matched deliberately): the first sample passes through
unfiltered; the derivative estimate at t=0 is 0; and when integer timestamps
are supplied, the sampling frequency only starts updating from the third
sample because the reference guards with truthiness (`if lasttime and
timestamp`) so t=0 never arms the update.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def one_euro_filter(x, freq=1.0, mincutoff=0.05, beta=0.4, dcutoff=1.0, timestamps=None):
    """Filter ``x`` (F, ...) along the leading time axis.

    With ``timestamps`` (F,) given, reproduces the reference's per-call
    frequency update; otherwise uses fixed ``freq``.
    """
    x = jnp.asarray(x)
    F = x.shape[0]
    if timestamps is None:
        ts = jnp.arange(F, dtype=x.dtype)
        use_ts = False
    else:
        ts = jnp.asarray(timestamps, dtype=x.dtype)
        use_ts = True

    def alpha(cutoff, f):
        te = 1.0 / f
        tau = 1.0 / (2.0 * math.pi * cutoff)
        return 1.0 / (1.0 + tau / te)

    def step(carry, inp):
        prev_x, s_x, s_dx, last_t, f, started = carry
        xt, t = inp
        # reference: freq updates only when BOTH last timestamp and current
        # timestamp are truthy (OneEuroFilter.py:71-73)
        new_f = jnp.where(
            use_ts & (last_t != 0.0) & (t != 0.0) & started, 1.0 / (t - last_t), f
        )
        dx = jnp.where(started, (xt - prev_x) * new_f, 0.0)
        a_d = alpha(dcutoff, new_f)
        edx = jnp.where(started, a_d * dx + (1.0 - a_d) * s_dx, dx)
        cutoff = mincutoff + beta * jnp.abs(edx)
        a_x = alpha(cutoff, new_f)
        out = jnp.where(started, a_x * xt + (1.0 - a_x) * s_x, xt)
        return (xt, out, edx, t, new_f, jnp.ones_like(started)), out

    init = (
        jnp.zeros_like(x[0]),
        jnp.zeros_like(x[0]),
        jnp.zeros_like(x[0]),
        jnp.zeros((), dtype=x.dtype),
        jnp.full((), float(freq), dtype=x.dtype),
        jnp.zeros((), dtype=bool),
    )
    _, out = jax.lax.scan(step, init, (x, ts))
    return out


def filter_poses(poses, fcmin=0.05, beta=0.4, freq=1.0):
    """Drop-in equivalent of openpose_utils.filter_poses (integer timestamps)."""
    return one_euro_filter(
        poses, freq=freq, mincutoff=fcmin, beta=beta, dcutoff=1.0,
        timestamps=jnp.arange(poses.shape[0]),
    )
