"""Contact-phase duration optimization (physics stage 3).

The reference makes phase durations decision variables of the TOWR NLP
(phys_optim.cpp:663-711: PhaseDurations variable sets + TotalTime
constraint + DurationCost, with a stage-4 frozen-duration fallback on
failure :713-749). TOWR re-parameterizes the whole spline structure per
duration change — variable problem *structure*, hostile to XLA.

TPU-native reformulation: the frame-grid contact masks become a SMOOTH
function of the duration vector. Each contact phase [a_k, b_k] (boundaries
= cumulative durations) contributes a soft window σ((t−a_k)/τ)·σ((b_k−t)/τ);
the per-frame contact value is the sum over contact phases. Everything the
mask touches (dynamics force masking, terrain, no-slip, friction) is then
differentiable w.r.t. durations, so they join the LM/AL variable vector
directly. Constraints follow the reference:

- duration cost ½·w_dur·Σ(d_init − d)² over the first N−1 phases of each EE
  (duration_cost.cpp:25-49);
- total time Σd = T per EE (TOWR TotalDurationConstraint semantics,
  parameters.cpp:140-151: all EEs' sums equal);
- d_k ≥ min duration (phase-duration bounds, parameters.cpp:66-70).

Ragged phase counts pad to a common P_max with zero-length phases whose
windows are hard-masked out.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .prepare import contact_durations


class DurationSpec(NamedTuple):
    durations: jnp.ndarray      # (4, P_max) padded phase durations (s)
    phase_mask: jnp.ndarray     # (4, P_max) 1 for real phases
    contact_phase: jnp.ndarray  # (4, P_max) 1 if the phase is a contact phase
    total_time: jnp.ndarray     # () seconds


def build_duration_spec(contact: np.ndarray, dt: float) -> DurationSpec:
    """From binary (4, F) schedules → padded duration arrays."""
    durs = [contact_durations(np.asarray(contact[e]), dt) for e in range(contact.shape[0])]
    P = max(len(d) for d in durs)
    d = np.zeros((contact.shape[0], P))
    m = np.zeros((contact.shape[0], P))
    cp = np.zeros((contact.shape[0], P))
    for e, dd in enumerate(durs):
        d[e, : len(dd)] = dd
        m[e, : len(dd)] = 1.0
        start = bool(contact[e, 0])
        for k in range(len(dd)):
            cp[e, k] = 1.0 if (k % 2 == 0) == start else 0.0
    total = float(np.sum(d[0]))
    return DurationSpec(
        jnp.asarray(d, jnp.float32), jnp.asarray(m, jnp.float32),
        jnp.asarray(cp, jnp.float32), jnp.asarray(total, jnp.float32),
    )


def soft_contact(spec_durations, spec: DurationSpec, F: int, dt, tau=None):
    """(4, F) smooth contact values from (possibly updated) durations.

    tau: sigmoid sharpness (default dt/2 — transitions resolve within a
    frame at convergence)."""
    if tau is None:
        tau = dt * 0.5
    # evaluate at frame CENTERS so a frame sitting exactly on a phase
    # boundary belongs to the phase that starts there (matches the binary
    # schedule from find_contact_durations, which sums to (F−1)·dt)
    t = (jnp.arange(F, dtype=spec_durations.dtype) + 0.5) * dt  # (F,)
    d = spec_durations * spec.phase_mask
    ends = jnp.cumsum(d, axis=1)                  # (4, P)
    starts = ends - d
    # the last real phase is open-ended (it absorbs the final frame, which
    # lies past the (F−1)·dt duration total)
    P = d.shape[1]
    last_idx = (spec.phase_mask.sum(axis=1) - 1).astype(jnp.int32)
    is_last = jnp.arange(P)[None, :] == last_idx[:, None]
    ends = jnp.where(is_last, 1e6, ends)
    up = jax.nn.sigmoid((t[None, None, :] - starts[..., None]) / tau)
    down = jax.nn.sigmoid((ends[..., None] - t[None, None, :]) / tau)
    windows = up * down                            # (4, P, F)
    live = (spec.contact_phase * spec.phase_mask * (d > 1e-6))[..., None]
    return jnp.clip(jnp.sum(windows * live, axis=1), 0.0, 1.0)


def duration_residuals(
    durations,
    spec: DurationSpec,
    w_dur: float,
    rho_total: float = 100.0,
    min_duration: float = 0.05,
):
    """Cost + constraint residuals on the duration variables themselves."""
    m = spec.phase_mask
    # keep close to initialization, excluding each EE's last real phase
    # (duration_cost.cpp counts the first N−1)
    last_idx = (m.sum(axis=1) - 1).astype(jnp.int32)
    not_last = m * (jnp.arange(m.shape[1])[None, :] != last_idx[:, None])
    r_cost = jnp.sqrt(w_dur) * not_last * (durations - spec.durations)
    # total time equality per EE
    r_total = jnp.sqrt(rho_total) * (jnp.sum(durations * m, axis=1) - spec.total_time)
    # minimum duration hinge on real phases
    r_min = jnp.sqrt(rho_total) * m * jnp.maximum(min_duration - durations, 0.0)
    return jnp.concatenate([r_cost.reshape(-1), r_total.reshape(-1), r_min.reshape(-1)])


def rasterize(durations, spec: DurationSpec, F: int, dt) -> jnp.ndarray:
    """Durations → hard binary (4, F) schedule (midpoint rule)."""
    soft = soft_contact(durations, spec, F, dt, tau=dt * 0.05)
    return (soft > 0.5).astype(jnp.float32)
