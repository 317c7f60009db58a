"""Multi-process / multi-slice distributed backend.

The reference is strictly single-machine (SURVEY §2.6/§5: no NCCL/MPI/Gloo
layer anywhere); its only scale story is a per-video subprocess loop. The
TPU-native equivalent for the full-dataset sweep (BASELINE config #5, the
52 GB Mixamo set) is:

- one JAX process per host, joined with ``jax.distributed.initialize``
  (GRPC coordination; PJRT exposes every chip in the pod to every process),
- a hybrid mesh whose inner axes ride ICI within a slice and whose outer
  "slice" axis crosses DCN — only the data axis is ever placed on DCN, so
  cross-slice traffic is limited to the metric all-reduces of training and
  result gathers of the batched solvers (cheap, latency-tolerant),
- per-process data loading: each host reads its own shard of video dirs and
  assembles global arrays with ``jax.make_array_from_process_local_data``.

On a single process this module degrades to the plain ('data','model') mesh
from ``parallel.mesh`` — every entry point is safe to call unconditionally.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process runtime. Returns True if running distributed.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax.distributed can also
    autodetect all three from the metadata server. No-op (False) when
    nothing indicates a multi-process run.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        return False  # single-process run; nothing to join

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def make_global_mesh(
    model: int = 1,
    n_slices: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('slice', 'data', 'model') mesh: 'slice' crosses DCN, the rest ICI.

    ``n_slices`` defaults to the process count on multi-host (one slice per
    host group) or 1 locally. Device order within each slice is preserved so
    the inner axes map onto the slice's ICI torus; only 'slice' pays DCN
    latency, and shardings in this package only ever put the batch axis
    there.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_slices is None:
        try:
            n_slices = max(
                len({getattr(d, "slice_index", 0) for d in devices}), 1
            )
        except Exception:
            n_slices = 1
    if n % n_slices:
        raise ValueError(f"devices({n}) not divisible by slices({n_slices})")
    per = n // n_slices
    if per % model:
        raise ValueError(f"per-slice devices({per}) not divisible by model({model})")
    arr = np.asarray(devices).reshape(n_slices, per // model, model)
    return Mesh(arr, ("slice", "data", "model"))


def batch_spec() -> P:
    """Batch axis sharded over both the DCN and ICI data axes."""
    return P(("slice", "data"))


def shard_global_batch(mesh: Mesh, x):
    """Place a leading-batch pytree split over ('slice','data')."""
    s = NamedSharding(mesh, batch_spec())
    return jax.tree.map(lambda a: jax.device_put(a, s), x)


def process_local_slice(n_items: int) -> slice:
    """This process's contiguous shard of a length-n_items dataset (per-host
    data loading: each host only reads its own video dirs)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = -(-n_items // pc)  # ceil
    return slice(pi * per, min((pi + 1) * per, n_items))


def global_batch_from_local(mesh: Mesh, local: np.ndarray, global_shape0: int):
    """Assemble a globally-sharded array from this process's local rows."""
    shape = (global_shape0,) + tuple(local.shape[1:])
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, batch_spec()), np.asarray(local), shape
    )
