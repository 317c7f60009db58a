"""Device mesh + sharding utilities.

The reference has no distributed layer at all (SURVEY §2.6: a num_processes=1
multiprocessing pool and a latent, broken DataParallel wrap). Here scaling is
SPMD over a ``jax.sharding.Mesh``:

- axis "data":  batches of sequences/windows (the pipeline's natural unit —
  replaces the per-video subprocess loop of scripts/run_phys_mocap.py:80);
- axis "model": tensor-parallel sharding of the contact MLP's hidden dims.

Everything goes through ``jax.jit`` with NamedSharding constraints; XLA
inserts the psum/all-gather collectives over ICI. BatchNorm batch statistics
become global automatically: ``mean(axis=0)`` over a data-sharded activation
is a cross-replica reduction under jit (sync-BN for free).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data({data}) × model({model}) != devices({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, x):
    """Place a leading-batch array/pytree with batch split over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, s), x)


def replicate(mesh: Mesh, x):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), x)


def contact_model_shardings(mesh: Mesh):
    """Tensor-parallel PartitionSpecs for the contact MLP param/state trees.

    Hidden layers are column-parallel on the output features ('model' axis);
    consecutive layers therefore alternate gather points, which XLA resolves
    with all-gathers on ICI. BN vectors follow their layer's feature axis.
    The final (tiny) head is replicated.
    """
    specs_params = {}
    specs_state = {}
    n_hidden = 4
    for i in range(n_hidden + 1):
        if i < n_hidden:
            specs_params[f"linear{i}"] = {"w": P("model", None), "b": P("model")}
            specs_params[f"bn{i}"] = {"scale": P("model"), "bias": P("model")}
            specs_state[f"bn{i}"] = {"mean": P("model"), "var": P("model")}
        else:
            specs_params[f"linear{i}"] = {"w": P(None, "model"), "b": P()}
    return specs_params, specs_state


def named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
