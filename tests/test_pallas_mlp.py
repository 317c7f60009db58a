"""Pallas fused MLP vs the plain jnp folded forward (interpreter on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from chd_tpu.models import contact_mlp
from chd_tpu.ops.pallas_mlp import fused_mlp


def test_fused_mlp_matches_folded():
    cfg = contact_mlp.ModelConfig()
    params, state = contact_mlp.init(jax.random.PRNGKey(0), cfg)
    folded = contact_mlp.fold_batchnorm(params, state)
    folded = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)

    rng = np.random.default_rng(0)
    for B in [1, 7, 256, 300]:
        x = jnp.asarray(
            rng.normal(size=(B, cfg.window_size, cfg.num_joints, cfg.feat_size)),
            jnp.float32,
        )
        ref = contact_mlp.apply_folded(folded, x, cfg.pred_size)
        got = fused_mlp(folded, x, cfg.pred_size, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)
