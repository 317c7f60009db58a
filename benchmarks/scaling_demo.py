"""Scale demonstration (BASELINE config #5 shape, SURVEY §7 step 8).

Builds a synthetic Mixamo-layout dataset (Character/Motion/viewN tree with
keypoints_viewN JSON + foot_contacts.npy, the layout of the reference's 52GB
set — contact_data_utils.py:8-30), loads it through ContactDataset.load,
then runs the sharded stages over 'data'-axis meshes of increasing size and
records throughput:

  train     — lax.scan'd train_epoch, batch sharded over 'data' (sync-BN dp)
  contact   — batched full-video detect (512 sequences)
  kinematic — optimize_trajectory_batch (reduced iteration budget)
  physics   — solve_physics_batch stages 1-2 (reduced budget)

Run on the virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling_demo.py

NOTE on interpretation: on a host with fewer physical cores than virtual
devices, wall-clock cannot scale with mesh size — the table demonstrates
that every stage EXECUTES correctly under each sharding (the XLA SPMD
partitioner accepts the layout and results stay finite/consistent), and on
real multi-chip hardware the same jit functions scale via ICI collectives.
Record results in BASELINE.md.
"""
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import time

import numpy as np

N_SEQ = int(os.environ.get("CHD_SCALE_SEQS", "512"))
FRAMES = int(os.environ.get("CHD_SCALE_FRAMES", "60"))
MESHES = [int(x) for x in os.environ.get("CHD_SCALE_DEVICES", "1,2,4,8").split(",")]
HEAVY_MESHES = [int(x) for x in os.environ.get("CHD_SCALE_HEAVY_DEVICES", "1,8").split(",")]
DISK_CHARS, DISK_MOTIONS, DISK_VIEWS = 2, 4, 2  # on-disk layout smoke subset


def build_disk_dataset(root, rng):
    """Small on-disk Mixamo-layout tree exercising ContactDataset.load."""
    import json as json_lib

    for c in range(DISK_CHARS):
        for m in range(DISK_MOTIONS):
            mdir = os.path.join(root, f"char{c}", f"motion{m}")
            contacts = (rng.uniform(size=(FRAMES, 4)) > 0.5).astype(np.float32)
            os.makedirs(mdir, exist_ok=True)
            np.save(os.path.join(mdir, "foot_contacts.npy"), contacts)
            for v in range(DISK_VIEWS):
                os.makedirs(os.path.join(mdir, f"view{v}"), exist_ok=True)
                kdir = os.path.join(mdir, f"keypoints_view{v}")
                os.makedirs(kdir, exist_ok=True)
                kp = np.zeros((FRAMES, 25, 3))
                kp[..., 0] = rng.uniform(300, 900, (FRAMES, 25))
                kp[..., 1] = rng.uniform(100, 600, (FRAMES, 25))
                kp[..., 2] = rng.uniform(0.3, 1.0, (FRAMES, 25))
                for f in range(FRAMES):
                    payload = {"people": [{"pose_keypoints_2d": kp[f].reshape(-1).tolist()}]}
                    with open(os.path.join(kdir, f"f{f:05d}_keypoints.json"), "w") as fh:
                        json_lib.dump(payload, fh)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache opt-in only — see tests/conftest.py for why
    cache = os.environ.get("CHD_JAX_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from test_train_learns import synthetic_learnable_dataset

    from chd_tpu.characters.defs import OP_JOINT_SUBSETS
    from chd_tpu.contact import data as data_lib
    from chd_tpu.contact import train as train_lib
    from chd_tpu.contact.infer import ContactDetector
    from chd_tpu.models import contact_mlp
    from chd_tpu.parallel import mesh as mesh_lib

    rng = np.random.default_rng(0)
    results = {}

    # --- on-disk layout smoke: build + load through the real walker -------
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        build_disk_dataset(root, rng)
        t0 = time.perf_counter()
        ds_disk = data_lib.ContactDataset.load(root)
        t_load = time.perf_counter() - t0
        n_disk = ds_disk.op_data.shape[0]
        assert n_disk == DISK_CHARS * DISK_MOTIONS * DISK_VIEWS, n_disk
    print(f"# disk layout: loaded {n_disk} sequences through "
          f"ContactDataset.load in {t_load:.1f}s", flush=True)

    # --- in-memory 512-sequence set for the sweep --------------------------
    ds = synthetic_learnable_dataset(n_seq=N_SEQ, F=FRAMES, seed=0)
    op = jnp.asarray(ds.op_data)
    ct = jnp.asarray(ds.contacts)

    cfg = train_lib.TrainConfig(batch_size=64)
    subset = OP_JOINT_SUBSETS[cfg.joint_set]
    mcfg = contact_mlp.ModelConfig(cfg.window_size, len(subset), cfg.pred_size, 3)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), mcfg)
    tx = train_lib.make_optimizer(cfg)

    n_batches = N_SEQ // cfg.batch_size
    batch_idx = jnp.asarray(
        rng.permutation(N_SEQ)[: n_batches * cfg.batch_size].reshape(
            n_batches, cfg.batch_size
        )
    )

    def put(tree, mesh, spec):
        return jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, spec)), tree
        )

    for n in MESHES:
        mesh = mesh_lib.make_mesh(n_devices=n, model=1)
        op_s = put(op, mesh, P("data"))
        ct_s = put(ct, mesh, P("data"))
        p_s = put(params, mesh, P())
        s_s = put(state, mesh, P())
        o_s = tx.init(p_s)

        # train epoch (all batches, one scan)
        out = train_lib.train_epoch(p_s, s_s, o_s, op_s, ct_s, batch_idx,
                                    jax.random.PRNGKey(1), cfg=cfg, tx=tx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = train_lib.train_epoch(p_s, s_s, o_s, op_s, ct_s, batch_idx,
                                    jax.random.PRNGKey(2), cfg=cfg, tx=tx)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[f"train_seq_per_s@{n}"] = n_batches * cfg.batch_size / dt

        # batched contact inference over all sequences
        det = ContactDetector(params, state, use_pallas=False)
        x = put(jnp.asarray(ds.op_data), mesh, P("data"))
        c, probs, = det._batched(x, det.folded)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c, probs = det._batched(x, det.folded)
        jax.block_until_ready(c)
        dt = time.perf_counter() - t0
        results[f"contact_seq_per_s@{n}"] = N_SEQ / dt
        print(f"# mesh {n}: train {results[f'train_seq_per_s@{n}']:.1f} seq/s, "
              f"contact {results[f'contact_seq_per_s@{n}']:.1f} seq/s", flush=True)

    # --- heavy solver stages (reduced budget, fewer mesh points) ----------
    from chd_tpu.core import bvh
    from chd_tpu.kinematics import batch as kbatch
    from chd_tpu.kinematics.lm import LMConfig
    from chd_tpu.parallel import batch as pbatch
    from chd_tpu.physics import collocation
    from chd_tpu.physics.types import PhysWeights

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_kinematics_batch import make_problem
    from test_physics_solve import standing_hop_input

    skel, _, _ = bvh.load("/root/reference/src/skeleton_fitting/combined_body_25.bvh")
    B_kin, B_phys = 16, 16
    problems = [make_problem(rng, skel, 24) for _ in range(B_kin)]
    phys_in = [standing_hop_input(F=40) for _ in range(B_phys)]
    phys_b, _ = pbatch.pad_phys_inputs(phys_in)
    pcfg = collocation.SolveConfig(
        al_iters_fit=1, al_iters_dyn=1, al_iters_height=1,
        lm=LMConfig(max_iters=6, cg_iters=20, init_lambda=1e-2),
    )

    for n in HEAVY_MESHES:
        mesh = mesh_lib.make_mesh(n_devices=n, model=1)

        t0 = time.perf_counter()
        kbatch.optimize_trajectory_batch(
            problems, skel, ik_iterations=5,
            lm_cfg=LMConfig(max_iters=3, cg_iters=10), mesh=mesh,
        )
        results[f"kinematic_seq_per_s@{n}"] = B_kin / (time.perf_counter() - t0)

        rf, rd = pbatch.solve_physics_batch(phys_b, PhysWeights(), pcfg, mesh=mesh)
        jax.block_until_ready(rd.base_lin)
        t0 = time.perf_counter()
        rf, rd = pbatch.solve_physics_batch(phys_b, PhysWeights(), pcfg, mesh=mesh)
        jax.block_until_ready(rd.base_lin)
        results[f"physics_seq_per_s@{n}"] = B_phys / (time.perf_counter() - t0)
        print(f"# mesh {n}: kinematic {results[f'kinematic_seq_per_s@{n}']:.2f} "
              f"seq/s (incl host prep+compile reuse), physics "
              f"{results[f'physics_seq_per_s@{n}']:.2f} seq/s", flush=True)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
