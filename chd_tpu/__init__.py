"""chd_tpu — a TPU-native rebuild of the contact-human-dynamics pipeline.

This package re-implements the full capability surface of
davrempe/contact-human-dynamics ("Contact and Human Dynamics from Monocular
Video", ECCV 2020) as a single in-process, JAX/XLA-first framework:

- ``core``       : quaternion / SE(3) math, forward kinematics, BVH I/O
                   (replaces the vendored Holden ``ik/`` animation library,
                   reference: src/skeleton_fitting/ik/*.py)
- ``ingest``     : OpenPose / MonocularTotalCapture result parsing and the
                   combined-skeleton data model
                   (reference: src/utils/openpose_utils.py, totalcap_utils.py)
- ``contact``    : foot-contact detection — featurization, datasets, training
                   and full-video sliding-window inference with vote merging
                   (reference: src/contact_learning/)
- ``models``     : the contact MLP as a pure-JAX module with torch-weight
                   conversion (reference: src/contact_learning/models/)
- ``kinematics`` : batched damped-least-squares IK and the Levenberg-Marquardt
                   kinematic trajectory optimizer + robust floor fitting
                   (reference: src/optimize/)
- ``retarget``   : combined-skeleton → Mixamo retargeting
                   (reference: src/skeleton_fitting/combined_to_mixamo.py)
- ``physics``    : batched direct-collocation physics optimization on a
                   single-rigid-body model with time-varying inertia
                   (replaces towr_phys_optim/ + TOWR + IPOPT)
- ``characters`` : character metadata registry
                   (reference: src/utils/character_info_utils.py)
- ``parallel``   : jax.sharding mesh utilities, pjit'd batched execution
- ``pipeline``   : the end-to-end driver (replaces scripts/run_phys_mocap.py)
- ``ops``        : fused Pallas kernels and window/vote compute primitives
- ``utils``      : config tree, metrics, IO, profiling helpers
"""

__version__ = "0.1.0"
