import os
import sys

# Tests run on a virtual multi-device CPU mesh (the driver/benchmarks use the
# real TPU); must be set before jax import.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# The axon sitecustomize registers the TPU plugin and overrides
# jax_platforms; force CPU explicitly so tests run on the virtual mesh.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against the float64 numpy reference implementation.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: DISABLED by default. On this machine pool
# (firecracker VMs scheduled across heterogeneous physical CPUs) cache
# entries serialized on one host generation intermittently SIGSEGV when
# read — and even written — on another (observed in both
# compilation_cache.get_executable_and_time and put_executable_and_time,
# with cpu_aot_loader machine-feature-mismatch warnings). Correctness over
# warm starts: set CHD_JAX_CACHE=/some/dir to opt back in on a stable host.
_cache_dir = os.environ.get("CHD_JAX_CACHE")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:  # not present on older jax releases
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except AttributeError:
        pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# The upstream reference (read-only mount) — used ONLY as a numerical oracle
# in parity tests, never imported by the framework itself.
REFERENCE_ROOT = "/root/reference"
REFERENCE_IK = os.path.join(REFERENCE_ROOT, "src", "skeleton_fitting", "ik")

import pytest


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_IK)


# Modules whose compiles dominate the suite's resident JIT state. XLA:CPU
# reproducibly SIGSEGVs inside backend_compile (LLVM ORC, NOT the persistent
# cache — observed with it disabled) once enough large executables have
# accumulated in one process: four rc=139 crashes, all while compiling the
# SAME kinematic LM graph ~25-30 slow tests in, each green when run fresh.
# Dropping the big executables after each heavy module bounds that state.
_HEAVY_MODULES = {
    "test_longseq", "test_parallel", "test_physics_scoreboard",
    "test_physics_solve", "test_pipeline", "test_goldens",
    "test_trajectory_e2e", "test_kinematics_batch", "test_banded",
    "test_durations", "test_train_learns",
}


@pytest.fixture(autouse=True, scope="module")
def _bound_resident_jit_state(request):
    yield
    mod = getattr(request.module, "__name__", "")
    if mod.rpartition(".")[2] in _HEAVY_MODULES:
        jax.clear_caches()


@pytest.fixture(scope="session")
def ref_ik():
    """Import the reference ik library (pure numpy) as an oracle."""
    if not has_reference():
        pytest.skip("reference implementation not available")
    if REFERENCE_IK not in sys.path:
        sys.path.insert(0, REFERENCE_IK)

    # numpy>=2 removed numpy.core.umath_tests; shim it for the oracle only.
    import types
    import numpy as _np

    if "numpy.core.umath_tests" not in sys.modules:
        shim = types.ModuleType("numpy.core.umath_tests")
        shim.matrix_multiply = _np.matmul
        sys.modules["numpy.core.umath_tests"] = shim

    import Quaternions as RefQuaternions  # noqa
    import Animation as RefAnimation  # noqa
    import AnimationStructure as RefStructure  # noqa
    import BVH as RefBVH  # noqa

    class NS:
        Quaternions = RefQuaternions.Quaternions
        Animation = RefAnimation
        Structure = RefStructure
        BVH = RefBVH

    return NS
