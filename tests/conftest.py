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

# Persistent compilation cache: the solver graphs (LM/AL stages under vmap)
# take minutes to compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_chd")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:  # not present on older jax releases
    # "none": do NOT persist XLA's internal AOT kernel caches. Those entries
    # embed the compile machine's CPU feature set; when several processes
    # with different XLA clients (axon TPU plugin registered vs plain CPU)
    # share this directory, loading a foreign-feature kernel SIGSEGVs inside
    # cpu_aot_loader (observed as intermittent rc=139 test crashes). The jit
    # executable cache — the actual compile-time win — is unaffected.
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
