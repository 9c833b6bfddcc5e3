"""Test configuration: run JAX on a virtual 8-device CPU mesh by default.

The driver benches on real TPU; tests stay hermetic and exercise the
multi-chip sharding path via xla_force_host_platform_device_count.
Set RUN_ON_TPU=1 to run the suite against the real chip instead.
"""
import os
import sys

if not os.environ.get("RUN_ON_TPU"):
    # the image pre-sets JAX_PLATFORMS=axon, so override (not setdefault);
    # JAX_PLATFORM_NAME is also honored when a plugin re-reads JAX_PLATFORMS
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # sitecustomize.py may have imported jax already (registering the TPU
    # backend at interpreter start), in which case jax_platforms latched
    # "axon" from the env before we overrode it — force it back to cpu.
    if "jax" in sys.modules:
        import jax
        jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_GOLDEN = None


@pytest.fixture(scope="session")
def golden():
    global _GOLDEN
    if _GOLDEN is None:
        path = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")
        _GOLDEN = np.load(path, allow_pickle=False)
    return _GOLDEN


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches_between_modules():
    """Free compiled executables at test-module boundaries.

    The full single-process suite started segfaulting inside the XLA CPU
    compiler (backend_compile_and_load, while compiling an unrelated
    front-end program in test_mu_fused) once the decision-directed
    chanest cond landed — every module passes in isolation and in pairs,
    so the crash needs a long in-process compilation history; clearing
    the jit caches bounds that history.  See CLAUDE.md known issues.
    """
    yield
    import jax
    jax.clear_caches()
