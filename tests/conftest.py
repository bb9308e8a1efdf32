"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on host CPU devices instead (the driver separately dry-run
compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Must be set before the first backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU backend and
# overrides platform selection after import; undo that for unit tests.
jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache SIGSEGVs (de)serializing CPU executables
# under this container's machine-feature mismatch. Tests recompile fresh.
os.environ["LDSO_TPU_NO_COMPILE_CACHE"] = "1"
jax.config.update("jax_compilation_cache_dir", None)
# Tests validate numerics in float64 reference runs on CPU; production
# device code is explicitly float32 (see ldso_tpu/__init__.py).
jax.config.update("jax_enable_x64", True)

import ldso_tpu  # noqa: F401,E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Drop compiled executables when a test module finishes.

    Running the whole suite in one process accumulates hundreds of XLA CPU
    executables; past ~100 tests the NEXT large compile segfaults inside
    backend_compile_and_load (deterministically at the same test, with any
    half-prefix passing — an LLVM JIT code-memory/relocation exhaustion,
    not a test bug; RSS stays ~6 GB). Clearing jit caches per module keeps
    the JIT address space compact at the cost of cross-module
    recompilation."""
    yield
    jax.clear_caches()
