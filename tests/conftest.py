import os
import sys

# Simulate an 8-device mesh on CPU for all tests (sharding/jit topology is
# device-count generic; the real TPU path is exercised by bench.py).
#
# NOTE: importing pytest in this environment already imports jax, and jax
# snapshots JAX_PLATFORMS at import time — so use jax.config (valid until the
# backend is first used) rather than os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: XLA_FLAGS fallback above applies
    pass

# Most suite wall-clock is XLA CPU compilation of the N=512 model programs,
# not execution.  Persist compiled executables next to the repo (committed,
# like bench.py's .jax_cache) so reruns — including a fresh clone on the same
# machine — skip straight to execution.  Cache keys include jaxlib version,
# backend and HLO hashes: a stale entry silently recompiles, never misbehaves.
_TEST_CACHE = os.environ.get(
    "PST_TEST_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
if _TEST_CACHE:
    os.makedirs(_TEST_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _TEST_CACHE)
    # Cache EVERYTHING: the suite's cold cost is dominated by hundreds of
    # sub-second compiles (per-shape init programs), not a few big ones.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for path in (REPO_ROOT, os.path.join(REPO_ROOT, "tests", "refsupport")):
    if path not in sys.path:
        sys.path.insert(0, path)

import pytest  # noqa: E402

REFERENCE_AVAILABLE = os.path.isdir("/root/reference")

requires_reference = pytest.mark.skipif(
    not REFERENCE_AVAILABLE, reason="reference repo not mounted at /root/reference"
)


@pytest.fixture(scope="session", autouse=True)
def build_native_lib():
    """Build libpst_native.so before the session (~2 s) so native tests
    never skip silently — a missing .so must surface as a build error, not
    as 5 quiet skips (round-1 finding)."""
    import subprocess

    lib = os.path.join(
        REPO_ROOT, "protein_structure_tokenizer_tpu", "native", "libpst_native.so"
    )
    if not os.path.exists(lib):
        subprocess.run(["make", "native"], cwd=REPO_ROOT, check=True, timeout=120)
