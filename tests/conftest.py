"""Test config: run everything on CPU with 8 virtual devices so pjit/Mesh
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin in this image ignores JAX_PLATFORMS; PLATFORM_NAME wins
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon plugin imports jax at interpreter startup (sitecustomize), so env
# vars alone are too late; force the platform post-import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: CPU compiles here are slow (remote-compile
# environment); cache across test runs.  Keyed by the host's CPU feature
# set: XLA:CPU AOT artifacts are machine-specific, and a cache written on
# a different host silently loads with mismatched features ("could lead
# to execution errors such as SIGILL" — observed as wrong decode-gate
# numerics, not a crash).
import hashlib

try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_mach = hashlib.sha1(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_mach}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
