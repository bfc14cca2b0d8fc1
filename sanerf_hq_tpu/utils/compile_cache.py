"""Persistent XLA compile-cache setup, shared by the CLI, bench.py and
the test suite.  Repeated invocations (the normal multi-stage workflow,
reference scripts/train_*.sh, and the driver's bench run) re-trace the
same programs; host-side compiles dominate startup, and over the TPU
tunnel a cold compile of the fused render programs runs minutes.

Keyed by the host CPU feature set because XLA:CPU AOT artifacts are
machine-specific (a cache written on a different host silently loads with
mismatched features).  TPU artifacts carry their own platform key, so one
directory serves both backends.

A user-provided JAX_COMPILATION_CACHE_DIR always wins (never silently
overridden), and the default location is per-user with 0700 permissions:
a predictable world-writable /tmp path could be pre-created by another
local user to squat or poison the cache of compiled executables XLA loads
into this process.  Opt out with SANERF_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import hashlib
import os
import stat


def enable_compile_cache() -> None:
    if os.environ.get("SANERF_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured a cache location
    import jax

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    mach = hashlib.sha1(flags.encode()).hexdigest()[:10]
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    cache_dir = os.path.join(base, f"sanerf_jax_cache_{mach}_{os.getuid()}")
    try:
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        st = os.stat(cache_dir)
        if st.st_uid != os.getuid():
            return  # someone else owns the path: do not use it
        os.chmod(cache_dir, stat.S_IRWXU)
    except OSError:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
