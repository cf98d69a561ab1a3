"""Host-keyed persistent XLA compilation-cache paths.

The JAX file-system compilation cache stores XLA:CPU AOT executables
keyed by (HLO, compile options) only — NOT by the host's CPU features.
When the VM hosting this repo migrates to different silicon, a warm
cache from the previous host gets LOADED, not recompiled ("Loading
XLA:CPU AOT result. Target machine feature ... is not supported on the
host machine ... could lead to execution errors such as SIGILL"), and
was observed to segfault test runs mid-suite. Keying the cache
directory by a fingerprint of the CPU feature flags makes a host swap
look like a cold cache instead of a poisoned one.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = platform.machine()
    except OSError:
        feats = platform.machine()
    return hashlib.md5(feats.encode()).hexdigest()[:10]


def host_cache_dir(base: str) -> str:
    """`base` suffixed with the host fingerprint, e.g.
    /tmp/splslam_jax_cache-1a2b3c4d5e."""
    return f"{base}-{host_fingerprint()}"
