"""Host-fingerprinted XLA compile-cache directories.

XLA:CPU persists AOT executables compiled for the *build* machine's CPU
features; loading them on a host with different features warns about (and
can die of) SIGILL. Salting the cache dir with the host's cpuinfo flags
makes a stale cache from another machine invisible instead of fatal.

Shared by the two CPU-provisioning entry points (``conftest.py`` and
``__graft_entry__.py``) so they always resolve the same directory.
"""

from __future__ import annotations

import hashlib
import platform

__all__ = ["machine_cache_dir"]


def machine_cache_dir(base: str) -> str:
    """``base`` salted with a fingerprint of this host's CPU features."""
    probe = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    probe += line
                    break
    except OSError:
        pass
    return f"{base}_{hashlib.md5(probe.encode()).hexdigest()[:10]}"
