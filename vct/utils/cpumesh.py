"""Environment recipe for virtual CPU-mesh child processes.

The machine's sitecustomize pins ``JAX_PLATFORMS=axon`` (one tunneled TPU
chip) and imports jax at interpreter startup, so an n-device mesh can only be
provisioned in a scrubbed child process. Both provisioning entry points
(``conftest.py`` for the test suite, ``__graft_entry__.py`` for the driver's
multichip/multihost dryruns) share this recipe so the env is identical.

Two classes of fragility this hardens against, both observed on this 1-core
host:

* **Rendezvous aborts under load.** XLA:CPU collectives require every
  participant's execution thread to join a rendezvous within a 20 s warn /
  40 s terminate grace; with 8 virtual devices on one core under co-located
  load they miss it and the process SIGABRTs (rc=-6). We extend the grace
  via ``--xla_cpu_collective_call_*_timeout_seconds`` and clamp BLAS/OpenMP
  worker pools to one thread so library threading never competes with the
  participant threads for the single core.
* **Stale AOT caches.** XLA:CPU persists executables compiled for the build
  machine's CPU features; ``machine_cache_dir`` salts the cache path with
  the host fingerprint so another machine's cache is invisible, not fatal.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping

from vct.utils.hostcache import machine_cache_dir

__all__ = ["virtual_cpu_env", "RENDEZVOUS_FLAGS", "THREAD_CLAMPS"]

# Extended collective-call rendezvous grace (defaults: warn 20 s, abort 40 s —
# too tight for 8 virtual devices time-slicing one core under load).
RENDEZVOUS_FLAGS = (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=60",
    "--xla_cpu_collective_call_terminate_timeout_seconds=300",
)

# One thread per math library: on a 1-core host any library pool just steals
# cycles from the XLA execution threads the collectives rendezvous on.
THREAD_CLAMPS = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def virtual_cpu_env(
    base_env: Mapping[str, str], n_devices: int, repo_root: str
) -> Dict[str, str]:
    """A copy of ``base_env`` scrubbed onto an ``n_devices`` virtual CPU mesh."""
    env = dict(base_env)
    env["JAX_PLATFORMS"] = "cpu"
    # Drop the axon sitecustomize from the import path; keep the repo.
    env["PYTHONPATH"] = repo_root
    xla = env.get("XLA_FLAGS", "")
    xla = re.sub(r"--xla_force_host_platform_device_count=\d+", "", xla)
    parts = [xla.strip(), f"--xla_force_host_platform_device_count={n_devices}"]
    for flag in RENDEZVOUS_FLAGS:
        if flag.split("=")[0] not in xla:
            parts.append(flag)
    env["XLA_FLAGS"] = " ".join(p for p in parts if p)
    for key, val in THREAD_CLAMPS.items():
        env.setdefault(key, val)
    # Persistent XLA compile cache: most wall time is CPU compiles of the
    # same tiny models; repeat runs hit the cache.
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", machine_cache_dir("/tmp/vct_jax_test_cache")
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    return env


def apply_rendezvous_grace_inplace(env: os._Environ | Dict[str, str]) -> None:
    """Append the rendezvous-grace flags + thread clamps to ``env`` in place.

    Used by the conftest re-exec, which already sets its own platform /
    device-count flags but wants the same robustness under load.
    """
    xla = env.get("XLA_FLAGS", "")
    extra = [f for f in RENDEZVOUS_FLAGS if f.split("=")[0] not in xla]
    if extra:
        env["XLA_FLAGS"] = " ".join([xla.strip()] + extra).strip()
    for key, val in THREAD_CLAMPS.items():
        env.setdefault(key, val)
