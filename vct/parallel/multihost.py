"""Multi-host (multi-process) helpers.

Single-slice TPU pods and multi-slice deployments run one Python process per
host; ``jax.distributed.initialize`` wires them into one logical device set.
These helpers make the rest of vct process-count-agnostic: the mesh builder
already takes whatever ``jax.devices()`` reports; data loading shards by
process so each host reads only its slice of the dataset.

The reference has no multi-host story at all (SURVEY.md §2); this module is
the TPU-native scale-out path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["initialize", "process_shard", "is_primary"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults.

    On Cloud TPU VMs all arguments auto-detect from the metadata server; on
    CPU test rigs pass them explicitly."""
    import jax

    if jax.config.jax_platforms == "cpu":
        # Cross-process collectives on the CPU backend need an explicit
        # implementation; Gloo over TCP is the one jaxlib ships.
        if jax.config.jax_cpu_collectives_implementation in (None, "none"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if initialization_timeout is not None:
        # Connect-to-coordinator grace (jax default 300 s). On oversubscribed
        # test rigs two ranks' interpreter start/import times can diverge by
        # minutes; raise it so the early rank outwaits the late one.
        kwargs["initialization_timeout"] = initialization_timeout
    jax.distributed.initialize(**kwargs)


def process_shard(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> np.ndarray:
    """Indices of the dataset slice owned by this host: contiguous split with
    the remainder spread over the first hosts."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base = n // pc
    rem = n % pc
    start = pi * base + min(pi, rem)
    count = base + (1 if pi < rem else 0)
    return np.arange(start, start + count)


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    import jax

    return jax.process_index() == 0
