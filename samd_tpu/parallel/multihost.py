"""Multi-host helpers: process initialization and request sharding.

The reference fans evaluation out with ray over local GPUs
(/root/reference/evaluation/eval_vicuna.py:39-68).  On TPU pods, hosts run
the same program under ``jax.distributed``; model shards span hosts through
the global mesh (DCN between hosts, ICI within), while *requests* are sharded
across data-parallel host groups — each host group's engine serves its own
slice of the workload and only token ids cross process boundaries.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(dp: int = 1, *, axis_names=("dp", "tp")) -> "jax.sharding.Mesh":
    """Mesh over ALL devices of all processes; 'tp' should stay within a
    host's ICI domain (use dp = number of hosts for host-data-parallel)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()  # global device list under jax.distributed
    n = len(devices)
    if n % dp:
        raise ValueError(f"{n} devices not divisible by dp={dp}")
    return Mesh(np.asarray(devices).reshape(dp, n // dp), axis_names)


def shard_requests(items: Sequence[T], *, process_id: Optional[int] = None,
                   num_processes: Optional[int] = None) -> List[T]:
    """Static round-robin split of a request list across processes (the
    multi-host analogue of the reference's ray chunking)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [x for i, x in enumerate(items) if i % n == pid]
