"""Multi-host utilities.

TPU-native replacements for the reference's torch.distributed layer
(SURVEY §2.5): ``init_dist`` -> jax.distributed.initialize;
rank-0-pickle result gather (models/apis/test.py:116-160) ->
``process_allgather`` of fixed-shape prediction arrays; distributed
samplers -> per-process dataset sharding.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def init_dist(coordinator: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-ops on a single host.

    On TPU pods the arguments auto-detect from the environment; explicit
    values support CPU/GPU clusters (JAX_COORDINATOR etc.).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None and jax.process_count() == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


def process_allgather(tree: Any) -> Any:
    """Gather fixed-shape arrays from every host (eval result collection)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def shard_indices(n: int, shuffle: bool = True, seed: int = 0,
                  drop_last: bool = True) -> np.ndarray:
    """This process's sample indices (DistributedSampler semantics:
    contiguous round-robin over shuffled order, equal length per process)."""
    order = (np.random.RandomState(seed).permutation(n)
             if shuffle else np.arange(n))
    world = jax.process_count()
    rank = jax.process_index()
    per = n // world if drop_last else -(-n // world)
    if not drop_last:
        pad = per * world - n
        order = np.concatenate([order, order[:pad]])
    return order[rank * per:(rank + 1) * per]
