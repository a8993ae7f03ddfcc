"""Device-mesh data parallelism for batched generation.

The reference generates MS-COCO 10k prompts in a serial Python loop
(`examples/text_to_mscoco.py:54-62`).  The TPU-native replacement shards the
prompt batch over a 1-D ``dp`` mesh with `NamedSharding`; XLA emits any
needed ICI collectives.  TP/PP/SP/EP are intentionally out of scope for this
workload: SD/SDXL UNets fit on one chip and sequence lengths are fixed
(SURVEY.md §2.5) — data parallelism over prompts is the real axis of scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp; everything else replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device-put a pytree of [B, ...] arrays with B sharded over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
