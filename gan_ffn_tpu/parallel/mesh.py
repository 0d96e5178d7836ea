"""Device-mesh utilities: data parallelism over ICI.

The reference's only parallelism is single-process ``nn.DataParallel`` over
visible GPUs (train_IEMOCAP.py:588-593) — and README.md:83 records that it
DEGRADES accuracy. The TPU-native replacement is a 1-D
``jax.sharding.Mesh`` with the batch axis sharded across devices: params are
replicated, batches are split, and XLA inserts the gradient ``psum`` over ICI
automatically from the sharding annotations. Unlike DataParallel this is
numerically IDENTICAL to single-device training (same loss, same updates —
verified in tests/test_parallel.py), because the masked losses are computed
globally, not per-replica.

Batch-axis layout: time-major features (L, B, D) shard axis 1; batch-first
umask/label (B, L) shard axis 0; scalars replicate.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, array_name: str, axis: str = DATA_AXIS) -> NamedSharding:
    """NamedSharding for one batch array by its role."""
    time_major = {"text", "visual", "audio", "qmask"}
    batch_first = {"umask", "label"}
    if array_name in time_major:
        spec = P(None, axis)
    elif array_name in batch_first:
        spec = P(axis)
    else:  # scalars: valid_len, n_real
        spec = P()
    return NamedSharding(mesh, spec)


def shard_batch(arrays: Dict, mesh: Mesh, axis: str = DATA_AXIS) -> Dict:
    """Place a batch dict with batch-axis sharding over the mesh.

    The batch size must be divisible by the mesh size (the bucketed loader
    always pads to the full batch size, so this holds whenever
    batch_size % n_devices == 0).
    """
    return {
        name: jax.device_put(arr, batch_sharding(mesh, name, axis))
        for name, arr in arrays.items()
    }


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
