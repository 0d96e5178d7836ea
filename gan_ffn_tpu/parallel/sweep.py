"""Multi-seed sweep: independent training runs mapped across the mesh.

BASELINE.json config 5 ("data-parallel multi-seed GAN-FFN sweep across a
v5e-8 mesh"): N independent seeds' parameters are stacked on a leading axis,
sharded one-seed-per-device, and every train step is ``vmap``-ed over that
axis — 8 seeds train at literally the cost of one wall-clock run. This is the
TPU-native replacement for the reference's sequential ``run.sh`` sweep loop
(run.sh:20-21 launches the whole script once per hyperparameter).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEED_AXIS = "seed"


def make_seed_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SEED_AXIS,))


def init_seed_sweep(init_fn: Callable[[jax.Array], Dict], seeds: Sequence[int], mesh: Mesh):
    """Stack per-seed states on a leading axis, sharded one-per-device.

    ``init_fn(rng) -> state pytree``; returns the stacked state with each
    leaf shaped (n_seeds, ...) and sharded over the seed axis.
    """
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    stacked = jax.vmap(init_fn)(keys)
    shard = NamedSharding(mesh, P(SEED_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, shard), stacked)


def make_sweep_train_step(train_step: Callable, mesh: Mesh):
    """vmap a (state, rng, batch) -> (state, loss, preds) step over the seed
    axis; the batch is replicated (each seed sees the same data, as the
    reference sweep does), states stay sharded per-seed."""

    vstep = jax.vmap(train_step, in_axes=(0, 0, None))

    def step(stacked_state, rngs, batch):
        batch = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), batch
        )
        return vstep(stacked_state, rngs, batch)

    return jax.jit(step, donate_argnums=(0,))
