"""Multi-seed sweep: independent training runs mapped across the mesh.

BASELINE.json config 5 ("data-parallel multi-seed GAN-FFN sweep across a
v5e-8 mesh"): N independent seeds' parameters are stacked on a leading axis,
sharded one-seed-per-device, and every train step is ``vmap``-ed over that
axis — 8 seeds train at literally the cost of one wall-clock run. This is the
TPU-native replacement for the reference's sequential ``run.sh`` sweep loop
(run.sh:20-21 launches the whole script once per hyperparameter).

Two mesh layouts:
- 1-D ``make_seed_mesh``: one seed per device (pure sweep).
- 2-D ``make_grid_mesh(n_seed, n_data)``: seeds across one axis, each seed's
  BATCH sharded across the other — e.g. 2 seeds × 4-way DP on a v5e-8. The
  same vmapped step serves both: batch arrays shard by role over the "data"
  axis when the mesh has one, replicate otherwise.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, batch_sharding

SEED_AXIS = "seed"


def make_seed_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SEED_AXIS,))


def make_grid_mesh(n_seed: int, n_data: int = None, devices=None) -> Mesh:
    """2-D (seed, data) mesh: ``n_seed * n_data`` devices, seeds on the first
    axis, data parallelism on the second."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_seed
    grid = np.asarray(devices[: n_seed * n_data]).reshape(n_seed, n_data)
    return Mesh(grid, (SEED_AXIS, DATA_AXIS))


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
    axis; each seed sees the same data (as the reference sweep does), states
    stay sharded per-seed. On a 2-D (seed, data) mesh the batch additionally
    shards its batch axis over the data axis, so every seed trains
    data-parallel across its row of chips."""

    vstep = jax.vmap(train_step, in_axes=(0, 0, None))
    has_data_axis = DATA_AXIS in mesh.axis_names

    def step(stacked_state, rngs, batch):
        if has_data_axis and isinstance(batch, dict):
            batch = {
                name: jax.device_put(arr, batch_sharding(mesh, name))
                for name, arr in batch.items()
            }
        else:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), batch
            )
        return vstep(stacked_state, rngs, batch)

    return jax.jit(step, donate_argnums=(0,))
