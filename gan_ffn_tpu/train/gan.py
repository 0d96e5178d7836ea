"""The adversarial engine: the 12-step cross-modal duel schedule as ONE
compiled XLA program.

The reference runs, per batch, 12 sequential eager train calls — 6
discriminator duels and 6 generator duels in a fixed round-robin
(train_IEMOCAP.py:355-382), each with its own ``zero_grad/forward/backward/
step`` and a forced device sync (``.cpu().detach().numpy()``,
train_IEMOCAP.py:224,249). Here the entire schedule — 12 loss evaluations, 12
grads, 12 optimizer updates — is traced into a single jitted function with the
updated params *threaded sequentially* through the sub-steps, which is
required for training-dynamics parity: each generator update must see the
just-updated discriminator and vice versa (SURVEY.md §7 "hard parts").

Mode semantics preserved from the reference:
- ``train_disc`` (train_IEMOCAP.py:200-227): disc in train mode (dropout on),
  generator in eval mode (dropout off), fake fusion detached;
- ``train_gen`` (train_IEMOCAP.py:230-252): generator train mode, disc eval;
- BCE targets cover every (t, b) position of the reference's dynamically
  padded batch — reproduced via a mask (t < batch max len, b < n_real);
- per-modality Adam hyperparams: generators at ``lr`` (text at ``lr*1.1``),
  discriminators at ``lr/2``, betas (b1, b2) (train_IEMOCAP.py:292-297);
- the loss dict's duplicate-key overwrites (each D appears in two duels, only
  the 2nd write is logged) are replicated by ``LOGGED_LOSS_KEYS``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..models import (
    AcousticDiscriminator,
    AcousticGenerator,
    TextDiscriminator,
    TextGenerator,
    VisualDiscriminator,
    VisualGenerator,
)
from ..nn.losses import bce_loss
from .optim import torch_adam

GEN_NAMES = ("acoustic_gen", "visual_gen", "text_gen")
DISC_NAMES = ("acoustic_disc", "visual_disc", "text_disc")

# The 12-duel schedule (train_IEMOCAP.py:355-382):
# (kind, net, real-input modality for the net, opponent, opponent's modality)
DUEL_SCHEDULE = (
    ("disc", "visual_disc", "visual", "acoustic_gen", "acoustic", "visual_D_loss"),
    ("gen", "acoustic_gen", "acoustic", "visual_disc", None, "acoustic_G_loss"),
    ("disc", "visual_disc", "visual", "text_gen", "text", "visual_D_loss"),
    ("gen", "text_gen", "text", "visual_disc", None, "text_G_loss"),
    ("disc", "text_disc", "text", "acoustic_gen", "acoustic", "text_D_loss"),
    ("gen", "acoustic_gen", "acoustic", "text_disc", None, "acoustic_G_loss"),
    ("disc", "acoustic_disc", "acoustic", "text_gen", "text", "acoustic_D_loss"),
    ("gen", "text_gen", "text", "acoustic_disc", None, "text_G_loss"),
    ("disc", "text_disc", "text", "visual_gen", "visual", "text_D_loss"),
    ("gen", "visual_gen", "visual", "text_disc", None, "visual_G_loss"),
    ("disc", "acoustic_disc", "acoustic", "visual_gen", "visual", "acoustic_D_loss"),
    ("gen", "visual_gen", "visual", "acoustic_disc", None, "visual_G_loss"),
)

# Reference loss-dict columns in CSV order (train_IEMOCAP.py:308-317); each key
# keeps only its LAST write in the schedule above.
LOGGED_LOSS_KEYS = (
    "acoustic_G_loss",
    "visual_G_loss",
    "text_G_loss",
    "visual_D_loss",
    "text_D_loss",
    "acoustic_D_loss",
)


@dataclasses.dataclass(frozen=True)
class GANConfig:
    D_h: int = 100
    dropout: float = 0.2
    num_layers: int = 8
    lr: float = 1e-4
    b1: float = 0.5
    b2: float = 0.6
    dtype: Any = None
    seed: int = 3407
    fused_schedule: bool = True
    # Attention path for the fused program. Default False — measured: the
    # XLA path compiles the 8-layer program in ~7 min and runs 36.5 ms/step;
    # Pallas attention's step-time win (~+12% on the classifier) cannot
    # amortize its Mosaic compile cost over a 22-second 150-epoch stage A
    # (PERF.md "Adversarial stage A"). Geometry-shared kernel runners
    # (ops/attention.py _fwd_call/_bwd_call) are in place for when it pays.
    pallas_attention: bool = False
    # Cache the compiled fused-schedule executable on disk: the hosted TPU
    # stack bypasses jax's persistent compile cache, and this program costs
    # ~10-15 min to build per process otherwise (utils/aot.py).
    aot_cache: bool = True
    # Run each encoder's depth as ONE nn.scan over stacked layer params
    # instead of num_layers unrolled blocks: same deterministic math,
    # ~num_layers× smaller HLO, so the hosted remote compile of the fused
    # 12-duel program costs minutes instead of tens of minutes (measured:
    # scripts/ab_scan_layers.py, PERF.md "scan-over-layers"). Changes the
    # GAN state's param-tree layout (nn/transformer.py converters bridge
    # checkpoints) and the per-layer dropout key derivation, so it is
    # opt-in; init_gan_state and both step builders pin it together.
    scan_layers: bool = False

    # Fields present in round-3 AOT-cache salts: __str__ must render THESE
    # exactly as the round-3 dataclass repr did, and newer fields only when
    # non-default, so adding a config knob does not silently re-key (and
    # recompile) every cached executable of a default-config run.
    _SALT_FIELDS = (
        "D_h", "dropout", "num_layers", "lr", "b1", "b2", "dtype", "seed",
        "fused_schedule", "pallas_attention", "aot_cache",
    )

    def __str__(self):
        parts = [f"{k}={getattr(self, k)!r}" for k in self._SALT_FIELDS]
        for f in dataclasses.fields(self):
            if f.name in self._SALT_FIELDS:
                continue
            v = getattr(self, f.name)
            if v != f.default:
                parts.append(f"{f.name}={v!r}")
        return f"GANConfig({', '.join(parts)})"


def create_gan_modules(cfg: GANConfig) -> Dict[str, Any]:
    kw = dict(D_h=cfg.D_h, dropout=cfg.dropout, num_layers=cfg.num_layers, dtype=cfg.dtype)
    return {
        "acoustic_gen": AcousticGenerator(**kw),
        "visual_gen": VisualGenerator(**kw),
        "text_gen": TextGenerator(**kw),
        "acoustic_disc": AcousticDiscriminator(**kw),
        "visual_disc": VisualDiscriminator(**kw),
        "text_disc": TextDiscriminator(**kw),
    }


def create_gan_optimizers(cfg: GANConfig) -> Dict[str, optax.GradientTransformation]:
    """Per-network Adam: gens at lr (text lr*1.1), discs at lr/2
    (train_IEMOCAP.py:292-297)."""
    return {
        "acoustic_gen": torch_adam(cfg.lr, cfg.b1, cfg.b2),
        "visual_gen": torch_adam(cfg.lr, cfg.b1, cfg.b2),
        "text_gen": torch_adam(cfg.lr * 1.1, cfg.b1, cfg.b2),
        "acoustic_disc": torch_adam(cfg.lr / 2, cfg.b1, cfg.b2),
        "visual_disc": torch_adam(cfg.lr / 2, cfg.b1, cfg.b2),
        "text_disc": torch_adam(cfg.lr / 2, cfg.b1, cfg.b2),
    }


# GANState is a plain pytree: {"params": {name: tree}, "opt": {name: tree}}
GANState = Dict[str, Dict[str, Any]]

_MODALITY_DIM = {"acoustic": 100, "visual": 512, "text": 100}


def init_gan_state(cfg: GANConfig, rng: jax.Array, seq_len: int = 16, batch: int = 2) -> GANState:
    """Initialize all six networks + their optimizer states.

    The visual discriminator is initialized on BOTH its input widths (raw
    512-d real path and 100-d fusion path) so the ``object`` projection params
    exist.
    """
    from ..ops.config import use_scan_layers

    modules = create_gan_modules(cfg)
    opts = create_gan_optimizers(cfg)
    keys = jax.random.split(rng, len(modules))
    params: Dict[str, Any] = {}
    # cfg.scan_layers decides the param-tree LAYOUT, so init must trace under
    # the same setting the train step will (see GANConfig.scan_layers)
    with use_scan_layers(cfg.scan_layers):
        for key, (name, module) in zip(keys, modules.items()):
            if name.endswith("_gen"):
                d_in = _MODALITY_DIM[name.split("_")[0]]
            elif name == "visual_disc":
                d_in = 512  # raw path; also creates the `object` projection
            else:
                d_in = cfg.D_h
            x = jnp.zeros((seq_len, batch, d_in), dtype=jnp.float32)
            if cfg.aot_cache:
                from ..utils.aot import cached_init

                params[name] = cached_init(module, key, x, salt=f"gan_init:{name}")
            else:
                params[name] = module.init({"params": key}, x)["params"]
    opt = {name: opts[name].init(params[name]) for name in modules}
    return {"params": params, "opt": opt}


def _duel_mask(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(L, B, 1) mask covering the positions the reference's dynamically
    shaped BCE targets cover: t < batch max length AND real dialogue column."""
    L, B = batch["text"].shape[0], batch["text"].shape[1]
    t = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (L, B), 1)
    mask = (t < batch["valid_len"]) & (b < batch["n_real"])
    return mask.astype(jnp.float32)[:, :, None]


def _make_schedule_fns(cfg: GANConfig, mesh=None):
    """``(run_schedule, duel_update)`` — the un-jitted 12-duel schedule and
    its per-duel core, shared by :func:`make_gan_train_step` (which wraps
    ``run_schedule`` in jit / the AOT cache) and :func:`make_gan_epoch_step`
    (which scans it over a whole epoch's batches in ONE program)."""
    modules = create_gan_modules(cfg)
    opts = create_gan_optimizers(cfg)

    real_inputs = {"acoustic": "audio", "visual": "visual", "text": "text"}

    def duel_update(i: int, net_params, opp_params, opt_state_net, batch, k1, k2):
        """One duel: loss + grad + Adam update for schedule entry ``i``.

        Returns (updated net params, updated opt state, loss).
        """
        if mesh is not None:
            # DP shardings hold for the separately-jitted duels too (the
            # fused path additionally constrains the whole state at entry)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import batch_sharding

            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding(mesh, k))
                for k, v in batch.items()
            }
            net_params, opp_params, opt_state_net = jax.lax.with_sharding_constraint(
                (net_params, opp_params, opt_state_net), NamedSharding(mesh, P())
            )
        kind, net, net_mod, opp, opp_mod, log_key = DUEL_SCHEDULE[i]
        mask = _duel_mask(batch)
        valid_len = batch["valid_len"]
        if kind == "disc":
            disc, gen = modules[net], modules[opp]
            real_d = batch[real_inputs[net_mod]]
            real_g = batch[real_inputs[opp_mod]]

            def loss_fn(d_params):
                real_prob = disc.apply(
                    {"params": d_params}, real_d, valid_len=valid_len,
                    deterministic=False, rngs={"dropout": k1},
                )
                # generator in eval mode; fake detached (stop_gradient is
                # implicit: we only differentiate w.r.t. d_params)
                fusion = gen.apply(
                    {"params": opp_params}, real_g, valid_len=valid_len,
                    deterministic=True,
                )
                fake_prob = disc.apply(
                    {"params": d_params}, jax.lax.stop_gradient(fusion),
                    valid_len=valid_len, deterministic=False, rngs={"dropout": k2},
                )
                return (
                    bce_loss(real_prob, jnp.ones_like(real_prob), mask)
                    + bce_loss(fake_prob, jnp.zeros_like(fake_prob), mask)
                ) / 2.0
        else:
            gen, disc = modules[net], modules[opp]
            real_g = batch[real_inputs[net_mod]]

            def loss_fn(g_params):
                fusion = gen.apply(
                    {"params": g_params}, real_g, valid_len=valid_len,
                    deterministic=False, rngs={"dropout": k1},
                )
                prob = disc.apply(
                    {"params": opp_params}, fusion, valid_len=valid_len,
                    deterministic=True,
                )
                return bce_loss(prob, jnp.ones_like(prob), mask)

        loss, grads = jax.value_and_grad(loss_fn)(net_params)
        updates, opt_state_net = opts[net].update(grads, opt_state_net, net_params)
        net_params = optax.apply_updates(net_params, updates)
        return net_params, opt_state_net, loss

    def constrain_dp(state, batch):
        """Pin DP shardings: batch axis over the mesh, state replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_sharding

        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_sharding(mesh, k))
            for k, v in batch.items()
        }
        state = jax.lax.with_sharding_constraint(
            state, NamedSharding(mesh, P())
        )
        return state, batch

    def run_schedule(state, batch, rng):
        # The fused schedule instantiates ~60 attention sites (12 duels x
        # multiple encoders x fwd/bwd). Round 1: with per-site Pallas kernels
        # the program took >40 min to build vs ~7 min pure-XLA, for a
        # step-time difference that is noise at stage A's scale. Round 2
        # added geometry-shared kernel runners (each distinct geometry traces
        # once); cfg.pallas_attention selects the path, default XLA (see
        # GANConfig and PERF.md for the measurements).
        from ..ops.config import use_pallas_attention, use_scan_layers

        with use_pallas_attention(cfg.pallas_attention), use_scan_layers(cfg.scan_layers):
            if mesh is not None:
                state, batch = constrain_dp(state, batch)
            params = dict(state["params"])
            opt_state = dict(state["opt"])
            losses: Dict[str, jnp.ndarray] = {}
            keys = jax.random.split(rng, 2 * len(DUEL_SCHEDULE))
            for i, (kind, net, _nm, opp, _om, log_key) in enumerate(DUEL_SCHEDULE):
                params[net], opt_state[net], loss = duel_update(
                    i, params[net], params[opp], opt_state[net], batch,
                    keys[2 * i], keys[2 * i + 1],
                )
                losses[f"duel_{i}"] = loss
                losses[log_key] = loss  # duplicate-key overwrite, as in reference
            return {"params": params, "opt": opt_state}, losses

    return run_schedule, duel_update


def make_gan_train_step(cfg: GANConfig, mesh=None):
    """Build the GAN train step over the 12-duel schedule.

    step(state, batch, rng) -> (state, losses) where batch carries
    text/visual/audio (L, B, D), valid_len (), n_real () and losses maps each
    schedule entry index and the six logged CSV keys to scalars.

    ``mesh`` (optional ``jax.sharding.Mesh``) runs the step data-parallel:
    params/opt replicate, the batch axis shards over the mesh, and XLA
    inserts the gradient all-reduces over ICI. This is the TPU-native
    replacement for the reference wrapping the six GAN nets in
    ``nn.DataParallel`` for stage A (train_IEMOCAP.py:588-593) — and unlike
    DataParallel (which README.md:83 records as DEGRADING accuracy) it is
    numerically equivalent to the single-device step, because the masked BCE
    means are computed globally (verified in tests/test_parallel.py::
    test_gan_dp_step_matches_single_device). Sharding constraints are applied
    inside the program, so callers may pass host arrays or pre-sharded ones
    (``parallel.shard_batch``).

    ``cfg.fused_schedule`` selects the compilation strategy:
    - True (default): ONE jitted program for all 12 duels — minimal dispatch,
      maximal XLA overlap, but a long first compile;
    - False: 12 separately-jitted duel programs — each compiles fast and
      caches incrementally, at ~ms extra dispatch per batch.
    """
    run_schedule, duel_update = _make_schedule_fns(cfg, mesh)

    if cfg.fused_schedule:
        if cfg.aot_cache:
            from ..utils.aot import ShapeDispatchingAOT

            mesh_tag = dict(mesh.shape) if mesh is not None else None
            return ShapeDispatchingAOT(
                run_schedule,
                salt=f"gan12duel:{cfg}:mesh={mesh_tag}",
                donate_argnums=(0,),
                # dispatch on (batch, rng) only: the state tree's ~1000 leaves
                # have config-fixed shapes, and hashing them per call costs
                # more than the step itself (utils/aot.py)
                sig_argnums=(1, 2),
                # DP-sharded executables reload onto exactly the mesh's devices
                devices=list(mesh.devices.flat) if mesh is not None else None,
            )
        return jax.jit(run_schedule, donate_argnums=(0,))

    # Per-duel jitted steps: each compiles/caches independently.
    duel_jits = [
        jax.jit(functools.partial(duel_update, i), donate_argnums=(0, 2))
        for i in range(len(DUEL_SCHEDULE))
    ]

    def stepwise(state, batch, rng):
        from ..ops.config import use_scan_layers

        params = dict(state["params"])
        opt_state = dict(state["opt"])
        losses: Dict[str, jnp.ndarray] = {}
        keys = jax.random.split(rng, 2 * len(DUEL_SCHEDULE))
        # pin the structural switch for the lazy per-duel traces, matching
        # the layout init_gan_state built (run_schedule does the same)
        with use_scan_layers(cfg.scan_layers):
            for i, (kind, net, _nm, opp, _om, log_key) in enumerate(DUEL_SCHEDULE):
                params[net], opt_state[net], loss = duel_jits[i](
                    params[net], params[opp], opt_state[net], batch,
                    keys[2 * i], keys[2 * i + 1],
                )
                losses[f"duel_{i}"] = loss
                losses[log_key] = loss
        return {"params": params, "opt": opt_state}, losses

    return stepwise


def make_gan_epoch_step(cfg: GANConfig, mesh=None):
    """ONE program running a whole stage-A epoch: ``lax.scan`` of the
    12-duel schedule over a stacked group of same-shape batches.

    epoch_step(state, stacked_batch, keys) -> (state, stacked_losses) where
    ``stacked_batch`` carries each batch tensor with a leading step axis
    (text (N, L, B, D), ..., valid_len (N,), n_real (N,)) and ``keys`` is
    the (N, 2) stack of per-batch PRNG keys — the SAME keys the per-batch
    loop in cli/common.py::train_gan would have split, so a single-group
    epoch is numerically identical to N per-batch dispatches (pinned by
    tests/test_epoch_fused.py).

    Motivation (hosted measurement, PERF.md "stage-A dispatch"): the fused
    12-duel step spends ~6.6 ms on device but 22-37 ms wall per dispatch
    over the hosted tunnel, and the async dispatch queue does NOT pipeline
    those round-trips — stage A (and the sweep built on it, whose cost
    model is 15.3x stage-A-bound) is dispatch-bound, not compute-bound.
    Scanning the schedule over the epoch amortizes one dispatch across N
    steps — the standard TPU move of putting the training loop on device.
    Semantics: within a bucket group this is the exact per-batch math; when
    an epoch spans several bucket shapes the groups run sequentially
    (updates reorder ACROSS groups vs loader order — cli/common.py
    documents the opt-in).

    Compiles once per distinct (N, L, B) stacked shape, cached via the AOT
    executable cache like the per-batch step. NOTE the loader's per-epoch
    shuffle can vary the grouping — an epoch whose shuffle concentrates
    short dialogues differently yields a new (N, L) signature and pays that
    shape's compile mid-run (then lands in the disk cache for every later
    epoch/process). The per-batch step only ever compiles one program per
    (L, B) bucket; at the reference scale (120 train dialogues, batch 32,
    most dialogues in the top bucket) the fused path typically sees one or
    two signatures. ``cfg.fused_schedule`` is ignored here: the scan body IS
    the fused schedule (the CLIs reject ``--epoch-fused`` +
    ``--gan-schedule stepwise``).
    """
    run_schedule, _ = _make_schedule_fns(cfg, mesh)

    def epoch_fn(state, stacked, keys):
        def body(st, xs):
            batch, key = xs
            st2, losses = run_schedule(st, batch, key)
            return st2, losses

        return jax.lax.scan(body, state, (stacked, keys))

    if cfg.aot_cache:
        from ..utils.aot import ShapeDispatchingAOT

        mesh_tag = dict(mesh.shape) if mesh is not None else None
        return ShapeDispatchingAOT(
            epoch_fn,
            salt=f"gan12duel-epoch:{cfg}:mesh={mesh_tag}",
            donate_argnums=(0,),
            sig_argnums=(1, 2),
            devices=list(mesh.devices.flat) if mesh is not None else None,
        )
    return jax.jit(epoch_fn, donate_argnums=(0,))
