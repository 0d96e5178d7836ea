"""AOT executable caching.

The hosted TPU stack bypasses jax's persistent compilation cache, so every
fresh process pays the full compile of the one-program 12-duel GAN step
(~10-15 min on v5e). ``cached_compile`` serializes the compiled XLA
executable to disk (``jax.experimental.serialize_executable``) and reloads it
on the next run — trace+lower still happens (seconds), but the compile is
skipped.

The cache key covers: a caller salt, the jax version, the device kind, the
exact device assignment (ids, in mesh order), a hash of the lowered
StableHLO, AND the output pytree structure — so any change to the traced
computation (code, shapes, dtypes, donation, placement) produces a new
entry. Multi-device (mesh-sharded) executables are supported when the caller
passes the mesh's devices; they reload onto exactly that assignment.

The out-tree term exists because identical HLO does NOT imply an identical
Python-level result: pytree nodes with zero array leaves (empty lists, empty
dicts, ``()``) contribute no XLA outputs, so e.g. an eval step returning
``(loss, preds)`` and one returning ``(loss, preds, {})`` lower to
byte-identical modules. Deserialization rebuilds results with the out_tree
STORED in the entry, so a collision would silently replay the old protocol
(observed: run_epoch unpacking ``(loss, preds, attn)`` crashed on a stale
2-tuple entry after eval steps grew an attention return).
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Callable, Optional, Sequence

import jax

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/gan_ffn_tpu_xla/exec")


def _cache_key(salt: str, lowered, devices: Sequence[Any], example_args) -> str:
    dev = devices[0]
    h = hashlib.sha256()
    h.update(salt.encode())
    h.update(jax.__version__.encode())
    h.update(f"{dev.platform}:{getattr(dev, 'device_kind', '?')}".encode())
    # the executable is specialized to its device assignment: a different
    # device set (or order — it fixes the mesh layout) is a different entry
    h.update(",".join(str(d.id) for d in devices).encode())
    # the argument avals must key the entry INDEPENDENTLY of the lowered
    # text: XLA drops dead args from the module signature (e.g. model.init
    # uses only the input SHAPES, so its HLO is identical across batch
    # sizes), but the compiled executable still validates the original
    # avals at call time
    h.update(str(jax.tree.structure(example_args)).encode())
    for leaf in jax.tree.leaves(example_args):
        h.update(
            f"{getattr(leaf, 'shape', None)}:{getattr(leaf, 'dtype', type(leaf))};".encode()
        )
    h.update(lowered.as_text().encode())
    # the OUTPUT pytree structure: zero-leaf containers (empty attention
    # dicts/lists) are invisible in the HLO and the avals, but deserialized
    # calls rebuild results with the entry's stored out_tree — two functions
    # with identical HLO and different result protocols must not collide
    try:
        h.update(str(jax.tree.structure(lowered.out_info)).encode())
    except AttributeError:  # pragma: no cover - jax without Lowered.out_info
        pass
    return h.hexdigest()[:32]


def cached_compile(
    fn: Callable,
    example_args: Sequence[Any],
    salt: str = "",
    donate_argnums: Sequence[int] = (),
    cache_dir: Optional[str] = None,
    devices: Optional[Sequence[Any]] = None,
):
    """Compile ``fn`` for ``example_args`` with an on-disk executable cache.

    Returns a compiled callable taking the same pytree arguments. Falls back
    to plain compilation if (de)serialization is unsupported on the backend.

    ``devices`` is the program's device assignment (e.g. ``mesh.devices.flat``
    for a pjit-sharded step); cached executables are reloaded onto exactly
    these devices (``deserialize_and_load(execution_devices=...)``). When
    omitted, the placement is inferred from the example args: if every
    committed array lives on one device the executable caches against that
    device; ambiguous multi-device placements bypass the cache (a device SET
    loses the mesh order deserialization must reproduce).
    """
    cache_dir = cache_dir or os.environ.get("GANFFN_EXEC_CACHE", DEFAULT_CACHE_DIR)
    lowered = jax.jit(fn, donate_argnums=tuple(donate_argnums)).lower(*example_args)
    try:
        from jax.experimental import serialize_executable as se
    except Exception:  # pragma: no cover - always present in modern jax
        return lowered.compile()

    if devices is None:
        # Infer the placement from the example args: when every committed
        # array lives on ONE device, the executable targets that device (and
        # can cache + reload correctly even on multi-device hosts, and even
        # when a TPU plugin is registered but the program is CPU-placed).
        # Multi-device placements need explicit ``devices`` — a set loses the
        # mesh order that deserialization must reproduce.
        arg_devs = set()
        for leaf in jax.tree.leaves(example_args):
            sharding = getattr(leaf, "sharding", None)
            if sharding is not None:
                try:
                    arg_devs |= set(sharding.device_set)
                except Exception:  # pragma: no cover - exotic shardings
                    return lowered.compile()
        if len(arg_devs) == 1:
            devices = list(arg_devs)
        elif not arg_devs and len(jax.devices()) == 1:
            devices = jax.devices()
        else:
            return lowered.compile()
    devices = list(devices)

    # XLA:CPU AOT deserialization is fragile for large programs (missing
    # fusion functions at materialization, machine-feature mismatches); the
    # cache exists for the TPU's multi-minute remote compiles, so CPU disk
    # caching is opt-in (the mechanics tests set GANFFN_EXEC_CACHE_CPU=1).
    if devices[0].platform == "cpu" and os.environ.get("GANFFN_EXEC_CACHE_CPU") != "1":
        return lowered.compile()

    key = _cache_key(salt, lowered, devices, example_args)
    path = os.path.join(cache_dir, f"{key}.jaxexec")
    if os.path.exists(path + ".bad"):
        # this exact program corrupted on a previous load (see
        # _first_call_fallback): without the sentinel the cache would
        # oscillate forever — evict, recompile in-process, next fresh
        # process re-stores the same corrupt-on-reload bytes, repeat
        logger.warning("executable cache key %s marked bad; compiling in-process", key)
        return lowered.compile()
    if os.path.exists(path):
        try:
            import pickle

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(
                payload,
                in_tree,
                out_tree,
                # default backend is jax.devices()[0].client, which is the
                # TPU plugin whenever it is registered — even for CPU-mesh
                # executables; bind the devices' own client explicitly
                backend=devices[0].client,
                execution_devices=devices,
            )
            logger.info("loaded cached executable %s", path)
            try:
                # refresh the LRU timestamp explicitly: on relatime/noatime
                # mounts reads do not update st_atime, which would degrade
                # _prune_cache to write-order FIFO and could evict the
                # hottest entry (a 10-15 min TPU recompile)
                os.utime(path)
            except OSError:  # pragma: no cover - entry pruned concurrently
                pass
            if devices[0].platform == "cpu":
                # XLA:CPU AOT entries can deserialize cleanly yet fail at
                # DISPATCH ("Function <fusion> not found (type id: 1)") —
                # observed driving the flagship and DialogueRNN CLIs with
                # the CPU cache opted in. Recovery is CPU-scoped: TPU
                # deserialization has been reliable across rounds, and on
                # TPU a transient tunnel error at first call must not evict
                # a good entry and block the process in a 10-15 min
                # recompile. Two recovery shapes:
                # - non-donating: wrap so the FIRST REAL call retries (a
                #   failed call is side-effect-free, replay is sound);
                # - donating (the big train steps): a failed real call may
                #   already have consumed its input buffers, so validate
                #   EAGERLY at load time on zero-filled dummies we own.
                if donate_argnums:
                    return _validate_donating(
                        compiled, lowered, path, example_args
                    )
                return _first_call_fallback(compiled, lowered, path)
            return compiled
        except Exception as e:  # stale/incompatible entry: recompile
            logger.warning("executable cache load failed (%s); recompiling", e)

    compiled = lowered.compile()
    try:
        import pickle

        os.makedirs(cache_dir, exist_ok=True)
        # per-process staging name: two concurrent first-compiles of the same
        # key must not interleave writes into one .tmp before os.replace
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(se.serialize(compiled), f)
        os.replace(tmp, path)
        logger.info("stored executable cache %s", path)
        _prune_cache(cache_dir, keep=path)
    except Exception as e:  # pragma: no cover - serialization unsupported
        logger.warning("executable cache store failed: %s", e)
    return compiled


def _evict_bad(path: str, err: Exception) -> None:
    """Remove a corrupt cache entry and leave a ``.bad`` sentinel so later
    processes skip load AND store for its key (without it the cache
    oscillates: evict, recompile in-process, next fresh process re-stores
    the same corrupt-on-reload bytes, repeat)."""
    try:
        os.remove(path)
    except OSError:  # pragma: no cover - already pruned
        pass
    try:
        with open(path + ".bad", "w") as f:
            f.write(str(err))
    except OSError:  # pragma: no cover - cache dir removed
        pass


def _zeros_like_input(leaf):
    """A zero-filled array with the shape/dtype/placement of an example arg
    — donated validation calls consume these instead of caller buffers."""
    import numpy as np

    if isinstance(leaf, jax.Array):
        zeros = jax.numpy.zeros(leaf.shape, leaf.dtype)
        return jax.device_put(zeros, leaf.sharding)
    arr = np.asarray(leaf)
    return jax.numpy.zeros(arr.shape, arr.dtype)


def _validate_donating(compiled, lowered, path: str, example_args):
    """Eagerly validate a cache-loaded DONATING executable by running it once
    on zero-filled dummies shaped/placed like ``example_args``: donation
    makes a failed real call unsound to replay (input buffers may already be
    consumed), so the dummy call takes that risk with buffers we own. On
    failure the entry is evicted + sentinel-marked and the program recompiles
    in-process — the same recovery the first-call wrapper gives non-donating
    programs. CPU-only (see caller); costs one wasted step execution per
    load, acceptable for the opt-in CPU cache."""
    try:
        dummies = jax.tree.map(_zeros_like_input, example_args)
    except Exception as e:  # exotic input type we can't fabricate — play safe
        logger.warning(
            "cannot build validation dummies for %s (%s); compiling in-process",
            path, e,
        )
        return lowered.compile()
    try:
        out = compiled(*dummies)
        # corruption surfaces ASYNCHRONOUSLY on the outputs' buffer
        # definition events — block so the failure lands inside this try
        jax.block_until_ready(out)
        return compiled
    except Exception as e:
        logger.warning(
            "cached executable %s failed validation (%s); recompiling", path, e
        )
        _evict_bad(path, e)
        return lowered.compile()


def _first_call_fallback(compiled, lowered, path: str):
    """Wrap a cache-loaded executable so its FIRST call recovers from a
    corrupt entry by recompiling (evicting the entry and leaving a ``.bad``
    sentinel so later processes skip load AND store for this key);
    subsequent calls dispatch to whichever executable survived, with zero
    wrapper cost beyond one attribute read. Only used for non-donating
    CPU-loaded programs (see caller)."""
    # `lowered` lives in the mutable state so it can be dropped once the
    # first call validates — the closure must not pin the traced module
    # (jaxpr + StableHLO text) for the lifetime of the executable
    state = {"fn": compiled, "validated": False, "lowered": lowered}

    def call(*args):
        if state["validated"]:
            return state["fn"](*args)
        try:
            out = state["fn"](*args)
            # corruption usually surfaces ASYNCHRONOUSLY ("Buffer Definition
            # Event: Error dispatching computation" raised at a later
            # device_get, far from this call site) — block on the first
            # call's outputs so the failure lands inside this try
            jax.block_until_ready(out)
        except Exception as e:
            logger.warning(
                "cached executable %s failed at dispatch (%s); recompiling",
                path, e,
            )
            _evict_bad(path, e)
            state["fn"] = state["lowered"].compile()
            out = state["fn"](*args)
        state["validated"] = True
        state["lowered"] = None
        return out

    return call


def _prune_cache(cache_dir: str, keep: str) -> None:
    """Evict least-recently-used entries beyond ``GANFFN_EXEC_CACHE_MAX_GB``
    (default 20; full-size stage-A executables are ~0.6 GB each). The
    just-written entry is never evicted."""
    try:
        limit = float(os.environ.get("GANFFN_EXEC_CACHE_MAX_GB", "20")) * 1e9
    except ValueError:  # pragma: no cover - malformed override
        return
    try:
        entries = []
        for name in os.listdir(cache_dir):
            if not name.endswith(".jaxexec"):
                continue
            p = os.path.join(cache_dir, name)
            st = os.stat(p)
            entries.append((st.st_atime, st.st_size, p))
        total = sum(size for _, size, _ in entries)
        for atime, size, p in sorted(entries):
            if total <= limit:
                break
            if os.path.abspath(p) == os.path.abspath(keep):
                continue
            os.remove(p)
            total -= size
            logger.info("evicted executable cache entry %s", p)
    except OSError:  # pragma: no cover - concurrent eviction
        pass


def cached_call(fn: Callable, *args, salt: str = ""):
    """Run ``fn(*args)`` once, jitted, through the executable disk cache.

    For one-shot computations whose compile is otherwise repaid every process
    — model/optimizer initialization above all. Eager `module.init` over the
    hosted tunnel dispatches hundreds of small ops at one RTT each; this
    compiles them into one program the first time and skips even that compile
    on later processes.
    """
    return cached_compile(fn, args, salt=salt)(*args)


def cached_init(module, rng, *args, salt: str = ""):
    """``module.init(rng, *args)`` through the executable disk cache;
    returns the ``params`` tree. Shared by every CLI entry point and
    ``init_gan_state``."""
    return cached_call(
        lambda r, *xs: module.init(r, *xs), rng, *args, salt=salt
    )["params"]


class ShapeDispatchingAOT:
    """Lazy per-shape AOT wrapper: behaves like ``jax.jit(fn)`` but each new
    argument-shape signature goes through :func:`cached_compile`.

    Used for the bucketed train steps: one executable per bucket shape, all
    disk-cached across processes.

    ``sig_argnums`` restricts WHICH arguments form the dispatch key. For a
    train step ``(state, batch, rng)`` the state tree has O(1000) leaves that
    never change shape across a run; hashing it every call cost ~20 ms of
    Python per step (measured: the stage-A step fell from 36.5 to ~17 ms once
    dispatch keyed on the batch alone). Args outside ``sig_argnums`` must
    keep constant shapes/dtypes/shardings for a given wrapper instance —
    true for the GAN state, whose shapes are fixed by the config and whose
    placement is fixed by the (salted) mesh.
    """

    def __init__(
        self,
        fn,
        salt: str = "",
        donate_argnums: Sequence[int] = (),
        sig_argnums: Optional[Sequence[int]] = None,
        devices: Optional[Sequence[Any]] = None,
    ):
        self._fn = fn
        self._salt = salt
        self._donate = tuple(donate_argnums)
        self._sig = tuple(sig_argnums) if sig_argnums is not None else None
        self._devices = list(devices) if devices is not None else None
        self._compiled = {}
        if self._sig is not None:
            # fail fast on sig_argnums typos: an index beyond the function's
            # positional arity can never select an argument, and the call-time
            # ``i < len(args)`` tolerance (meant for absent trailing optionals
            # like lr_scale) would silently weaken the dispatch key instead
            import inspect

            try:
                params = list(inspect.signature(fn).parameters.values())
            except (TypeError, ValueError):  # pragma: no cover - builtins
                params = None
            if params is not None and not any(
                p.kind is inspect.Parameter.VAR_POSITIONAL for p in params
            ):
                n_pos = sum(
                    1
                    for p in params
                    if p.kind
                    in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                )
                bad = [i for i in self._sig if i < 0 or i >= n_pos]
                if bad:
                    raise ValueError(
                        f"sig_argnums {bad} out of range for {fn} "
                        f"({n_pos} positional parameters)"
                    )

    @property
    def fn(self):
        """The wrapped (un-jitted) function — e.g. for re-lowering to run
        XLA cost analysis on the program (bench.py's pct_peak_mxu field)."""
        return self._fn

    def __call__(self, *args):
        # shape + dtype + SHARDING: an AOT executable is specialized to its
        # input shardings, so same-shaped calls with different placements
        # must dispatch to different executables.
        sig_args = (
            args
            if self._sig is None
            # tolerate optional trailing args (e.g. a train step's lr_scale):
            # present vs absent yields different leaf counts, hence a
            # different key and a separate executable
            else tuple(args[i] for i in self._sig if i < len(args))
        )
        sig = jax.tree.map(
            lambda x: (
                getattr(x, "shape", None),
                str(getattr(x, "dtype", type(x))),
                str(getattr(x, "sharding", None)),
            ),
            sig_args,
        )
        import json

        # leaf signatures + the pytree structure: same-shaped leaves under a
        # renamed/re-nested key must not dispatch to the other structure's
        # executable
        key = json.dumps(
            [str(jax.tree.structure(sig_args)), jax.tree.leaves(sig)],
            sort_keys=False,
        )
        compiled = self._compiled.get(key)
        if compiled is None:
            compiled = cached_compile(
                self._fn,
                args,
                salt=self._salt,
                donate_argnums=self._donate,
                devices=self._devices,
            )
            self._compiled[key] = compiled
        return compiled(*args)
