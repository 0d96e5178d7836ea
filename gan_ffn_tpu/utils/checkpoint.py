"""Checkpointing with the reference's resume semantics.

The reference pickles whole module objects to
``./GAN_save/{modality}_{gen,disc}.pth`` (train_IEMOCAP.py:427-438) and
reloads them with ``--use-trained-GAN``, optionally continuing GAN training
and extending the loss CSV (527-570). Here checkpoints are msgpack-serialized
param/opt-state pytrees via ``flax.serialization`` — framework-portable files,
one per network, same per-network layout:

    GAN_save/acoustic_gen.msgpack, GAN_save/acoustic_disc.msgpack, ...

plus optimizer states under ``GAN_save/opt/`` so a resumed adversarial run
continues with intact Adam moments (the reference silently RESETS optimizer
state on resume because it re-creates the six Adams inside train_GAN —
restoring moments is strictly more correct; ``load_gan_state(...,
reset_opt=True)`` replicates the reference reset).
"""

from __future__ import annotations

import os
from typing import Any, Dict

from flax import serialization

GAN_NET_NAMES = (
    "acoustic_gen",
    "acoustic_disc",
    "visual_gen",
    "visual_disc",
    "text_gen",
    "text_disc",
)


def save_params(path: str, params: Any) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_gan_state(save_dir: str, state: Dict[str, Dict[str, Any]]) -> None:
    """Save all six networks' params (+ opt states) under ``save_dir``."""
    for name in GAN_NET_NAMES:
        save_params(os.path.join(save_dir, f"{name}.msgpack"), state["params"][name])
        save_params(os.path.join(save_dir, "opt", f"{name}.msgpack"), state["opt"][name])


def load_gan_state(
    save_dir: str,
    template_state: Dict[str, Dict[str, Any]],
    reset_opt: bool = False,
) -> Dict[str, Dict[str, Any]]:
    """Restore a GANState saved by :func:`save_gan_state`.

    ``template_state`` (a freshly initialized state) supplies the pytree
    structure. ``reset_opt=True`` keeps fresh optimizer states — the
    reference's resume behavior.
    """
    params = {}
    opt = {}
    for name in GAN_NET_NAMES:
        params[name] = load_params_any_layout(
            os.path.join(save_dir, f"{name}.msgpack"), template_state["params"][name]
        )
        opt_path = os.path.join(save_dir, "opt", f"{name}.msgpack")
        if reset_opt or not os.path.exists(opt_path):
            opt[name] = template_state["opt"][name]
        else:
            opt[name] = load_params_any_layout(opt_path, template_state["opt"][name])
    return {"params": params, "opt": opt}


def load_params_any_layout(path: str, template):
    """``load_params`` that bridges the two encoder layouts (public:
    the export/predict CLIs use it to accept --scan-layers checkpoints).

    A checkpoint written under the other ``scan_layers`` setting (unrolled
    per-layer ``layers_i`` subtrees vs one stacked ``layers`` subtree,
    nn/transformer.py) has a different pytree structure than ``template``.
    On mismatch, retry against the converted template and convert the loaded
    tree back to the template's layout — so ``--use-trained-GAN`` composes
    with ``--scan-layers`` in either direction."""
    try:
        return load_params(path, template)
    except Exception as err:  # noqa: BLE001 — flax raises plain ValueErrors here
        import jax

        from ..nn.transformer import stack_layer_params, unstack_layer_params

        for conv, inv in (
            (stack_layer_params, unstack_layer_params),
            (unstack_layer_params, stack_layer_params),
        ):
            alt = conv(template)
            if jax.tree_util.tree_structure(alt) == jax.tree_util.tree_structure(
                template
            ):
                continue  # conversion is a no-op: not a layout mismatch
            try:
                return inv(load_params(path, alt))
            except Exception:  # noqa: BLE001
                continue
        raise err
