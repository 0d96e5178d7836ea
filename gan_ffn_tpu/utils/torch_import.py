"""Import trained checkpoints from the reference implementation.

The reference saves whole torch module objects to
``GAN_save/{modality}_{gen,disc}.pth`` (train_IEMOCAP.py:427-438). A user
migrating with already-trained GANs can convert those files into this
framework's parameter trees and continue exactly where they left off:

    python -m gan_ffn_tpu.cli.import_reference --src ./GAN_save --dst ./GAN_save_jax

Requires torch at conversion time only. Unpickling the reference's .pth files
needs the reference's ``model`` module importable (torch pickles by class
path); pass ``--reference /path/to/reference`` to put it on sys.path.

The weight mapping here mirrors tests/test_reference_parity.py, where it is
pinned against the live reference modules output-for-output.
"""

from __future__ import annotations

from typing import Any, Dict


def _t2n(t):
    return t.detach().cpu().numpy()


def linear_params(linear) -> Dict[str, Any]:
    p = {"kernel": _t2n(linear.weight).T}
    if linear.bias is not None:
        p["bias"] = _t2n(linear.bias)
    return p


def layernorm_params(ln) -> Dict[str, Any]:
    return {"scale": _t2n(ln.weight), "bias": _t2n(ln.bias)}


def mha_params(mha) -> Dict[str, Any]:
    return {
        "in_proj_kernel": _t2n(mha.in_proj_weight).T,
        "in_proj_bias": _t2n(mha.in_proj_bias),
        "out_proj": linear_params(mha.out_proj),
    }


def encoder_params(encoder) -> Dict[str, Any]:
    return {
        f"layers_{i}": {
            "self_attn": mha_params(layer.self_attn),
            "linear1": linear_params(layer.linear1),
            "linear2": linear_params(layer.linear2),
            "norm1": layernorm_params(layer.norm1),
            "norm2": layernorm_params(layer.norm2),
        }
        for i, layer in enumerate(encoder.layers)
    }


def generator_params(ref_gen) -> Dict[str, Any]:
    """Acoustic/Visual/Text generator (model.py:1200-1294) -> our param tree."""
    return {
        "net": {
            "transformer_encoder": encoder_params(ref_gen.transformer_encoder),
            "fc1": linear_params(ref_gen.fc1),
            "fc2": linear_params(ref_gen.fc2),
        }
    }


def discriminator_params(ref_disc) -> Dict[str, Any]:
    """Acoustic/Visual/Text discriminator (model.py:1297-1397)."""
    p = {
        "net": {
            "transformer_encoder": encoder_params(ref_disc.transformer_encoder),
            "fc1": linear_params(ref_disc.fc1),
            "fc2": linear_params(ref_disc.fc2),
            "fc3": linear_params(ref_disc.fc3),
        }
    }
    if hasattr(ref_disc, "object"):
        p["object"] = linear_params(ref_disc.object)
    return p


_PTH_TO_NET = {
    "acoustic_gen": generator_params,
    "visual_gen": generator_params,
    "text_gen": generator_params,
    "acoustic_disc": discriminator_params,
    "visual_disc": discriminator_params,
    "text_disc": discriminator_params,
}


def _unwrap(module):
    # the reference wraps fresh nets in nn.DataParallel before saving
    return getattr(module, "module", module)


def import_gan_save(src_dir: str, dst_dir: str, reference_path: str = "/root/reference") -> Dict[str, str]:
    """Convert all six reference .pth files in ``src_dir`` into msgpack param
    files under ``dst_dir`` (same layout utils/checkpoint.py reads)."""
    import os
    import sys

    import torch

    from .checkpoint import save_params

    if reference_path and reference_path not in sys.path:
        sys.path.insert(0, reference_path)

    written = {}
    for name, convert in _PTH_TO_NET.items():
        src = os.path.join(src_dir, f"{name}.pth")
        if not os.path.exists(src):
            continue
        module = _unwrap(torch.load(src, map_location="cpu", weights_only=False)).eval()
        params = convert(module)
        written[name] = save_params(os.path.join(dst_dir, f"{name}.msgpack"), params)
    return written
