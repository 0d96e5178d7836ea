"""Optimizers replicating ``torch.optim.Adam`` semantics.

torch's Adam applies L2 weight decay by adding ``wd * param`` to the gradient
BEFORE the moment updates (unlike AdamW) — reproduced with
``optax.add_decayed_weights`` ahead of ``scale_by_adam``. Bias correction and
eps placement in ``optax.scale_by_adam`` already match torch.
"""

from __future__ import annotations

import optax


def torch_adam(
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)
