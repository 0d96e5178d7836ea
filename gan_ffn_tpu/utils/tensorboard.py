"""Optional TensorBoard logging (reference --tensorboard flag,
train_IEMOCAP.py:508-511, 702-704).

The reference logs ``test: accuracy/loss`` and ``train: accuracy/loss``
scalars per epoch plus per-parameter gradient histograms EVERY BATCH
(train_IEMOCAP.py:166-168) — a forced device sync per step. The CLIs default
to per-epoch granularity (``add_param_histograms`` on one sampled batch's
gradients, see ``train.classifier.make_grad_fn``, keeping step dispatch
asynchronous) and offer ``--tb-grad-histograms batch`` to match the
reference's per-batch cadence via the epoch loop's ``on_batch`` hook.
Uses ``torch.utils.tensorboard`` when available; silently no-ops otherwise.
"""

from __future__ import annotations

import numpy as np


class TBWriter:
    def __init__(self, logdir: str = "./tensorboard", enabled: bool = True):
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception:
            self._writer = None

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def add_histogram(self, tag: str, values, step: int) -> None:
        if self._writer is not None:
            self._writer.add_histogram(tag, np.asarray(values).ravel(), step)

    def add_param_histograms(self, tree, step: int, prefix: str = "") -> None:
        """One histogram per leaf of a (gradient) pytree, tagged by its path
        (dot-joined, mirroring torch's ``named_parameters`` tags)."""
        if self._writer is None:
            return
        import jax

        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            tag = prefix + ".".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            self.add_histogram(tag, leaf, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
