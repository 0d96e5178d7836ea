"""Optional TensorBoard logging (reference --tensorboard flag,
train_IEMOCAP.py:508-511, 702-704).

The reference logs ``test: accuracy/loss`` and ``train: accuracy/loss``
scalars per epoch (plus per-parameter gradient histograms every batch, which
would force a device sync per step — replaced by per-epoch scalar summaries).
Uses ``torch.utils.tensorboard`` when available; silently no-ops otherwise.
"""

from __future__ import annotations


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

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
