"""GAN-FFN TPU: a TPU-native JAX framework for adversarial multimodal
feature fusion and emotion recognition in conversation (ERC).

A ground-up re-design of the capabilities of the reference GAN-FFN codebase
(Jing-yilin/GAN-FFN) for TPU hardware:

- ``data``       — NumPy data pipeline: pickled-feature datasets, dialogue-level
                   min-max normalization, *bucketed fixed-shape batching* so every
                   train step traces/compiles once per bucket (reference:
                   dataloader.py:8-124 uses dynamic ``pad_sequence`` padding).
- ``nn``         — Flax modules: positional encoding, post-norm Transformer
                   encoder, attention primitives, GRU/LSTM scans, masked losses
                   (reference: model.py:22-298, 828-1197).
- ``models``     — the GAN generator/discriminator group, GAN_FFN fusion
                   classifiers, the DialogueRNN stack as ``lax.scan``, and the
                   MELD LSTM baseline (reference: model.py:301-1528).
- ``train``      — jitted adversarial engine (12-step cross-modal duel schedule
                   compiled into ONE XLA program; reference:
                   train_IEMOCAP.py:200-393 runs 12 eager fwd/bwd per batch) and
                   jitted classifier train/eval steps.
- ``evaluation`` — sklearn-compatible masked metrics and byte-compatible
                   classification-report/confusion-matrix writers (reference:
                   train_IEMOCAP.py:744-760).
- ``parallel``   — ``jax.sharding.Mesh`` utilities: batch-axis data parallelism
                   over ICI and multi-seed sweeps (replaces ``nn.DataParallel``,
                   reference: train_IEMOCAP.py:588-593).
- ``ops``        — Pallas TPU kernels for the hot paths, each with an XLA
                   fallback.
- ``utils``      — checkpointing with resume-and-extend semantics, CSV/PNG/txt
                   artifact writers, config system.
"""

__version__ = "0.1.0"
