#!/bin/bash
# Sweep driver (reference run.sh:1-22).
#
# The reference launches train_IEMOCAP.py once per GAN-epochs value (active
# lines) and carries a commented resume-sweep loop (85..185 step 5). The
# TPU-native equivalent shares stage A across the whole sweep:
#
#   python -m gan_ffn_tpu.cli.sweep --gan-epochs 85 185 5 --epochs 160
#
# For a synthetic fixture where the GAN-epochs budget measurably moves final
# F1 (classes separable only through cross-modal fusion; read out at a
# bounded stage-B budget — VALIDATION.md "Discriminating sweep"):
#
#   python -m gan_ffn_tpu.cli.sweep --gan-epochs 5 185 30 --epochs 135 \
#       --synthetic --synthetic-class-spread 1.0 --synthetic-label-noise 0.25 \
#       --synthetic-confusable-pairs 2 --synthetic-nonuniform-priors
#
# The reference's literal two-run form is also supported:

python -m gan_ffn_tpu.cli.train_iemocap --GAN-epochs=150 --continue-train-GAN-step=0 "$@"
python -m gan_ffn_tpu.cli.train_iemocap --GAN-epochs=120 --continue-train-GAN-step=0 "$@"
