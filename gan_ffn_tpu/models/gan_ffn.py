"""Downstream fusion classifiers (reference model.py:1405-1528).

``GAN_FFN``: the flagship — the three trained generators produce fusion-space
sequences that are summed element-wise and classified per utterance by one
linear head + log_softmax (model.py:1440-1449).

``GAN_FFN_DialogueRNN``: same fusion sum feeding the bidirectional
DialogueRNN ``BiModel`` (model.py:1514-1526).

In the reference the *trained generator objects* are passed into the
classifier's constructor; here the classifier modules re-declare the generator
architectures as submodules and the trainer grafts the adversarially
pre-trained generator params into the classifier's parameter tree (see
train/classifier.py). As in the reference, the generators are NOT frozen —
stage B fine-tunes them with the classifier loss (train_IEMOCAP.py:661
optimizes model.parameters()).

Omitted relative to the reference: GAN_FFN's constructed-but-never-called
``lstm``/``smax_fc`` heads (model.py:1425-1430) and GAN_FFN_DialogueRNN's
unused ``fc1`` (model.py:1512) — they receive no gradients in the reference
and carry no behavior.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ..nn.core import TorchLinear
from .dialogue_rnn import BiModel
from .generators import AcousticGenerator, TextGenerator, VisualGenerator


class GAN_FFN(nn.Module):
    """(acoustic (L,B,100), visual (L,B,512), text (L,B,100)) ->
    (log_prob (L,B,n_classes), alpha, alpha_f, alpha_b)."""

    n_classes: int = 6
    dropout: float = 0.2  # classifier-level dropout (unused in forward, as in reference)
    D_h: int = 100
    gen_dropout: float = 0.2
    gen_num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, acoustic, visual, text, valid_len=None, deterministic: bool = True):
        a = AcousticGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="acoustic_generator")(
            acoustic, valid_len=valid_len, deterministic=deterministic
        )
        v = VisualGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="visual_generator")(
            visual, valid_len=valid_len, deterministic=deterministic
        )
        t = TextGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="text_generator")(
            text, valid_len=valid_len, deterministic=deterministic
        )
        fusion = a + v + t  # (L, B, D_h)
        logits = TorchLinear(self.n_classes, name="fc")(fusion)
        log_prob = jax.nn.log_softmax(logits.astype(jax.numpy.float32), axis=2)
        return log_prob, [], [], []


class GAN_FFN_DialogueRNN(nn.Module):
    """(acoustic, visual, text, qmask, umask) -> (log_prob, alpha, alpha_f, alpha_b)."""

    D_m: int = 100
    D_g: int = 500
    D_p: int = 500
    D_e: int = 100
    D_h: int = 100
    D_a: int = 100
    n_classes: int = 6
    listener_state: bool = False
    context_attention: str = "general"
    dropout_rec: float = 0.1
    dropout: float = 0.6
    gen_dropout: float = 0.2
    gen_num_layers: int = 8
    deterministic: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, acoustic, visual, text, qmask, umask, valid_len=None):
        det = self.deterministic
        a = AcousticGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="acoustic_generator")(
            acoustic, valid_len=valid_len, deterministic=det
        )
        v = VisualGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="visual_generator")(
            visual, valid_len=valid_len, deterministic=det
        )
        t = TextGenerator(self.D_h, self.gen_dropout, self.gen_num_layers, self.dtype, name="text_generator")(
            text, valid_len=valid_len, deterministic=det
        )
        fusion = a + v + t  # (L, B, D_h == D_m)
        return BiModel(
            D_m=self.D_m,
            D_g=self.D_g,
            D_p=self.D_p,
            D_e=self.D_e,
            D_h=self.D_h,
            n_classes=self.n_classes,
            listener_state=self.listener_state,
            context_attention=self.context_attention,
            D_a=self.D_a,
            dropout_rec=self.dropout_rec,
            dropout=self.dropout,
            deterministic=det,
            dtype=self.dtype,
            name="bi_model",
        )(fusion, qmask, umask)
