"""Baseline / legacy models (reference model.py:301-825).

Implemented for capability-surface completeness:

- ``MELDLSTMModel`` — the model actually used by the MELD entry point
  (model.py:520-562; train_MELD.py:147-150): 4-layer BiLSTM + per-timestep
  MatchingAttention with hardswish residual, batched here.
- ``LSTMModel2`` — single 2-layer BiLSTM +/- MatchingAttention (model.py:474-517).
- ``LSTMModel`` — 3 parallel BiLSTMs per modality + multi-head Attention
  fusion (model.py:393-471), including the visual [:, :, :100] slice quirk.
- ``CNN`` — text CNN (model.py:301-354) WITHOUT the stray debug print.
- ``FullyConnection`` — 100->2048 GELU stack (model.py:565-586).
- ``Emoformer`` — per-modality self-attention x2 + cross-modal matching + LSTM
  (model.py:589-688).
- ``CNNFeatureExtractor`` / ``E2ELSTMModel`` — token-level end-to-end pipeline
  (model.py:691-825).

- ``TextCNN`` — a RUNNABLE realization of model.py:357-390. The reference
  class cannot execute (``self.config`` read before assignment in __init__,
  and a missing channel axis in forward — both proven by
  tests/test_reference_parity.py::test_textcnn_reference_is_unrunnable);
  this module implements the evident intent with those two defects repaired
  and an explicit ``sentence_max_size``/``label_num`` config surface.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import Attention, MatchingAttention, matching
from ..nn.core import TorchLinear, gelu, hardswish, LayerNorm
from ..nn.recurrent import LSTM


class MELDLSTMModel(nn.Module):
    """U (L, B, D_m), qmask, umask (B, L) -> (log_prob (L, B, C), alphas...).

    The reference's per-timestep ``matchatt`` loop (model.py:546-555) is one
    batched attention call; the hardswish residual and the no-dropout forward
    are preserved.
    """

    D_m: int
    D_e: int
    D_h: int
    n_classes: int = 7
    dropout: float = 0.5
    att2: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, U, qmask, umask, deterministic: bool = True):
        if self.dtype is not None:
            # the LSTM cells run at inputs.dtype (nn/recurrent.py:164), so
            # casting here puts the dominant 4-layer recurrence on the
            # requested compute dtype (serving.bf16_variant deployments)
            U = U.astype(self.dtype)
        emotions, _ = LSTM(
            hidden_size=self.D_e,
            num_layers=4,
            bidirectional=True,
            dropout=self.dropout,
            name="lstm",
        )(U, deterministic=deterministic)
        alpha = []
        if self.att2:
            att_emotions, alpha_t = MatchingAttention(
                2 * self.D_e, 2 * self.D_e, att_type="general2", name="matchatt"
            )(emotions, emotions, umask)
            att_emotions = hardswish(att_emotions)
            hidden = hardswish(emotions + att_emotions)
            alpha = alpha_t[:, :, 0, :]
        else:
            hidden = gelu(TorchLinear(self.D_h, name="linear")(emotions))
        logits = TorchLinear(self.n_classes, name="smax_fc")(hidden)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)
        return log_prob, alpha, [], []


class LSTMModel2(nn.Module):
    """Single BiLSTM classifier +/- MatchingAttention (model.py:474-517)."""

    D_m: int
    D_e: int
    D_h: int
    n_classes: int = 7
    dropout: float = 0.5
    attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, U, qmask, umask, deterministic: bool = True):
        emotions, _ = LSTM(
            hidden_size=self.D_e,
            num_layers=2,
            bidirectional=True,
            dropout=self.dropout,
            name="lstm",
        )(U, deterministic=deterministic)
        alpha = []
        if self.attention:
            att_emotions, alpha_t = MatchingAttention(
                2 * self.D_e, 2 * self.D_e, att_type="general2", name="matchatt"
            )(emotions, emotions, umask)
            hidden = nn.relu(TorchLinear(self.D_h, name="linear")(att_emotions))
            alpha = alpha_t[:, :, 0, :]
        else:
            hidden = nn.relu(TorchLinear(self.D_h, name="linear")(emotions))
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        logits = TorchLinear(self.n_classes, name="smax_fc")(hidden)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)
        return log_prob, alpha, [], []


class LSTMModel(nn.Module):
    """3 parallel BiLSTMs + multi-head Attention fusion (model.py:393-471).

    Quirks preserved: visual features truncated to their first 100 dims
    (model.py:421), gelu(emotion + att) residual, 600-d fused classifier.
    """

    D_m: int
    D_e: int
    D_h: int
    n_classes: int = 7
    dropout: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, textf, acouf, visuf, qmask, umask, deterministic: bool = True):
        mk_lstm = lambda name: LSTM(
            hidden_size=self.D_e,
            num_layers=2,
            bidirectional=True,
            dropout=self.dropout,
            name=name,
        )
        e1, _ = mk_lstm("lstm_1")(textf, deterministic=deterministic)
        e2, _ = mk_lstm("lstm_2")(acouf, deterministic=deterministic)
        e3, _ = mk_lstm("lstm_3")(visuf[:, :, :100], deterministic=deterministic)
        emotion = jnp.concatenate([e1, e2, e3], axis=-1)  # (L, B, 6*D_e)
        # reference applies its batch-first Attention to a time-major tensor;
        # replicated verbatim (axis 0 is "batch" from Attention's view).
        att, _ = Attention(600, name="attention")(
            emotion, emotion, deterministic=deterministic
        )
        hidden = gelu(emotion + att)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        logits = TorchLinear(self.n_classes, name="smax_fc")(hidden)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)
        return log_prob, [], [], [], hidden


class CNN(nn.Module):
    """Text CNN over utterance features (model.py:301-354)."""

    embedding_dim: int
    num_filter: int
    filter_sizes: Sequence[int]
    output_dim: int
    dropout: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, text, qmask, umask, deterministic: bool = True):
        # text (L, B, E) -> (B, L, E) -> conv windows over L
        x = text.transpose(1, 0, 2)
        B, L, E = x.shape
        pooled = []
        for fs in self.filter_sizes:
            # Conv2d(1, num_filter, (fs, E)) == 1D conv over time with full-width kernel
            conv = nn.Conv(
                features=self.num_filter,
                kernel_size=(fs, E),
                padding="VALID",
                name=f"conv_{fs}",
            )
            # (B, L, E, 1): spatial (L, E), single channel — matches the
            # reference's Conv2d(1, F, (fs, E)) over (B, 1, L, E)
            c = nn.relu(conv(x[:, :, :, None]))  # (B, L-fs+1, 1, F)
            c = c[:, :, 0, :]  # (B, L-fs+1, F)
            pooled.append(jnp.max(c, axis=1))  # (B, F)
        cat = jnp.concatenate(pooled, axis=1)
        cat = nn.Dropout(self.dropout)(cat, deterministic=deterministic)
        logits = TorchLinear(self.output_dim, name="fc")(cat)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return log_prob, [], [], [], cat


class TextCNN(nn.Module):
    """Runnable realization of the reference's dead TextCNN (model.py:357-390).

    The reference reads ``self.config.sentence_max_size`` / ``.label_num``
    before ever assigning ``self.config`` (AttributeError at construction)
    and feeds a 3-D (B, L, E) tensor into ``Conv2d(1, 1, (k, 100))``
    (channel-rank mismatch). Repairs: an explicit config surface (the two
    attributes the reference reads) and the channel axis on the input.
    Semantics otherwise as written: three single-output-channel full-width
    convs (k = 3/4/5) -> relu -> max-pool over the conv output's time axis
    -> concat to (B, 3) -> Linear(3 -> label_num). Returns raw logits (the
    reference applies no log_softmax here).
    """

    sentence_max_size: int
    label_num: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x (L, B, E) -> (B, L, E, 1): NHWC single-channel image, matching
        # the repaired torch forward's (B, 1, L, E)
        xb = x.transpose(1, 0, 2)[:, :, :, None]
        E = x.shape[-1]
        feats = []
        for k in (3, 4, 5):
            c = nn.Conv(
                features=1, kernel_size=(k, E), padding="VALID", name=f"conv{k}"
            )(xb)
            c = nn.relu(c)  # (B, L-k+1, 1, 1)
            # MaxPool2d((sentence_max_size - k + 1, 1)) over the full window
            pool_len = self.sentence_max_size - k + 1
            feats.append(jnp.max(c[:, :pool_len, 0, 0], axis=1))  # (B,)
        cat = jnp.stack(feats, axis=1)  # (B, 3)
        return TorchLinear(self.label_num, name="linear1")(cat)


class FullyConnection(nn.Module):
    """GELU MLP 100 -> 128 -> 256 -> 512 -> 1024 -> 2048 (model.py:565-586)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, width in enumerate((128, 256, 512, 1024)):
            x = gelu(TorchLinear(width, name=f"fc{i + 1}")(x))
        return TorchLinear(2048, name="fc5")(x)


class Emoformer(nn.Module):
    """Per-modality self-attention x2 + cross-modal matching + LSTM
    (model.py:589-688). Faithful to the reference's active (attention=False
    default path) and attention=True path."""

    D_m: int
    D_e: int
    n_classes: int = 7
    dropout: float = 0.5
    attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, textf, acouf, visuf, qmask, umask, deterministic: bool = True):
        det = deterministic
        norm_1 = LayerNorm(name="norm_1")
        norm_2 = LayerNorm(name="norm_2")

        out_t1, _ = Attention(self.D_m, name="attention_1")(textf, textf, deterministic=det)
        out_a1, _ = Attention(self.D_m, name="attention_2")(acouf, acouf, deterministic=det)
        out_v1, _ = Attention(self.D_m + 412, name="attention_3")(visuf, visuf, deterministic=det)
        textf_1 = norm_1(textf + out_t1)
        acouf_1 = norm_1(acouf + out_a1)
        visuf_1 = norm_2(visuf + out_v1)
        visuf_1 = nn.relu(TorchLinear(100, name="transform3")(visuf_1))

        out_t2, _ = Attention(self.D_m, name="attention_4")(textf_1, textf_1, deterministic=det)
        out_a2, _ = Attention(self.D_m, name="attention_5")(acouf_1, acouf_1, deterministic=det)
        out_v2, _ = Attention(self.D_m, name="attention_6")(visuf_1, visuf_1, deterministic=det)
        textf_1 = norm_1(textf_1 + out_t2)
        acouf_1 = norm_1(acouf_1 + out_a2)
        visuf_1 = norm_1(visuf_1 + out_v2)

        textf_u = textf
        textf = FullyConnection(name="fc1")(textf + textf_1)
        acouf = FullyConnection(name="fc2")(acouf + acouf_1)
        visuf = FullyConnection(name="fc3")(
            TorchLinear(self.D_m, name="transform")(visuf) + visuf_1
        )

        alpha = []
        if self.attention:
            matchatt = MatchingAttention(2048, 2048, att_type="general2", name="matchatt")
            emotions = [textf, acouf, visuf]
            output = 0.0
            for i in emotions:
                for j in emotions:
                    hid, alpha = matching(
                        lambda M, x, m: matchatt(M, x, m), i, j, umask
                    )
                    output = output + hid
            output, _ = LSTM(
                hidden_size=self.D_e, num_layers=2, bidirectional=True,
                dropout=self.dropout, name="lstm_1",
            )(TorchLinear(2 * self.D_e, name="transform2")(output + textf_u),
              deterministic=det)
        else:
            output = TorchLinear(2048, name="transform4")(textf_u) + textf + acouf + visuf
            output, _ = LSTM(
                hidden_size=self.D_e, num_layers=2, bidirectional=True,
                dropout=self.dropout, name="lstm",
            )(output, deterministic=det)

        output = nn.Dropout(self.dropout)(output, deterministic=det)
        logits = TorchLinear(self.n_classes, name="smax_fc")(output)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)
        return log_prob, alpha, [], [], output


class CNNFeatureExtractor(nn.Module):
    """Token CNN utterance encoder (model.py:691-751)."""

    vocab_size: int
    embedding_dim: int = 300
    output_size: int = 100
    filters: int = 50
    kernel_sizes: Sequence[int] = (3, 4, 5)
    dropout: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, tokens, umask, deterministic: bool = True):
        # tokens (L, B, W) int -> features (L, B, output_size), masked
        L, B, W = tokens.shape
        emb = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(
            tokens.reshape(L * B, W)
        )  # (LB, W, E)
        pooled = []
        for K in self.kernel_sizes:
            c = nn.Conv(self.filters, kernel_size=(K,), padding="VALID", name=f"conv_{K}")(emb)
            pooled.append(jnp.max(nn.relu(c), axis=1))  # (LB, filters)
        cat = jnp.concatenate(pooled, axis=1)
        cat = nn.Dropout(self.dropout)(cat, deterministic=deterministic)
        feat = nn.relu(TorchLinear(self.output_size, name="fc")(cat))
        feat = feat.reshape(L, B, self.output_size)
        return feat * umask.T[:, :, None].astype(feat.dtype)


class E2ELSTMModel(nn.Module):
    """Token-level end-to-end classifier (model.py:754-825)."""

    D_e: int
    D_h: int
    vocab_size: int
    embedding_dim: int = 300
    cnn_output_size: int = 100
    cnn_filters: int = 50
    cnn_kernel_sizes: Sequence[int] = (3, 4, 5)
    cnn_dropout: float = 0.5
    n_classes: int = 7
    dropout: float = 0.5
    attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, input_seq, qmask, umask, deterministic: bool = True):
        U = CNNFeatureExtractor(
            self.vocab_size,
            self.embedding_dim,
            self.cnn_output_size,
            self.cnn_filters,
            self.cnn_kernel_sizes,
            self.cnn_dropout,
            name="cnn_feat_extractor",
        )(input_seq, umask, deterministic=deterministic)
        emotions, _ = LSTM(
            hidden_size=self.D_e, num_layers=2, bidirectional=True,
            dropout=self.dropout, name="lstm",
        )(U, deterministic=deterministic)
        alpha = []
        if self.attention:
            att_emotions, alpha_t = MatchingAttention(
                2 * self.D_e, 2 * self.D_e, att_type="general2", name="matchatt"
            )(emotions, emotions, umask)
            hidden = nn.relu(TorchLinear(self.D_h, name="linear")(att_emotions))
            alpha = alpha_t[:, :, 0, :]
        else:
            hidden = nn.relu(TorchLinear(self.D_h, name="linear")(emotions))
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        logits = TorchLinear(self.n_classes, name="smax_fc")(hidden)
        log_prob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)
        return log_prob, alpha, [], []
