"""Full-model numerical parity against the ACTUAL reference implementation.

These tests import the reference's torch modules from /root/reference at test
time (read-only), copy their trained-initialization weights into our Flax
models, and assert eval-mode outputs match. They are the end-to-end
complement to the per-primitive oracles in test_nn_parity.py.

Skipped automatically when /root/reference is not present.
"""

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytest.importorskip("torch")
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_mapping import (  # noqa: E402
    assert_tree_allclose,
    encoder_params,
    gru_cell_params,
    linear_params,
    t2grad,
    t2n,
)

refmodel = None


def setup_module(module):
    global refmodel
    import importlib.util
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available", allow_module_level=True)
    spec = importlib.util.spec_from_file_location("refmodel", os.path.join(REFERENCE, "model.py"))
    refmodel = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refmodel)
    torch.manual_seed(0)


L, B = 14, 3


def _generator_params(ref_gen, get=t2n):
    return {
        "net": {
            "transformer_encoder": encoder_params(ref_gen.transformer_encoder, get),
            "fc1": linear_params(ref_gen.fc1, get),
            "fc2": linear_params(ref_gen.fc2, get),
        }
    }


def _discriminator_params(ref_disc, with_object=False, get=t2n):
    p = {
        "net": {
            "transformer_encoder": encoder_params(ref_disc.transformer_encoder, get),
            "fc1": linear_params(ref_disc.fc1, get),
            "fc2": linear_params(ref_disc.fc2, get),
            "fc3": linear_params(ref_disc.fc3, get),
        }
    }
    if with_object:
        p["object"] = linear_params(ref_disc.object, get)
    return p


@pytest.mark.parametrize(
    "ref_cls,our_name,d_in",
    [
        ("AcousticGenerator", "AcousticGenerator", 100),
        ("VisualGenerator", "VisualGenerator", 512),
        ("TextGenerator", "TextGenerator", 100),
    ],
)
def test_generator_full_parity(ref_cls, our_name, d_in):
    import gan_ffn_tpu.models as M

    ref = getattr(refmodel, ref_cls)(D_h=100, dropout=0.2).eval()
    ours = getattr(M, our_name)(D_h=100)
    x = np.random.default_rng(0).normal(size=(L, B, d_in)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(
        {"params": _generator_params(ref)}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize(
    "ref_cls,our_name",
    [
        ("AcousticDiscriminator", "AcousticDiscriminator"),
        ("TextDiscriminator", "TextDiscriminator"),
    ],
)
def test_discriminator_full_parity(ref_cls, our_name):
    import gan_ffn_tpu.models as M

    ref = getattr(refmodel, ref_cls)(D_h=100, dropout=0.2).eval()
    ours = getattr(M, our_name)(D_h=100)
    x = np.random.default_rng(1).normal(size=(L, B, 100)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(
        {"params": _discriminator_params(ref)}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


def test_visual_discriminator_full_parity_both_paths():
    import gan_ffn_tpu.models as M

    ref = refmodel.VisualDiscriminator(D_h=100, dropout=0.2).eval()
    ours = M.VisualDiscriminator(D_h=100)
    params = {"params": _discriminator_params(ref, with_object=True)}
    for d_in, seed in ((512, 2), (100, 3)):
        x = np.random.default_rng(seed).normal(size=(L, B, d_in)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        got = ours.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


def test_gan_ffn_full_parity():
    import gan_ffn_tpu.models as M

    a_g = refmodel.AcousticGenerator(100, 0.2)
    v_g = refmodel.VisualGenerator(100, 0.2)
    t_g = refmodel.TextGenerator(100, 0.2)
    ref = refmodel.GAN_FFN(a_g, v_g, t_g, n_classes=6, dropout=0.6).eval()
    ours = M.GAN_FFN(n_classes=6)
    params = {
        "acoustic_generator": _generator_params(a_g)["net"],
        "visual_generator": _generator_params(v_g)["net"],
        "text_generator": _generator_params(t_g)["net"],
        "fc": linear_params(ref.fc),
    }
    params = {
        "acoustic_generator": {"net": params["acoustic_generator"]},
        "visual_generator": {"net": params["visual_generator"]},
        "text_generator": {"net": params["text_generator"]},
        "fc": params["fc"],
    }
    rng = np.random.default_rng(4)
    a = rng.normal(size=(L, B, 100)).astype(np.float32)
    v = rng.normal(size=(L, B, 512)).astype(np.float32)
    t = rng.normal(size=(L, B, 100)).astype(np.float32)
    with torch.no_grad():
        expected, *_ = ref(torch.from_numpy(a), torch.from_numpy(v), torch.from_numpy(t))
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(a), jnp.asarray(v), jnp.asarray(t),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=5e-4)


def _dialogue_rnn_params(ref_rnn, context_attention, get=t2n):
    cell = ref_rnn.dialogue_cell
    p = {
        "g_cell": gru_cell_params(cell.g_cell, get),
        "p_cell": gru_cell_params(cell.p_cell, get),
        "e_cell": gru_cell_params(cell.e_cell, get),
    }
    if context_attention == "simple":
        p["attention"] = {"scalar": linear_params(cell.attention.scalar, get)}
    else:
        p["attention"] = {"transform": linear_params(cell.attention.transform, get)}
    if ref_rnn.dialogue_cell.listener_state:
        p["l_cell"] = gru_cell_params(cell.l_cell, get)
    return {"dialogue_cell": p}


@pytest.mark.parametrize("context_attention", ["simple", "general"])
def test_bimodel_full_parity(context_attention):
    """BiModel (both DialogueRNN directions + att2) against the reference,
    variable-length batch, eval mode."""
    import gan_ffn_tpu.models as M

    D_m, D_g, D_p, D_e, D_h, C = 12, 10, 8, 6, 7, 6
    ref = refmodel.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C,
        context_attention=context_attention, dropout_rec=0.1, dropout=0.5,
    ).eval()
    ours = M.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C,
        context_attention=context_attention, dropout_rec=0.1, dropout=0.5,
        deterministic=True,
    )
    params = {
        "dialog_rnn_f": _dialogue_rnn_params(ref.dialog_rnn_f, context_attention),
        "dialog_rnn_r": _dialogue_rnn_params(ref.dialog_rnn_r, context_attention),
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
    }
    rng = np.random.default_rng(5)
    U = rng.normal(size=(L, B, D_m)).astype(np.float32)
    qmask = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
    lengths = [L, L - 4, 5]
    umask = np.zeros((B, L), dtype=np.float32)
    for b, n in enumerate(lengths):
        umask[b, :n] = 1.0
        U[n:, b] = 0.0
        qmask[n:, b] = 0.0

    with torch.no_grad():
        expected, *_ = ref(
            torch.from_numpy(U), torch.from_numpy(qmask), torch.from_numpy(umask)
        )
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(U), jnp.asarray(qmask), jnp.asarray(umask)
    )
    # compare only real utterances (padding rows diverge by construction:
    # the reference never sees fully-padded tails beyond the batch max)
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[:n, b], expected.numpy()[:n, b], rtol=2e-3, atol=2e-4
        )


def test_meld_lstm_full_parity():
    import gan_ffn_tpu.models as M

    # the reference's att2 path implicitly requires D_h == 2*D_e (its real
    # config is D_e=300, D_h=600; other combinations crash in torch)
    D_m, D_e, D_h, C = 20, 16, 32, 7
    ref = refmodel.MELDLSTMModel(D_m, D_e, D_h, n_classes=C, dropout=0.5).eval()
    ours = M.MELDLSTMModel(D_m=D_m, D_e=D_e, D_h=D_h, n_classes=C, dropout=0.5)
    from torch_mapping import lstm_params

    params = {
        "lstm": lstm_params(ref.lstm),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
    }
    rng = np.random.default_rng(6)
    U = rng.normal(size=(L, B, D_m)).astype(np.float32)
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(
            torch.from_numpy(U), None, torch.from_numpy(umask)
        )
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(U), None, jnp.asarray(umask),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


def test_lstm_model2_full_parity():
    import gan_ffn_tpu.models as M
    from torch_mapping import lstm_params

    D_m, D_e, D_h, C = 20, 16, 24, 6
    ref = refmodel.LSTMModel2(D_m, D_e, D_h, n_classes=C, dropout=0.5, attention=True).eval()
    ours = M.LSTMModel2(D_m=D_m, D_e=D_e, D_h=D_h, n_classes=C, dropout=0.5, attention=True)
    params = {
        "lstm": lstm_params(ref.lstm),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
    }
    rng = np.random.default_rng(7)
    U = rng.normal(size=(L, B, D_m)).astype(np.float32)
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(torch.from_numpy(U), None, torch.from_numpy(umask))
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(U), None, jnp.asarray(umask), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_lstm_model_full_parity():
    """LSTMModel incl. the reference's softmax-over-dim-0 Attention quirk."""
    import gan_ffn_tpu.models as M
    from torch_mapping import lstm_params

    D_m, D_e, D_h, C = 100, 100, 100, 6
    ref = refmodel.LSTMModel(D_m, D_e, D_h, n_classes=C, dropout=0.5).eval()
    ours = M.LSTMModel(D_m=D_m, D_e=D_e, D_h=D_h, n_classes=C, dropout=0.5)
    params = {
        "lstm_1": lstm_params(ref.lstm_1),
        "lstm_2": lstm_params(ref.lstm_2),
        "lstm_3": lstm_params(ref.lstm_3),
        "attention": {
            "w_k": linear_params(ref.attention.w_k),
            "w_q": linear_params(ref.attention.w_q),
            "proj": linear_params(ref.attention.proj),
        },
        "smax_fc": linear_params(ref.smax_fc),
    }
    rng = np.random.default_rng(8)
    t = rng.normal(size=(L, B, D_m)).astype(np.float32)
    a = rng.normal(size=(L, B, D_m)).astype(np.float32)
    v = rng.normal(size=(L, B, 512)).astype(np.float32)
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(
            torch.from_numpy(t), torch.from_numpy(a), torch.from_numpy(v),
            None, torch.from_numpy(umask),
        )
    got, *_ = ours.apply(
        {"params": params},
        jnp.asarray(t), jnp.asarray(a), jnp.asarray(v), None, jnp.asarray(umask),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("score_function", ["dot_product", "scaled_dot_product", "mlp", "bi_linear"])
def test_attention_all_score_functions_parity(score_function):
    """The quirky multi-head Attention (model.py:197-286) across all four
    score functions, incl. its softmax-over-dim-0 behavior."""
    from gan_ffn_tpu.nn import Attention

    E, H = 24, 4
    ref = refmodel.Attention(E, n_head=H, score_function=score_function, dropout=0.6).eval()
    ours = Attention(E, n_head=H, score_function=score_function, dropout=0.6)
    params = {
        "w_k": linear_params(ref.w_k),
        "w_q": linear_params(ref.w_q),
        "proj": linear_params(ref.proj),
    }
    if ref.weight is not None:
        params["weight"] = ref.weight.detach().numpy()
    rng = np.random.default_rng(9)
    k = rng.normal(size=(3, 7, E)).astype(np.float32)
    q = rng.normal(size=(3, 5, E)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(k), torch.from_numpy(q))
    got, _ = ours.apply(
        {"params": params}, jnp.asarray(k), jnp.asarray(q), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("att_type", ["dot", "general", "general2", "concat"])
def test_matching_attention_all_types_parity(att_type):
    """Standalone MatchingAttention (model.py:134-194) for all four score
    types, full-mask case (mask semantics under masking are covered by the
    BiModel transplant + numpy oracles)."""
    from gan_ffn_tpu.nn import MatchingAttention

    Lm, Bm, Dm, Dc, Da = 7, 3, 12, 12, 6
    ref = refmodel.MatchingAttention(Dm, Dc, alpha_dim=Da, att_type=att_type).eval()
    ours = MatchingAttention(Dm, Dc, alpha_dim=Da, att_type=att_type)
    params = {}
    if att_type in ("general", "general2"):
        params["transform"] = linear_params(ref.transform)
    elif att_type == "concat":
        params["transform"] = linear_params(ref.transform)
        params["vector_prod"] = linear_params(ref.vector_prod)
    rng = np.random.default_rng(10)
    M = rng.normal(size=(Lm, Bm, Dm)).astype(np.float32)
    x = rng.normal(size=(Bm, Dc)).astype(np.float32)
    mask = np.ones((Bm, Lm), dtype=np.float32)
    with torch.no_grad():
        expected, alpha_ref = ref(torch.from_numpy(M), torch.from_numpy(x), torch.from_numpy(mask))
    got, alpha = ours.apply(
        {"params": params}, jnp.asarray(M), jnp.asarray(x), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), alpha_ref.numpy().reshape(np.asarray(alpha).shape), rtol=2e-4, atol=2e-5)


def test_bimodel_active_listener_parity():
    """DialogueRNN with listener_state=True (the l_cell path,
    model.py:851-852, 902-918) against the reference."""
    import gan_ffn_tpu.models as M

    D_m, D_g, D_p, D_e, D_h, C = 12, 10, 8, 6, 7, 6
    ref = refmodel.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C, listener_state=True,
        context_attention="simple", dropout_rec=0.1, dropout=0.5,
    ).eval()
    ours = M.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C, listener_state=True,
        context_attention="simple", dropout_rec=0.1, dropout=0.5,
        deterministic=True,
    )
    params = {
        "dialog_rnn_f": _dialogue_rnn_params(ref.dialog_rnn_f, "simple"),
        "dialog_rnn_r": _dialogue_rnn_params(ref.dialog_rnn_r, "simple"),
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
    }
    rng = np.random.default_rng(11)
    U = rng.normal(size=(L, B, D_m)).astype(np.float32)
    qmask = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(
            torch.from_numpy(U), torch.from_numpy(qmask), torch.from_numpy(umask)
        )
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(U), jnp.asarray(qmask), jnp.asarray(umask)
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


def test_emoformer_full_parity():
    """Emoformer (model.py:589-688), default attention=False path: stacked
    quirky Attentions, shared LayerNorms, FullyConnection towers, LSTM."""
    import gan_ffn_tpu.models as M
    from torch_mapping import layernorm_params, lstm_params

    D_m, D_e, C = 100, 30, 6
    ref = refmodel.Emoformer(D_m, D_e, n_classes=C, dropout=0.5, attention=False).eval()
    ours = M.Emoformer(D_m=D_m, D_e=D_e, n_classes=C, dropout=0.5, attention=False)

    def attn_params(a):
        return {"w_k": linear_params(a.w_k), "w_q": linear_params(a.w_q),
                "proj": linear_params(a.proj)}

    def fc_params(fc):
        return {f"fc{i}": linear_params(getattr(fc, f"fc{i}")) for i in range(1, 6)}

    params = {
        **{f"attention_{i}": attn_params(getattr(ref, f"attention_{i}")) for i in range(1, 7)},
        "norm_1": layernorm_params(ref.norm_1),
        "norm_2": layernorm_params(ref.norm_2),
        "transform": linear_params(ref.transform),
        "transform3": linear_params(ref.transform3),
        "transform4": linear_params(ref.transform4),
        "fc1": fc_params(ref.fc1),
        "fc2": fc_params(ref.fc2),
        "fc3": fc_params(ref.fc3),
        "lstm": lstm_params(ref.lstm),
        "smax_fc": linear_params(ref.smax_fc),
    }
    rng = np.random.default_rng(12)
    t = rng.normal(size=(L, B, D_m)).astype(np.float32)
    a = rng.normal(size=(L, B, D_m)).astype(np.float32)
    v = rng.normal(size=(L, B, 512)).astype(np.float32)
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(
            torch.from_numpy(t), torch.from_numpy(a), torch.from_numpy(v),
            None, torch.from_numpy(umask),
        )
    got, *_ = ours.apply(
        {"params": params},
        jnp.asarray(t), jnp.asarray(a), jnp.asarray(v), None, jnp.asarray(umask),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=5e-3, atol=5e-4)


def test_cnn_reference_is_unrunnable():
    """The reference CNN (model.py:301-354) crashes on its own final line:
    ``F.log_softmax(self.fc(cat), 2)`` on a 2-D (batch, classes) tensor is an
    out-of-range dim — like TextCNN, it is dead code that cannot execute.
    Our ``models.baselines.CNN`` implements the evident intent (softmax over
    the class axis) and is covered by its own smoke test."""
    ref = refmodel.CNN(100, 16, [2, 3, 4], 6, dropout=0.2).eval()
    t = torch.from_numpy(
        np.random.default_rng(13).normal(size=(L, B, 100)).astype(np.float32)
    )
    import contextlib, io

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(IndexError):
            ref(t, None, None)


def test_e2e_lstm_model_full_parity():
    """Token-level pipeline (model.py:691-825): CNN feature extractor + LSTM."""
    import gan_ffn_tpu.models as M
    from torch_mapping import lstm_params

    V, EMB, OUT, FILT, C = 40, 16, 12, 8, 6
    ref = refmodel.E2ELSTMModel(
        D_e=10, D_h=14, vocab_size=V, embedding_dim=EMB, cnn_output_size=OUT,
        cnn_filters=FILT, cnn_kernel_sizes=(3, 4, 5), cnn_dropout=0.5,
        n_classes=C, dropout=0.5, attention=True,
    ).eval()
    ours = M.E2ELSTMModel(
        D_e=10, D_h=14, vocab_size=V, embedding_dim=EMB, cnn_output_size=OUT,
        cnn_filters=FILT, cnn_kernel_sizes=(3, 4, 5), cnn_dropout=0.5,
        n_classes=C, dropout=0.5, attention=True,
    )
    fe = ref.cnn_feat_extractor
    fe_params = {
        "embedding": {"embedding": fe.embedding.weight.detach().numpy()},
        "fc": linear_params(fe.fc),
    }
    for K, conv in zip((3, 4, 5), fe.convs):
        # torch Conv1d weight (F, E, K) -> flax kernel (K, E, F)
        fe_params[f"conv_{K}"] = {
            "kernel": conv.weight.detach().numpy().transpose(2, 1, 0),
            "bias": conv.bias.detach().numpy(),
        }
    params = {
        "cnn_feat_extractor": fe_params,
        "lstm": lstm_params(ref.lstm),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
    }
    rng = np.random.default_rng(14)
    tokens = rng.integers(1, V, size=(L, B, 9)).astype(np.int64)
    umask = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        expected, *_ = ref(torch.from_numpy(tokens), None, torch.from_numpy(umask))
    got, *_ = ours.apply(
        {"params": params}, jnp.asarray(tokens), None, jnp.asarray(umask),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


def test_import_reference_checkpoints(tmp_path):
    """Round-trip: save reference torch modules as .pth (the reference's own
    checkpoint format), convert via cli.import_reference, verify the imported
    params reproduce the torch outputs."""
    import os
    import sys

    src_dir = tmp_path / "GAN_save"
    os.makedirs(src_dir)
    # torch pickles classes by module path; the reference module was loaded
    # via importlib under the name "refmodel" — register it so save/load work
    sys.modules["refmodel"] = refmodel
    nets = {
        "acoustic_gen": refmodel.AcousticGenerator(100, 0.2),
        "visual_disc": refmodel.VisualDiscriminator(100, 0.2),
    }
    for name, net in nets.items():
        torch.save(net, src_dir / f"{name}.pth")

    from gan_ffn_tpu.utils.torch_import import import_gan_save

    written = import_gan_save(str(src_dir), str(tmp_path / "out"), reference_path="/root/reference")
    assert set(written) == {"acoustic_gen", "visual_disc"}

    from flax import serialization

    import gan_ffn_tpu.models as M

    x = np.random.default_rng(20).normal(size=(L, B, 100)).astype(np.float32)
    ours = M.AcousticGenerator(100)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    with open(written["acoustic_gen"], "rb") as f:
        params = serialization.from_bytes(template, f.read())
    with torch.no_grad():
        expected = nets["acoustic_gen"].eval()(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


def test_emoformer_attention_path_is_unrunnable():
    """Emoformer's attention=True branch (model.py:669-681) adds a 2048-d
    matching output to the 100-d raw text features — a shape mismatch that
    crashes the reference for any D_m != 2048. Dead code, like TextCNN and
    CNN's final log_softmax; our Emoformer replicates the same math (and
    would fail identically), with the working attention=False default
    pinned by test_emoformer_full_parity."""
    ref = refmodel.Emoformer(100, 30, n_classes=6, dropout=0.5, attention=True).eval()
    rng = np.random.default_rng(21)
    t = torch.from_numpy(rng.normal(size=(6, 2, 100)).astype(np.float32))
    a = torch.from_numpy(rng.normal(size=(6, 2, 100)).astype(np.float32))
    v = torch.from_numpy(rng.normal(size=(6, 2, 512)).astype(np.float32))
    um = torch.ones(2, 6)
    with torch.no_grad(), pytest.raises(RuntimeError):
        ref(t, a, v, None, um)


# ---------------------------------------------------------------------------
# Gradient parity: transplanted TRAINING steps vs torch autograd.
#
# The round-1 transplant tests above pin the forward pass only; these pin the
# backward pass of each step kind (train_disc / train_gen / classifier /
# BiModel), so a subtle VJP bug in the scan, attention, or loss plumbing
# cannot hide behind a correct forward. Modules run deterministically (torch
# .eval() forward + our deterministic=True) so autograd is compared exactly;
# dropout's backward is a mask multiply and is covered separately
# (test_pallas_ops).
# ---------------------------------------------------------------------------

GRAD_RTOL, GRAD_ATOL = 2e-3, 1e-4


@pytest.mark.slow
def test_train_disc_gradient_parity():
    """Discriminator grads of one train_disc step (train_IEMOCAP.py:200-227)
    match torch autograd: BCE(real,1) + BCE(G(other).detach(), 0) halved,
    generator detached."""
    import gan_ffn_tpu.models as M
    from gan_ffn_tpu.nn.losses import bce_loss

    disc_ref = refmodel.AcousticDiscriminator(D_h=100, dropout=0.2).eval()
    gen_ref = refmodel.TextGenerator(D_h=100, dropout=0.2).eval()
    rng = np.random.default_rng(30)
    real_d = rng.normal(size=(L, B, 100)).astype(np.float32)
    real_g = rng.normal(size=(L, B, 100)).astype(np.float32)

    bce = torch.nn.BCELoss()
    real_prob = disc_ref(torch.from_numpy(real_d))
    fusion = gen_ref(torch.from_numpy(real_g))
    fake_prob = disc_ref(fusion.detach())
    d_loss = (
        bce(real_prob, torch.ones(L, B, 1)) + bce(fake_prob, torch.zeros(L, B, 1))
    ) / 2.0
    d_loss.backward()
    want = _discriminator_params(disc_ref, get=t2grad)

    disc_ours = M.AcousticDiscriminator(D_h=100)
    gen_ours = M.TextGenerator(D_h=100)
    gen_params = _generator_params(gen_ref)

    def loss_fn(dp):
        rp = disc_ours.apply({"params": dp}, jnp.asarray(real_d), deterministic=True)
        fus = gen_ours.apply(
            {"params": gen_params}, jnp.asarray(real_g), deterministic=True
        )
        fp = disc_ours.apply(
            {"params": dp}, jax.lax.stop_gradient(fus), deterministic=True
        )
        return (
            bce_loss(rp, jnp.ones_like(rp)) + bce_loss(fp, jnp.zeros_like(fp))
        ) / 2.0

    loss, grads = jax.value_and_grad(loss_fn)(_discriminator_params(disc_ref))
    assert float(loss) == pytest.approx(float(d_loss.detach()), rel=1e-4)
    assert_tree_allclose(grads, want, rtol=GRAD_RTOL, atol=GRAD_ATOL)


def test_train_gen_gradient_parity():
    """Generator grads of one train_gen step (train_IEMOCAP.py:230-252) match
    torch autograd: BCE(D(G(real)), 1) with the discriminator frozen — the
    backward flows THROUGH the 8-layer discriminator into the generator."""
    import gan_ffn_tpu.models as M
    from gan_ffn_tpu.nn.losses import bce_loss

    gen_ref = refmodel.AcousticGenerator(D_h=100, dropout=0.2).eval()
    disc_ref = refmodel.TextDiscriminator(D_h=100, dropout=0.2).eval()
    rng = np.random.default_rng(31)
    real_g = rng.normal(size=(L, B, 100)).astype(np.float32)

    bce = torch.nn.BCELoss()
    prob = disc_ref(gen_ref(torch.from_numpy(real_g)))
    g_loss = bce(prob, torch.ones(L, B, 1))
    g_loss.backward()
    want = _generator_params(gen_ref, get=t2grad)

    gen_ours = M.AcousticGenerator(D_h=100)
    disc_ours = M.TextDiscriminator(D_h=100)
    d_params = _discriminator_params(disc_ref)

    def loss_fn(gp):
        fus = gen_ours.apply({"params": gp}, jnp.asarray(real_g), deterministic=True)
        p = disc_ours.apply({"params": d_params}, fus, deterministic=True)
        return bce_loss(p, jnp.ones_like(p))

    loss, grads = jax.value_and_grad(loss_fn)(_generator_params(gen_ref))
    assert float(loss) == pytest.approx(float(g_loss.detach()), rel=1e-4)
    assert_tree_allclose(grads, want, rtol=GRAD_RTOL, atol=GRAD_ATOL)


@pytest.mark.slow
def test_classifier_step_gradient_parity():
    """GAN_FFN classifier grads (stage B, train_IEMOCAP.py:151-165) match
    torch autograd through all three generators + fusion head, with the
    weighted MaskedNLLLoss and a variable-length mask."""
    import gan_ffn_tpu.models as M
    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS
    from gan_ffn_tpu.nn.losses import masked_nll_loss

    a_g = refmodel.AcousticGenerator(100, 0.2)
    v_g = refmodel.VisualGenerator(100, 0.2)
    t_g = refmodel.TextGenerator(100, 0.2)
    ref = refmodel.GAN_FFN(a_g, v_g, t_g, n_classes=6, dropout=0.6).eval()

    rng = np.random.default_rng(32)
    a = rng.normal(size=(L, B, 100)).astype(np.float32)
    v = rng.normal(size=(L, B, 512)).astype(np.float32)
    t = rng.normal(size=(L, B, 100)).astype(np.float32)
    label = rng.integers(0, 6, size=(B, L))
    umask = np.zeros((B, L), dtype=np.float32)
    for b, n in enumerate([L, L - 3, 6]):
        umask[b, :n] = 1.0

    weights = torch.tensor(IEMOCAP_LOSS_WEIGHTS)
    loss_function = refmodel.MaskedNLLLoss(weights)
    log_prob, *_ = ref(torch.from_numpy(a), torch.from_numpy(v), torch.from_numpy(t))
    lp_ = log_prob.transpose(0, 1).contiguous().view(-1, 6)
    loss_t = loss_function(
        lp_, torch.from_numpy(label).view(-1), torch.from_numpy(umask)
    )
    loss_t.backward()
    want = {
        "acoustic_generator": _generator_params(a_g, get=t2grad),
        "visual_generator": _generator_params(v_g, get=t2grad),
        "text_generator": _generator_params(t_g, get=t2grad),
        "fc": linear_params(ref.fc, get=t2grad),
    }

    ours = M.GAN_FFN(n_classes=6)
    params = {
        "acoustic_generator": _generator_params(a_g),
        "visual_generator": _generator_params(v_g),
        "text_generator": _generator_params(t_g),
        "fc": linear_params(ref.fc),
    }

    def loss_fn(p):
        lp, *_ = ours.apply(
            {"params": p}, jnp.asarray(a), jnp.asarray(v), jnp.asarray(t),
            deterministic=True,
        )
        flat = lp.transpose(1, 0, 2).reshape(-1, 6)
        return masked_nll_loss(
            flat, jnp.asarray(label).reshape(-1), jnp.asarray(umask),
            jnp.asarray(IEMOCAP_LOSS_WEIGHTS),
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert float(loss) == pytest.approx(float(loss_t.detach()), rel=1e-4)
    assert_tree_allclose(grads, want, rtol=GRAD_RTOL, atol=GRAD_ATOL)


@pytest.mark.slow
def test_bimodel_gradient_parity():
    """BiModel (DialogueRNN fwd + rev scans + att2) grads match torch
    autograd under a variable-length masked NLL — the definitive check that
    the lax.scan history-attention backward is the same function as the
    reference's Python-loop backward (the round-1 open question about the
    DialogueRNN entry 'barely learning')."""
    import gan_ffn_tpu.models as M

    D_m, D_g, D_p, D_e, D_h, C = 12, 10, 8, 6, 7, 6
    ref = refmodel.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C,
        context_attention="general", dropout_rec=0.1, dropout=0.5,
    ).eval()
    ours = M.BiModel(
        D_m, D_g, D_p, D_e, D_h, n_classes=C,
        context_attention="general", dropout_rec=0.1, dropout=0.5,
        deterministic=True,
    )
    params = {
        "dialog_rnn_f": _dialogue_rnn_params(ref.dialog_rnn_f, "general"),
        "dialog_rnn_r": _dialogue_rnn_params(ref.dialog_rnn_r, "general"),
        "linear": linear_params(ref.linear),
        "smax_fc": linear_params(ref.smax_fc),
        "matchatt": {"transform": linear_params(ref.matchatt.transform)},
    }
    rng = np.random.default_rng(33)
    U = rng.normal(size=(L, B, D_m)).astype(np.float32)
    qmask = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
    lengths = [L, L - 4, 5]
    umask = np.zeros((B, L), dtype=np.float32)
    label = rng.integers(0, C, size=(B, L))
    for b, n in enumerate(lengths):
        umask[b, :n] = 1.0
        U[n:, b] = 0.0
        qmask[n:, b] = 0.0

    loss_function = refmodel.MaskedNLLLoss()
    log_prob, *_ = ref(
        torch.from_numpy(U), torch.from_numpy(qmask), torch.from_numpy(umask)
    )
    lp_ = log_prob.transpose(0, 1).contiguous().view(-1, C)
    loss_t = loss_function(
        lp_, torch.from_numpy(label).view(-1), torch.from_numpy(umask)
    )
    loss_t.backward()
    want = {
        "dialog_rnn_f": _dialogue_rnn_params(ref.dialog_rnn_f, "general", get=t2grad),
        "dialog_rnn_r": _dialogue_rnn_params(ref.dialog_rnn_r, "general", get=t2grad),
        "linear": linear_params(ref.linear, get=t2grad),
        "smax_fc": linear_params(ref.smax_fc, get=t2grad),
        "matchatt": {"transform": linear_params(ref.matchatt.transform, get=t2grad)},
    }

    from gan_ffn_tpu.nn.losses import masked_nll_loss

    def loss_fn(p):
        lp, *_ = ours.apply(
            {"params": p}, jnp.asarray(U), jnp.asarray(qmask), jnp.asarray(umask)
        )
        flat = lp.transpose(1, 0, 2).reshape(-1, C)
        return masked_nll_loss(flat, jnp.asarray(label).reshape(-1), jnp.asarray(umask))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert float(loss) == pytest.approx(float(loss_t.detach()), rel=1e-4)
    assert_tree_allclose(grads, want, rtol=GRAD_RTOL, atol=GRAD_ATOL)


def test_textcnn_reference_is_unrunnable():
    """The reference TextCNN (model.py:357-390) reads self.config in
    __init__ before any assignment — it cannot even be constructed. (Its
    forward additionally lacks the channel axis Conv2d needs.) Our
    models.TextCNN is the repaired, runnable realization — parity for the
    repaired semantics is pinned in test_baselines.py."""

    class Cfg:
        sentence_max_size = 14
        label_num = 6

    with pytest.raises(AttributeError):
        refmodel.TextCNN(Cfg())


def test_textcnn_repaired_parity():
    """Our TextCNN == a minimally-repaired torch TextCNN (the reference's
    code with `self.config = config` added and the missing channel axis
    inserted), weights transplanted."""
    import torch.nn.functional as F
    from torch import nn as tnn

    import gan_ffn_tpu.models as M

    class RepairedTextCNN(tnn.Module):
        def __init__(self, sentence_max_size, label_num):
            super().__init__()
            self.conv3 = tnn.Conv2d(1, 1, (3, 100))
            self.conv4 = tnn.Conv2d(1, 1, (4, 100))
            self.conv5 = tnn.Conv2d(1, 1, (5, 100))
            self.Max3_pool = tnn.MaxPool2d((sentence_max_size - 3 + 1, 1))
            self.Max4_pool = tnn.MaxPool2d((sentence_max_size - 4 + 1, 1))
            self.Max5_pool = tnn.MaxPool2d((sentence_max_size - 5 + 1, 1))
            self.linear1 = tnn.Linear(3, label_num)
            self.label_num = label_num

        def forward(self, x):
            batch = x.shape[1]
            x = x.permute(1, 0, 2).unsqueeze(1)  # repair: channel axis
            x1 = self.Max3_pool(F.relu(self.conv3(x)))
            x2 = self.Max4_pool(F.relu(self.conv4(x)))
            x3 = self.Max5_pool(F.relu(self.conv5(x)))
            x = torch.cat((x1, x2, x3), -1).view(batch, 1, -1)
            return self.linear1(x).view(-1, self.label_num)

    ref = RepairedTextCNN(L, 6).eval()
    ours = M.TextCNN(sentence_max_size=L, label_num=6)

    def conv_params(c):
        # torch (out=1, in=1, k, E) -> flax (k, E, in=1, out=1)
        return {
            "kernel": t2n(c.weight).transpose(2, 3, 1, 0),
            "bias": t2n(c.bias),
        }

    params = {
        "conv3": conv_params(ref.conv3),
        "conv4": conv_params(ref.conv4),
        "conv5": conv_params(ref.conv5),
        "linear1": linear_params(ref.linear1),
    }
    x = np.random.default_rng(40).normal(size=(L, B, 100)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("att2", [False, True])
def test_bie2e_model_full_parity(att2):
    """BiE2EModel (model.py:1065-1175): shared turn GRU over three token
    turns + bidirectional DialogueRNN on the 3-utterance dialogue. Unused by
    the reference's entry points but part of its model surface — this closes
    the last network without a weight-transplant test."""
    import types

    import gan_ffn_tpu.models as M
    from torch_mapping import lstm_params

    V, D_emb, D_m, D_g, D_p, D_e, D_h, C = 50, 16, 12, 10, 8, 6, 7, 7
    word_emb = torch.from_numpy(
        np.random.default_rng(50).normal(size=(V, D_emb)).astype(np.float32)
    )
    ref = refmodel.BiE2EModel(
        D_emb, D_m, D_g, D_p, D_e, D_h, word_emb, n_classes=C,
        context_attention="simple", dropout_rec=0.1, dropout=0.5,
    ).eval()
    ours = M.BiE2EModel(
        D_emb=D_emb, D_m=D_m, D_g=D_g, D_p=D_p, D_e=D_e, D_h=D_h,
        vocab_size=V, n_classes=C, context_attention="simple",
        dropout_rec=0.1, dropout=0.5, att2=att2, deterministic=True,
    )
    params = {
        "embedding": {"embedding": t2n(ref.embedding.weight)},
        "turn_rnn": lstm_params(ref.turn_rnn),  # same naming scheme for nn.GRU
        "dialog_rnn_f": _dialogue_rnn_params(ref.dialog_rnn_f, "simple"),
        "dialog_rnn_r": _dialogue_rnn_params(ref.dialog_rnn_r, "simple"),
        "linear1": linear_params(ref.linear1),
        "smax_fc": linear_params(ref.smax_fc),
    }
    if att2:
        params["matchatt"] = {"transform": linear_params(ref.matchatt.transform)}

    rng = np.random.default_rng(51)
    turns = [rng.integers(1, V, size=(9, B)).astype(np.int64) for _ in range(3)]
    data = types.SimpleNamespace(
        turn1=torch.from_numpy(turns[0]),
        turn2=torch.from_numpy(turns[1]),
        turn3=torch.from_numpy(turns[2]),
    )
    with torch.no_grad():
        expected = ref(data, att2=att2).numpy()
    got = ours.apply(
        {"params": params},
        jnp.asarray(turns[0]), jnp.asarray(turns[1]), jnp.asarray(turns[2]),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


def test_matching_fn_full_parity():
    """The standalone Matching fn (model.py:289-298) against the reference,
    general2 attention, variable-length mask. (The reference only reaches it
    through Emoformer's dead attention=True branch, so it has no transplant
    coverage via a model test.)"""
    import gan_ffn_tpu.nn.attention as A

    D, Lm = 12, 6
    ref_att = refmodel.MatchingAttention(D, D, att_type="general2").eval()
    ours_att = A.MatchingAttention(D, D, att_type="general2")
    params = {"transform": linear_params(ref_att.transform)}
    rng = np.random.default_rng(60)
    emotions = rng.normal(size=(Lm, B, D)).astype(np.float32)
    modal = rng.normal(size=(Lm, B, D)).astype(np.float32)
    umask = np.ones((B, Lm), dtype=np.float32)
    umask[1, 4:] = 0.0
    with torch.no_grad():
        expected, _ = refmodel.Matching(
            ref_att,
            torch.from_numpy(emotions),
            torch.from_numpy(modal),
            torch.from_numpy(umask),
        )
    got, _ = A.matching(
        lambda M, x, m: ours_att.apply({"params": params}, M, x, m),
        jnp.asarray(emotions),
        jnp.asarray(modal),
        jnp.asarray(umask),
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-3, atol=2e-4)


def test_fully_connection_full_parity():
    """FullyConnection (model.py:565-586): 5-layer GELU MLP transplant."""
    import gan_ffn_tpu.models as M

    ref = refmodel.FullyConnection().eval()
    ours = M.FullyConnection()
    params = {f"fc{i}": linear_params(getattr(ref, f"fc{i}")) for i in range(1, 6)}
    x = np.random.default_rng(61).normal(size=(B, 100)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-4)


def test_unmasked_weighted_nll_loss_parity():
    """UnMaskedWeightedNLLLoss (model.py:99-114), weighted and unweighted."""
    from gan_ffn_tpu.nn.losses import unmasked_weighted_nll_loss

    rng = np.random.default_rng(62)
    N, C = 40, 6
    logits = rng.normal(size=(N, C)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    target = rng.integers(0, C, size=N).astype(np.int64)
    weight = rng.uniform(0.3, 1.5, size=C).astype(np.float32)

    ref_unw = refmodel.UnMaskedWeightedNLLLoss()
    ref_w = refmodel.UnMaskedWeightedNLLLoss(torch.from_numpy(weight))
    with torch.no_grad():
        exp_unw = ref_unw(torch.from_numpy(log_probs), torch.from_numpy(target))
        exp_w = ref_w(torch.from_numpy(log_probs), torch.from_numpy(target))
    got_unw = unmasked_weighted_nll_loss(jnp.asarray(log_probs), jnp.asarray(target))
    got_w = unmasked_weighted_nll_loss(
        jnp.asarray(log_probs), jnp.asarray(target), jnp.asarray(weight)
    )
    np.testing.assert_allclose(float(got_unw), float(exp_unw), rtol=1e-5)
    np.testing.assert_allclose(float(got_w), float(exp_w), rtol=1e-5)
