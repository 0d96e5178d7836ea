"""Helpers mapping torch module state into gan_ffn_tpu Flax params.

Used only by tests: we instantiate torch's public modules
(nn.Linear/MultiheadAttention/TransformerEncoder/LSTM/GRUCell) as golden
oracles, copy their weights into our Flax modules, and assert numerical
parity. Torch stores Linear weights (out, in); our kernels are (in, out).

Every helper takes an optional ``get`` extractor so the SAME layout mapping
can pull either the parameter values (default) or their gradients
(``get=t2grad``) — the latter backs the gradient-parity tests that compare a
transplanted training step's backward pass against torch autograd.
"""

import numpy as np


def t2n(t):
    return t.detach().cpu().numpy()


def t2grad(t):
    assert t.grad is not None, "torch parameter has no gradient"
    return t.grad.detach().cpu().numpy()


def linear_params(torch_linear, get=t2n):
    p = {"kernel": get(torch_linear.weight).T}
    if torch_linear.bias is not None:
        p["bias"] = get(torch_linear.bias)
    return p


def mha_params(torch_mha, get=t2n):
    return {
        "in_proj_kernel": get(torch_mha.in_proj_weight).T,
        "in_proj_bias": get(torch_mha.in_proj_bias),
        "out_proj": linear_params(torch_mha.out_proj, get),
    }


def layernorm_params(torch_ln, get=t2n):
    return {"scale": get(torch_ln.weight), "bias": get(torch_ln.bias)}


def encoder_layer_params(torch_layer, get=t2n):
    return {
        "self_attn": mha_params(torch_layer.self_attn, get),
        "linear1": linear_params(torch_layer.linear1, get),
        "linear2": linear_params(torch_layer.linear2, get),
        "norm1": layernorm_params(torch_layer.norm1, get),
        "norm2": layernorm_params(torch_layer.norm2, get),
    }


def encoder_params(torch_encoder, get=t2n):
    return {
        f"layers_{i}": encoder_layer_params(layer, get)
        for i, layer in enumerate(torch_encoder.layers)
    }


def lstm_params(torch_lstm, get=t2n):
    p = {}
    for name, tensor in torch_lstm.named_parameters():
        # torch names: weight_ih_l{k}[_reverse] (4H, in) etc.
        arr = get(tensor)
        if name.startswith("weight"):
            ours = name.replace("weight_", "w_")
            p[ours] = arr.T
        else:
            ours = name.replace("bias_", "b_")
            p[ours] = arr
    return p


def gru_cell_params(torch_cell, get=t2n):
    return {
        "w_ih": get(torch_cell.weight_ih).T,
        "w_hh": get(torch_cell.weight_hh).T,
        "b_ih": get(torch_cell.bias_ih),
        "b_hh": get(torch_cell.bias_hh),
    }


def assert_tree_allclose(got_tree, want_tree, rtol=1e-3, atol=1e-5, path=""):
    """Recursively compare two nested dict trees of arrays with labeled paths."""
    assert set(got_tree) == set(want_tree), (
        f"{path}: key mismatch {sorted(got_tree)} vs {sorted(want_tree)}"
    )
    for k in got_tree:
        g, w = got_tree[k], want_tree[k]
        sub = f"{path}/{k}"
        if isinstance(g, dict):
            assert_tree_allclose(g, w, rtol, atol, sub)
        else:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
                err_msg=f"gradient mismatch at {sub}",
            )
