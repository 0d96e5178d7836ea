"""Helpers mapping torch module state into gan_ffn_tpu Flax params.

Used only by tests: we instantiate torch's public modules
(nn.Linear/MultiheadAttention/TransformerEncoder/LSTM/GRUCell) as golden
oracles, copy their weights into our Flax modules, and assert numerical
parity. Torch stores Linear weights (out, in); our kernels are (in, out).
"""

import numpy as np


def t2n(t):
    return t.detach().cpu().numpy()


def linear_params(torch_linear):
    p = {"kernel": t2n(torch_linear.weight).T}
    if torch_linear.bias is not None:
        p["bias"] = t2n(torch_linear.bias)
    return p


def mha_params(torch_mha):
    return {
        "in_proj_kernel": t2n(torch_mha.in_proj_weight).T,
        "in_proj_bias": t2n(torch_mha.in_proj_bias),
        "out_proj": linear_params(torch_mha.out_proj),
    }


def layernorm_params(torch_ln):
    return {"scale": t2n(torch_ln.weight), "bias": t2n(torch_ln.bias)}


def encoder_layer_params(torch_layer):
    return {
        "self_attn": mha_params(torch_layer.self_attn),
        "linear1": linear_params(torch_layer.linear1),
        "linear2": linear_params(torch_layer.linear2),
        "norm1": layernorm_params(torch_layer.norm1),
        "norm2": layernorm_params(torch_layer.norm2),
    }


def encoder_params(torch_encoder):
    return {
        f"layers_{i}": encoder_layer_params(layer)
        for i, layer in enumerate(torch_encoder.layers)
    }


def lstm_params(torch_lstm):
    p = {}
    for name, tensor in torch_lstm.named_parameters():
        # torch names: weight_ih_l{k}[_reverse] (4H, in) etc.
        arr = t2n(tensor)
        if name.startswith("weight"):
            ours = name.replace("weight_", "w_")
            p[ours] = arr.T
        else:
            ours = name.replace("bias_", "b_")
            p[ours] = arr
    return p


def gru_cell_params(torch_cell):
    return {
        "w_ih": t2n(torch_cell.weight_ih).T,
        "w_hh": t2n(torch_cell.weight_hh).T,
        "b_ih": t2n(torch_cell.bias_ih),
        "b_hh": t2n(torch_cell.bias_hh),
    }
