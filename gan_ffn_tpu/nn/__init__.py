from .attention import Attention, MatchingAttention, SimpleAttention, matching
from .core import TorchLinear, torch_linear_bias_init, torch_linear_kernel_init
from .losses import (
    bce_loss,
    focal_loss,
    masked_mse_loss,
    masked_nll_loss,
    unmasked_weighted_nll_loss,
)
from .positional import PositionalEncoding, sinusoidal_table
from .recurrent import GRU, GRUCell, LSTM, LSTMCell
from .transformer import (
    MultiheadSelfAttention,
    TransformerEncoder,
    TransformerEncoderLayer,
)

__all__ = [
    "Attention",
    "GRU",
    "GRUCell",
    "LSTM",
    "LSTMCell",
    "MatchingAttention",
    "MultiheadSelfAttention",
    "PositionalEncoding",
    "SimpleAttention",
    "TorchLinear",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "bce_loss",
    "focal_loss",
    "masked_mse_loss",
    "masked_nll_loss",
    "matching",
    "sinusoidal_table",
    "torch_linear_bias_init",
    "torch_linear_kernel_init",
    "unmasked_weighted_nll_loss",
]
