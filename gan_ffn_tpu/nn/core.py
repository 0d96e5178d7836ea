"""Core building blocks with PyTorch-compatible initialization.

The reference relies on ``torch.nn.Linear``'s default init everywhere
(kaiming_uniform with a=sqrt(5), which reduces to U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both weight and bias). Training dynamics — especially the
delicate 12-duel GAN schedule — are sensitive to init scale, so the framework
reproduces those distributions.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu(x):
    """Exact (erf) GELU — torch's ``F.gelu`` default, unlike jax's tanh
    approximation default."""
    return jax.nn.gelu(x, approximate=False)


def hardswish(x):
    """torch ``F.hardswish``: x * relu6(x + 3) / 6."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape is (in_features, out_features)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for a (in, out) kernel."""
    fan_in, fan_out = shape[0], shape[-1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def uniform_bound_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """``nn.Linear``-equivalent Dense layer: y = x @ kernel + bias.

    Kernel is stored (in, out) — the transpose of torch's (out, in) — for
    row-major matmul efficiency; init distributions match torch defaults.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None  # computation dtype; params stay float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        """Apply the layer; with ``return_params`` create the (identical)
        params but return ``(kernel, bias)`` instead of computing — used by
        fused Pallas paths that consume the raw weights (ops/mlp.py). ``x``
        then only supplies ``in_features`` via its trailing dim."""
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        kernel = self.param("kernel", kernel_init, (in_features, self.features))
        dtype = self.dtype or x.dtype
        if self.use_bias:
            bias_init = self.bias_init or torch_linear_bias_init(in_features)
            bias = self.param("bias", bias_init, (self.features,))
        else:
            bias = None
        if return_params:
            return kernel, bias
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the last axis with torch's eps=1e-5 default.

    Statistics are always computed in float32 for numerical robustness under
    bf16 compute.
    """

    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        dtype = self.dtype or x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(dtype)
