"""Leaf layers for the functional module system (NHWC everywhere).

Each layer is the TPU-native counterpart of a torch / Keras layer used by the
reference models (see SURVEY.md §2); parameter layouts are HWIO / (in, out) so
the MXU sees its preferred contraction dims, with importer shims handling the
OIHW → HWIO transposes.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from celebrity_image_denoiser_tpu import ops
from celebrity_image_denoiser_tpu.nn import initializers as init
from celebrity_image_denoiser_tpu.nn.module import Module

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


class Conv2d(Module):
    """params: kernel (kH, kW, C_in, C_out) [+ bias (C_out,)]."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntOr2,
        stride: IntOr2 = 1,
        padding: IntOr2 = 0,
        dilation: IntOr2 = 1,
        groups: int = 1,
        bias: bool = True,
        weight_init: str = "torch",
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, rng):
        kh, kw = self.kernel_size
        cin = self.in_channels // self.groups
        shape = (kh, kw, cin, self.out_channels)
        fan_in = cin * kh * kw
        k1, k2 = jax.random.split(rng)
        if self.weight_init == "keras":
            fan_out = self.out_channels * kh * kw
            kernel = init.glorot_uniform(k1, shape, fan_in, fan_out)
            bias = init.zeros((self.out_channels,))
        else:
            kernel = init.torch_uniform(k1, shape, fan_in)
            bias = init.torch_uniform(k2, (self.out_channels,), fan_in)
        params = {"kernel": kernel}
        if self.use_bias:
            params["bias"] = bias
        return params, {}

    def apply(self, params, state, x, *, train: bool = False):
        y = ops.conv2d(
            x,
            params["kernel"],
            params.get("bias"),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        return y, {}


class ConvTranspose2d(Module):
    """params: kernel (kH, kW, C_out, C_in) [+ bias (C_out,)].

    torch quirk preserved: init fan_in counts C_out * kH * kW (torch computes
    fan_in from weight dim 1, which is C_out for ConvTranspose2d).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntOr2,
        stride: IntOr2 = 1,
        padding: IntOr2 = 0,
        bias: bool = True,
        weight_init: str = "torch",
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, rng):
        kh, kw = self.kernel_size
        shape = (kh, kw, self.out_channels, self.in_channels)
        k1, k2 = jax.random.split(rng)
        if self.weight_init == "keras":
            # Keras Conv2DTranspose: fan_in = C_in*k*k, fan_out = C_out*k*k
            fan_in = self.in_channels * kh * kw
            fan_out = self.out_channels * kh * kw
            kernel = init.glorot_uniform(k1, shape, fan_in, fan_out)
            bias = init.zeros((self.out_channels,))
        else:
            fan_in = self.out_channels * kh * kw
            kernel = init.torch_uniform(k1, shape, fan_in)
            bias = init.torch_uniform(k2, (self.out_channels,), fan_in)
        params = {"kernel": kernel}
        if self.use_bias:
            params["bias"] = bias
        return params, {}

    def apply(self, params, state, x, *, train: bool = False):
        y = ops.conv2d_transpose(
            x,
            params["kernel"],
            params.get("bias"),
            stride=self.stride,
            padding=self.padding,
        )
        return y, {}


class Linear(Module):
    """params: kernel (in, out) [+ bias (out,)] — MXU-friendly (in, out)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 weight_init: str = "torch"):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        shape = (self.in_features, self.out_features)
        if self.weight_init == "keras":
            kernel = init.glorot_uniform(k1, shape, self.in_features, self.out_features)
            bias = init.zeros((self.out_features,))
        else:
            kernel = init.torch_uniform(k1, shape, self.in_features)
            bias = init.torch_uniform(k2, (self.out_features,), self.in_features)
        params = {"kernel": kernel}
        if self.use_bias:
            params["bias"] = bias
        return params, {}

    def apply(self, params, state, x, *, train: bool = False):
        y = jnp.dot(x, params["kernel"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y, {}


class BatchNorm2d(Module):
    """params: {scale, bias}; state: {mean, var}.  torch convention by
    default (eps 1e-5, momentum 0.1); pass keras=True for Keras BN
    (eps 1e-3, momentum 0.99, flipped momentum convention)."""

    def __init__(self, num_features: int, eps: Optional[float] = None,
                 momentum: Optional[float] = None, keras: bool = False):
        super().__init__()
        self.num_features = num_features
        self.keras = keras
        self.eps = eps if eps is not None else (1e-3 if keras else 1e-5)
        self.momentum = momentum if momentum is not None else (0.99 if keras else 0.1)

    def init(self, rng):
        c = self.num_features
        params = {"scale": init.ones((c,)), "bias": init.zeros((c,))}
        state = {"mean": init.zeros((c,)), "var": init.ones((c,))}
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        return ops.batch_norm(
            x, params, state, train=train, eps=self.eps,
            momentum=self.momentum, keras_momentum=self.keras,
        )


class PReLU(Module):
    """params: alpha; torch default: one shared scalar, init 0.25."""

    def __init__(self, num_parameters: int = 1, init_value: float = 0.25):
        super().__init__()
        self.num_parameters = num_parameters
        self.init_value = init_value

    def init(self, rng):
        return {"alpha": jnp.full((self.num_parameters,), self.init_value, jnp.float32)}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.prelu(x, params["alpha"]), {}


class ReLU(Module):
    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.relu(x), {}


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.01):
        super().__init__()
        self.negative_slope = negative_slope

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.leaky_relu(x, self.negative_slope), {}


class Tanh(Module):
    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.tanh(x), {}


class Sigmoid(Module):
    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.sigmoid(x), {}


class MaxPool2d(Module):
    def __init__(self, window: IntOr2 = 2, stride: IntOr2 = None):
        super().__init__()
        self.window = window
        self.stride = stride

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.max_pool2d(x, self.window, self.stride), {}


class PixelShuffle(Module):
    def __init__(self, upscale_factor: int):
        super().__init__()
        self.upscale_factor = upscale_factor

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.pixel_shuffle(x, self.upscale_factor), {}


class GlobalAvgPool(Module):
    """AdaptiveAvgPool2d(1) equivalent (keepdims)."""

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return ops.global_avg_pool(x, keepdims=True), {}


class Flatten(Module):
    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return jnp.reshape(x, (x.shape[0], -1)), {}


class Embedding(Module):
    """params: table (num_embeddings, dim); torch init N(0, 1)."""

    def __init__(self, num_embeddings: int, dim: int):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.dim = dim

    def init(self, rng):
        table = jax.random.normal(rng, (self.num_embeddings, self.dim), jnp.float32)
        return {"table": table}, {}

    def apply(self, params, state, idx, *, train: bool = False):
        return jnp.take(params["table"], idx, axis=0), {}
