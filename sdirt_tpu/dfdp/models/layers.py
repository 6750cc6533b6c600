"""Shared building blocks for the DfDP networks.

Parity source: /root/reference/dfdp/dddnet/dddnet.py:323-603. Internally
NHWC / NDHWC (TPU-native layout); the public model APIs accept NCHW to stay
drop-in compatible with the reference's dataset conventions.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal(fan_out, relu) used by YRStereonet_3D init (dddnet.py:115-120)
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def resize_linear_align_corners(x, out_sizes: Sequence[int], axes: Sequence[int]):
    """Separable linear interpolation with torch align_corners=True sampling
    (out[i] reads input at i*(n-1)/(out-1)); jax.image.resize only offers the
    half-pixel (align_corners=False) convention."""
    for ax, out in zip(axes, out_sizes):
        n = x.shape[ax]
        if out == n:
            continue
        pos = jnp.arange(out) * ((n - 1) / (out - 1) if out > 1 else 0.0)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        w = (pos - i0).astype(x.dtype)
        a = jnp.take(x, i0, axis=ax)
        b = jnp.take(x, i1, axis=ax)
        shape = [1] * x.ndim
        shape[ax] = out
        w = w.reshape(shape)
        x = a * (1 - w) + b * w
    return x


def resize_bilinear(x, out_hw, align_corners: bool):
    """[B, H, W, C] spatial resize."""
    if align_corners:
        return resize_linear_align_corners(x, out_hw, (1, 2))
    return jax.image.resize(x, (x.shape[0], *out_hw, x.shape[-1]), "linear")


class BasicConv(nn.Module):
    """Conv/deconv (+BN, +ReLU) matching reference BasicConv
    (dddnet.py:515-541). Works for 2D ([B,H,W,C]) and 3D ([B,D,H,W,C])."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    is_3d: bool = False
    deconv: bool = False
    bn: bool = True
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = 3 if self.is_3d else 2
        ks = (self.kernel_size,) * nd
        strides = (self.stride,) * nd
        if self.deconv:
            # torch k4/s2/p1 transposed conv == exact x2 upsampling; flax
            # 'SAME' transpose padding reproduces the output geometry
            x = nn.ConvTranspose(self.features, ks, strides=strides,
                                 padding="SAME", use_bias=False,
                                 kernel_init=kaiming_out)(x)
        else:
            pad = ((self.padding, self.padding),) * nd
            x = nn.Conv(self.features, ks, strides=strides, padding=pad,
                        kernel_dilation=(self.dilation,) * nd, use_bias=False,
                        kernel_init=kaiming_out)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvBN(nn.Module):
    """conv + BN without activation (reference convbn, dddnet.py:468-469)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = ((self.padding, self.padding),) * 2
        x = nn.Conv(self.features, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, padding=pad,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    kernel_init=kaiming_out)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(x)


class Conv2x(nn.Module):
    """Upsample-merge block (reference Conv2x, dddnet.py:570-602):
    trilinear x2 (align_corners=True) -> conv -> concat skip -> conv."""

    features: int
    is_3d: bool = True

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        if self.is_3d:
            out_sizes = tuple(s * 2 for s in x.shape[1:4])
            x = resize_linear_align_corners(x, out_sizes, (1, 2, 3))
        else:
            x = resize_bilinear(x, tuple(s * 2 for s in x.shape[1:3]), True)
        x = BasicConv(self.features, kernel_size=3, stride=1, padding=1,
                      is_3d=self.is_3d)(x, train)
        assert x.shape == rem.shape, (x.shape, rem.shape)
        x = jnp.concatenate([x, rem], axis=-1)
        x = BasicConv(self.features, kernel_size=3, stride=1, padding=1,
                      is_3d=self.is_3d)(x, train)
        return x


class ResBlock(nn.Module):
    """Dilated residual block (reference ResBlock, dddnet.py:471-513)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation
        out = nn.Conv(self.features, (3, 3), padding=((pad, pad),) * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Conv(self.features, (3, 3), padding=((pad, pad),) * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        return nn.leaky_relu(out + x, 0.2)


class CAMModule(nn.Module):
    """Channel attention (reference CAM_Module, dddnet.py:292-322)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        v = x.reshape(b, h * w, c)
        q = v.transpose(0, 2, 1)                      # [B, C, HW]
        energy = jnp.einsum("bcn,bnd->bcd", q, v)     # [B, C, C]
        energy_new = energy.max(-1, keepdims=True) - energy
        attention = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attention, v).reshape(b, h, w, c)
        return gamma * out + x


class ConvBlock(nn.Module):
    """Conv + activation (reference ConvBlock, dddnet.py:323-355)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    activation: str = "sigmoid"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding, self.padding),) * 2)(x)
        if self.activation == "sigmoid":
            return nn.sigmoid(x)
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "tanh":
            return nn.tanh(x)
        return x
