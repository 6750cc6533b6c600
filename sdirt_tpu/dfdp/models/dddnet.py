"""DDDNet: depth-from-dual-pixel stereo-cost-volume network (Flax).

Parity source: /root/reference/dfdp/dddnet/dddnet.py:103-568
(YRStereonet_3D) and :32-101 (Mydeblur). Siamese dilated-conv feature
extractor (stride 4, two-scale SPP) -> signed-shift DP cost volume
(maxdisp=20, both directions) -> 3D-conv matching U-net -> trilinear x4
upsample + softmin disparity regression over d in [-10, 10).

The network regresses LOG-depth directly (Basenet applies log/exp around it,
reference basenet.py:92-103); log(0.25..10 m) fits comfortably inside the
disparity range.

TPU notes: NDHWC layouts, the cost volume is built with static pad/slice
shifts (vs the reference's in-place index writes), and the interpolations are
explicit gathers for the align_corners=True cases.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (BasicConv, CAMModule, Conv2x, ConvBlock, ConvBN,
                     resize_bilinear, resize_linear_align_corners)


class Feature(nn.Module):
    """Siamese feature tower, stride 4, 32-ch output (dddnet.py:358-407)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(32, 3, 1, 1)(x, train)
        x = BasicConv(64, 3, 1, 1)(x, train)
        x = BasicConv(64, 3, 2, 1)(x, train)
        x = BasicConv(128, 3, 1, 4, dilation=4)(x, train)
        x = BasicConv(128, 3, 1, 8, dilation=8)(x, train)
        x = BasicConv(128, 3, 2, 1)(x, train)

        h, w = x.shape[1:3]

        def branch(pool):
            b = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
            b = nn.relu(ConvBN(32, 1, 1, 0)(b, train))
            return resize_bilinear(b, (h, w), align_corners=True)

        feat = jnp.concatenate([branch(32), branch(8), x], axis=-1)
        feat = BasicConv(96, 3, 1, 1)(feat, train)
        feat = BasicConv(32, 1, 1, 0, bn=False, relu=False)(feat, train)
        return feat


def dp_cost_volume(x, y, maxdisp: int = 20):
    """Signed-shift DP cost volume (reference dddnet.py:136-148).

    x, y: [B, H, W, C] left/right features. Returns [B, D, H, W, 2C]; shift
    gap = i - D/2 spans both signs (DP disparity is signed around focus).
    """
    b, h, w, c = x.shape
    vols = []
    for i in range(maxdisp):
        gap = i - maxdisp // 2
        zeros = jnp.zeros((b, h, w, 2 * c), x.dtype)
        if gap < 0:
            seg = jnp.concatenate([x[:, :, :gap], y[:, :, -gap:]], axis=-1)
            vol = zeros.at[:, :, :gap].set(seg)
        elif gap == 0:
            vol = jnp.concatenate([x, y], axis=-1)
        else:
            seg = jnp.concatenate([x[:, :, gap:], y[:, :, :-gap]], axis=-1)
            vol = zeros.at[:, :, gap:].set(seg)
        vols.append(vol)
    return jnp.stack(vols, axis=1)


class Matching(nn.Module):
    """3D-conv cost aggregation U-net (reference dddnet.py:409-446)."""

    @nn.compact
    def __call__(self, cost, train: bool = False):
        x = BasicConv(32, 3, 1, 1, is_3d=True)(cost, train)
        x = BasicConv(48, 3, 2, 1, is_3d=True)(x, train)
        x = BasicConv(64, 3, 1, 1, is_3d=True)(x, train)
        rem0 = x
        x = BasicConv(64, 3, 2, 1, is_3d=True)(x, train)
        x = BasicConv(64, 3, 1, 1, is_3d=True)(x, train)
        x = Conv2x(64, is_3d=True)(x, rem0, train)
        x = BasicConv(64, 4, 2, 1, is_3d=True, deconv=True)(x, train)
        x = BasicConv(1, 3, 1, 1, is_3d=True, bn=False, relu=False)(x, train)
        return x


class Disp(nn.Module):
    """Trilinear x4 upsample + softmin disparity regression
    (reference dddnet.py:543-568)."""

    maxdisp: int = 20

    @nn.compact
    def __call__(self, x):
        # x: [B, D', H', W', 1] -> resize to [B, maxdisp, 4H', 4W']
        b, d, h, w, _ = x.shape
        x = x[..., 0]
        x = jax.image.resize(x, (b, self.maxdisp, h * 4, w * 4), "trilinear")
        p = jax.nn.softmax(-x, axis=1)                      # Softmin over D
        disp = jnp.arange(-self.maxdisp // 2, self.maxdisp // 2,
                          dtype=x.dtype).reshape(1, -1, 1, 1)
        return jnp.sum(p * disp, axis=1, keepdims=True)     # [B, 1, H, W]


class YRStereonet3D(nn.Module):
    """The full DfDP depth network (reference dddnet.py:103-152)."""

    maxdisp: int = 20

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        """left/right: [B, 3, H, W] (NCHW, reference convention).
        Returns [B, 1, H, W] log-depth."""
        feature = Feature()
        xl = feature(left.transpose(0, 2, 3, 1), train)
        yr = feature(right.transpose(0, 2, 3, 1), train)
        cost = dp_cost_volume(xl, yr, self.maxdisp)
        cost = Matching()(cost, train)
        return Disp(self.maxdisp)(cost)


class Encoder(nn.Module):
    """Deblur encoder (reference dddnet.py:181-234): 3 conv stages with
    residual pairs, stride 4 total."""

    out_features: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding=1)(x)
        for _ in range(2):
            h = nn.Conv(32, (3, 3), padding=1)(nn.relu(nn.Conv(32, (3, 3), padding=1)(x)))
            x = h + x
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1)(x)
        for _ in range(2):
            h = nn.Conv(64, (3, 3), padding=1)(nn.relu(nn.Conv(64, (3, 3), padding=1)(x)))
            x = h + x
        x = nn.Conv(128, (3, 3), strides=(2, 2), padding=1)(x)
        h = nn.Conv(128, (3, 3), padding=1)(nn.relu(nn.Conv(128, (3, 3), padding=1)(x)))
        x = h + x
        h = nn.Conv(self.out_features, (3, 3), padding=1)(nn.relu(nn.Conv(128, (3, 3), padding=1)(x)))
        return h + x


class Decoder(nn.Module):
    """Deblur decoder (reference dddnet.py:236-289)."""

    out_features: int = 3

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            h = nn.Conv(128, (3, 3), padding=1)(nn.relu(nn.Conv(128, (3, 3), padding=1)(x)))
            x = h + x
        x = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME")(x)
        for _ in range(2):
            h = nn.Conv(64, (3, 3), padding=1)(nn.relu(nn.Conv(64, (3, 3), padding=1)(x)))
            x = h + x
        x = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME")(x)
        for _ in range(2):
            h = nn.Conv(32, (3, 3), padding=1)(nn.relu(nn.Conv(32, (3, 3), padding=1)(x)))
            x = h + x
        return nn.Conv(self.out_features, (3, 3), padding=1)(x)


class Mydeblur(nn.Module):
    """Multi-patch deblur + depth-refine net (reference dddnet.py:32-101):
    3-level image pyramid of split patches, shared encoders per level,
    channel-attention fusion. Returns (refined_log_depth, deblurred_aif)."""

    feat: int = 128

    @nn.compact
    def __call__(self, image_left, image_right, est_blurdisp):
        # NCHW in, NHWC internally
        to_nhwc = lambda t: t.transpose(0, 2, 3, 1)
        left, right, disp = map(to_nhwc, (image_left, image_right, est_blurdisp))
        img = jnp.concatenate([left, right, disp], axis=-1)   # [B, H, W, 7]
        h, w = img.shape[1:3]

        enc1 = Encoder(self.feat)
        enc2 = Encoder(self.feat)
        enc3 = Encoder(self.feat)
        dec3 = Decoder(7)
        dec2 = Decoder(7)
        dec1 = Decoder(3)
        decd = Decoder(1)

        lv2 = [img[:, : h // 2], img[:, h // 2:]]
        lv3 = [lv2[0][:, :, : w // 2], lv2[0][:, :, w // 2:],
               lv2[1][:, :, : w // 2], lv2[1][:, :, w // 2:]]

        f3 = [enc3(p) for p in lv3]
        f3_top = jnp.concatenate([f3[0], f3[1]], axis=2)
        f3_bot = jnp.concatenate([f3[2], f3[3]], axis=2)
        f3_merge = jnp.concatenate([f3_top, f3_bot], axis=1)
        r3_top = dec3(f3_top)
        r3_bot = dec3(f3_bot)
        r3_merge = jnp.concatenate([r3_top, r3_bot], axis=1)

        f2 = [enc2(lv2[0] + r3_top), enc2(lv2[1] + r3_bot)]
        f2_merge = jnp.concatenate(f2, axis=1) + f3_merge
        r2_merge = dec2(f2_merge)

        f1_merge = enc1(img + r2_merge) + f2_merge

        down = ConvBlock(self.feat, 8, 4, 2, activation="sigmoid")
        featf = down(jnp.concatenate([left - right, disp], axis=-1))
        feat = CAMModule()(featf)

        deblur = dec1(f1_merge + feat)
        est_mdisp = decd(f1_merge + feat)
        return (est_mdisp.transpose(0, 3, 1, 2),
                deblur.transpose(0, 3, 1, 2))
