"""Basenet: DfDP task wrapper — input split, log-depth transform, losses.

Parity source: /root/reference/dfdp/basenet.py:9-104. Pure-functional: the
log-depth mask is returned alongside the transform instead of being stashed
on the module, and losses are plain functions over a params/batch pair.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .models.dddnet import Mydeblur, YRStereonet3D


def linear_depth(depth):
    """Masked log transform (reference basenet.py:92-96): depth>0 pixels go
    to log-depth, empty pixels stay 0. Returns (log_depth, mask)."""
    mask = depth > 1e-9
    out = jnp.where(mask, jnp.log(jnp.where(mask, depth, 1.0)), depth)
    return out, mask


def inverse_linear_depth(log_depth, mask=None):
    """exp transform back to meters (reference basenet.py:98-103)."""
    if mask is None:
        return jnp.exp(log_depth)
    return jnp.where(mask, jnp.exp(jnp.where(mask, log_depth, 0.0)), log_depth)


def smooth_l1(pred, target):
    """torch SmoothL1Loss (beta=1) elementwise."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


class Basenet(nn.Module):
    """DfDP wrapper holding the depth net (+ optional deblur head)."""

    train_mode: str = "dfdp"   # 'dfdp' | 'deblur'

    def setup(self):
        self.dfdp_net = YRStereonet3D()
        if self.train_mode == "deblur":
            self.deblur_net = Mydeblur()

    def __call__(self, stack_rgb, train: bool = False):
        """stack_rgb: [B, 6*V, H, W] — V focus views, each (left RGB ||
        right RGB), V inferred from the channel count at trace time. V=1 is
        the reference configuration; V>1 is the multi-focus extension
        (psfnet/stack.py FocalStackLens — the reference scaffolds n_stack
        but pins it to 1, 2_dfdp_net.py:164). All views' left channels feed
        the siamese feature tower as one 3V-channel image (and likewise
        right), so the DP cost volume correlates multi-focus features.
        Returns dict of predictions in LOG-depth space."""
        v = stack_rgb.shape[1] // 6
        assert stack_rgb.shape[1] == 6 * v, stack_rgb.shape
        if v == 1:
            left, right = stack_rgb[:, 0:3], stack_rgb[:, 3:]
        else:
            assert self.train_mode == "dfdp", \
                "deblur head expects a single-view stack"
            left = jnp.concatenate(
                [stack_rgb[:, 6 * i:6 * i + 3] for i in range(v)], axis=1)
            right = jnp.concatenate(
                [stack_rgb[:, 6 * i + 3:6 * i + 6] for i in range(v)], axis=1)
        depth_est = self.dfdp_net(left, right, train=train)
        out = {"pred_depth_est": depth_est}
        if self.train_mode == "deblur":
            depth_fix, aif_fix = self.deblur_net(left, right, depth_est)
            out["pred_depth_fix"] = depth_fix
            out["pred_aif"] = aif_fix
        return out


def compute_loss(results: dict, gt_log_depth, mask, gt_aif=None,
                 train_mode: str = "dfdp") -> dict:
    """Masked SmoothL1 on log-depth (+ deblur terms)
    (reference basenet.py:51-68)."""
    losses = {}
    m = mask.astype(gt_log_depth.dtype)
    denom = m.sum() + 1e-9

    def masked_sl1(pred):
        return (smooth_l1(pred, gt_log_depth) * m).sum() / denom

    losses["depth_est"] = masked_sl1(results["pred_depth_est"])
    losses["total"] = losses["depth_est"]
    if train_mode == "deblur":
        losses["depth_fix"] = masked_sl1(results["pred_depth_fix"])
        # SmoothL1 on the all-in-focus image (reference basenet.py:66-67
        # uses the same l1 = SmoothL1Loss for the aif term)
        losses["aif"] = smooth_l1(results["pred_aif"], gt_aif).mean()
        losses["total"] = losses["depth_est"] * 2 + losses["depth_fix"] + losses["aif"]
    return losses
