"""DfDP training/inference steps (jitted, sharding-ready).

Parity source: /root/reference/2_dfdp_net.py:133-185 (train loop body) and
dfdp/basenet.py. The reference renders DP inputs item-by-item in Python and
steps torch AMP; here render + forward + backward + optimizer fuse per batch,
and the optax chain reproduces clip_grad_norm(1.0) + AdamW + per-step cosine.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .basenet import Basenet, compute_loss, linear_depth


class DfDPState(train_state.TrainState):
    batch_stats: Any = None


def create_dfdp_state(key, lr: float, total_steps: int, input_shape,
                      train_mode: str = "dfdp"):
    """Basenet + AdamW + cosine(T_max=total_steps) + grad-clip 1.0
    (reference 2_dfdp_net.py:118-120, :182)."""
    from ..psfnet.train import cosine_annealing

    model = Basenet(train_mode=train_mode)
    variables = model.init(key, jnp.zeros(input_shape, jnp.float32), train=False)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(cosine_annealing(lr, max(total_steps, 1))),
    )
    return DfDPState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {})), model


@partial(jax.jit, static_argnames=("train_mode",), donate_argnums=(0,))
def dfdp_train_step(state: DfDPState, stack_rgb, gt_depth, gt_aif=None,
                    train_mode: str = "dfdp"):
    """One optimization step on a rendered DP batch.

    stack_rgb: [B, 6, H, W]; gt_depth: [B, 1, H, W] meters.
    """
    gt_log, mask = linear_depth(gt_depth)

    def loss_fn(params):
        results, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            stack_rgb, train=True, mutable=["batch_stats"])
        losses = compute_loss(results, gt_log, mask, gt_aif, train_mode)
        return losses["total"], (losses, updates)

    (_, (losses, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=updates["batch_stats"])
    return state, losses


@partial(jax.jit, static_argnames=("train_mode",))
def dfdp_infer(params, batch_stats, stack_rgb, train_mode: str = "dfdp"):
    """Depth inference in meters (reference basenet.py:70-86). In 'deblur'
    mode additionally returns the refined depth (meters) and the deblurred
    all-in-focus image (reference inference() deblur branch)."""
    model = Basenet(train_mode=train_mode)
    results = model.apply({"params": params, "batch_stats": batch_stats},
                          stack_rgb, train=False)
    depth = jnp.exp(results["pred_depth_est"].astype(jnp.float32))
    if train_mode == "deblur":
        depth_fix = jnp.exp(results["pred_depth_fix"].astype(jnp.float32))
        return depth, depth_fix, results["pred_aif"]
    return depth
