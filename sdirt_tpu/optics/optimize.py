"""Differentiable lens-design utilities: parameter groups, perturbation,
shape correction, and an optax-based surface optimizer.

Parity source: /root/reference/deeplens/surfaces.py:837-943 (activate_grad /
get_optimizer_params / perturb) and optics.py:1615-1656 (correct_shape).
The reference builds per-parameter torch Adam groups via exec-generated
attributes; here the differentiable surface parameters are one pytree with a
per-leaf learning-rate scale, driven by any optax transform.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .surfaces import KIND_STOP, SurfaceStack


def surface_param_labels(stack: SurfaceStack, aper_idx=None,
                         lr=(1e-4, 1e-4, 1e-1, 1e-4), ai_decay: float = 0.1):
    """Per-parameter learning-rate scale arrays mirroring the reference's
    group policy (surfaces.py:865-923): separate rates for c, d, k; ai terms
    decay by `ai_decay` per order; aperture surface c stays frozen.

    Returns a pytree of scales matching {'c','k','d','ai'}.
    """
    s = stack.num_surfaces
    lr_c, lr_d, lr_k, lr_ai = lr
    c_scale = np.full(s, lr_c, np.float32)
    d_scale = np.full(s, lr_d, np.float32)
    k_scale = np.where(np.asarray(stack.k) != 0, lr_k, 0.0).astype(np.float32)
    # stops have no shape to optimize
    is_stop = np.asarray(stack.kind) == KIND_STOP
    c_scale[is_stop] = 0.0
    if aper_idx is not None:
        c_scale[aper_idx] = 0.0
    ai_scale = np.zeros_like(np.asarray(stack.ai))
    n_ai = ai_scale.shape[1]
    for j in range(1, n_ai):   # a2 frozen like the reference (commented out)
        ai_scale[:, j] = lr_ai * ai_decay ** (j - 1)
    ai_scale[np.asarray(stack.ai) == 0.0] = 0.0
    return {"c": jnp.asarray(c_scale), "k": jnp.asarray(k_scale),
            "d": jnp.asarray(d_scale), "ai": jnp.asarray(ai_scale)}


def optimizable_params(stack: SurfaceStack) -> dict:
    return {"c": stack.c, "k": stack.k, "d": stack.d, "ai": stack.ai}


def apply_params(stack: SurfaceStack, params: dict) -> SurfaceStack:
    return dataclasses.replace(stack, **params)


def make_lens_optimizer(scales, base_lr: float = 1.0):
    """Adam with per-leaf learning-rate scaling (the reference's per-group
    torch Adam, as one optax chain)."""

    def scale_by_leaf():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state

        return optax.GradientTransformation(init, update)

    return optax.chain(optax.scale_by_adam(), scale_by_leaf(),
                       optax.scale(-base_lr))


def perturb_stack(stack: SurfaceStack, key, ratio=0.001,
                  thickness_precision=0.0005, diameter_precision=0.001) -> SurfaceStack:
    """Manufacturing-error simulation (reference surfaces.py:926-943):
    multiplicative jitter on c/k/ai, additive on d/r."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    s = stack.num_surfaces

    def mul_jitter(x, kk, shape):
        return x * (1 + jax.random.normal(kk, shape) * ratio) * (x != 0) + x * (x == 0)

    c = jnp.where(stack.c != 0, stack.c * (1 + jax.random.normal(k1, (s,)) * ratio), stack.c)
    k_ = jnp.where(stack.k != 0, stack.k * (1 + jax.random.normal(k2, (s,)) * ratio), stack.k)
    ai = jnp.where(stack.ai != 0,
                   stack.ai * (1 + jax.random.normal(k3, stack.ai.shape) * ratio),
                   stack.ai)
    d = jnp.where(stack.d != 0, stack.d + jax.random.normal(k4, (s,)) * thickness_precision,
                  stack.d)
    r = stack.r + jax.random.normal(k5, (s,)) * diameter_precision
    return dataclasses.replace(stack, c=c, k=k_, ai=ai, d=d, r=r)


def correct_shape(lens) -> bool:
    """Fix degenerate geometry during lens optimization
    (reference optics.py:1615-1656): move first surface to z=0, keep a fixed
    aperture gap, separate overlapping surfaces, re-prune."""
    stack = lens.stack
    d_np = np.asarray(stack.d).copy()
    changed = False

    move = d_np[0]
    d_np -= move
    lens.d_sensor -= move

    if lens.aper_idx == 0:
        d_aper = 0.1
        from .surfaces import sag_r2

        aper_r = float(np.asarray(stack.r)[0])
        sag1 = -float(np.asarray(sag_r2(jnp.asarray(aper_r**2), stack.c[1],
                                        stack.k[1], stack.ai[1])))
        if sag1 > 0:
            d_aper += sag1
        delta = d_np[1] - d_aper
        for i in lens.find_diff_surf():
            d_np[i] -= delta

    diff = lens.find_diff_surf()
    for a, b in zip(diff[:-1], diff[1:]):
        if d_np[a] > d_np[b]:
            d_np[b] += 0.2
            changed = True

    lens.stack = dataclasses.replace(stack, d=jnp.asarray(d_np, jnp.float32))
    lens._pupil_cache = {}
    lens.prune_surf()
    return changed
