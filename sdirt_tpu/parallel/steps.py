"""Multi-chip training steps: pjit-sharded PSF-surrogate fit and DfDP step.

Parallelism plan (SURVEY.md §2 parallelism inventory):
  * PSF fit: field points sharded over 'data', Monte-Carlo rays over 'rays';
    splat matmuls contract the sharded ray axis, so XLA emits a psum of the
    per-chip PSF grids over ICI; gradient psum over 'data' comes from the
    replicated-parameter jit.
  * DfDP: plain batch sharding over 'data'; BatchNorm reductions and grad
    all-reduces become XLA collectives automatically.

These run on any mesh — real TPU pods or the 8-virtual-device CPU mesh used
in tests/dryrun.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dp.psf import dp_psf
from ..psfnet.train import PSFNetTrainState, sample_training_points


def make_sharded_psfnet_step(lens, tx, mesh: Mesh, *, bs: int, spp: int, ks: int):
    """Fused PSF-fit step over a ('data', 'rays') mesh."""
    apply_fn = lens.net.apply
    foc_z_arr = jnp.asarray(lens.foc_z_arr)
    d_min, d_max = lens.d_min, lens.d_max

    pts_sharding = NamedSharding(mesh, P("data"))
    ray_sharding = NamedSharding(mesh, P("rays", "data"))
    repl = NamedSharding(mesh, P())

    def shard_rays(rays):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(*(["rays", "data"] + [None] * (a.ndim - 2))))),
            rays)

    def step(state: PSFNetTrainState, key, stack, eta, skip, scalars):
        k_pts, k_psf = jax.random.split(key)
        inp, points = sample_training_points(k_pts, bs, foc_z_arr, d_min, d_max)
        inp = jax.lax.with_sharding_constraint(inp, pts_sharding)
        points = jax.lax.with_sharding_constraint(points, pts_sharding)
        psf_gt, _ = dp_psf(stack, eta, skip, points, k_psf, scalars,
                           spp=spp, ks=ks, shard_rays=shard_rays)
        psf_gt = jax.lax.stop_gradient(psf_gt)

        def loss_fn(params):
            pred = apply_fn(params, inp).reshape(bs, ks, ks)
            return jnp.mean((pred - psf_gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PSFNetTrainState(params=params, opt_state=opt_state,
                                step=state.step + 1), loss

    return jax.jit(step, out_shardings=(repl, repl))


def make_sharded_dfdp_step(mesh: Mesh, train_mode: str = "dfdp"):
    """Data-parallel DfDP step over the 'data' mesh axis. In 'deblur' mode
    the all-in-focus target shards with the batch."""
    from ..dfdp.train import dfdp_train_step

    batch_sharding = NamedSharding(mesh, P("data"))

    def step(state, stack_rgb, gt_depth, gt_aif=None):
        stack_rgb = jax.lax.with_sharding_constraint(stack_rgb, batch_sharding)
        gt_depth = jax.lax.with_sharding_constraint(gt_depth, batch_sharding)
        if gt_aif is not None:
            gt_aif = jax.lax.with_sharding_constraint(gt_aif, batch_sharding)
        return dfdp_train_step(state, stack_rgb, gt_depth, gt_aif=gt_aif,
                               train_mode=train_mode)

    return jax.jit(step)
