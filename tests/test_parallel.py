"""Sharding CORRECTNESS (not just dryrun): the ('data', 'rays')-sharded
production steps must produce the same numbers as the single-device steps on
the 8-virtual-CPU mesh (tests/conftest.py forces
xla_force_host_platform_device_count=8).

Covers:
  * dp_psf with the ray-axis sharding constraint == unsharded dp_psf
    (the psum-reduced splat grids are the core sharded computation)
  * make_sharded_psfnet_step on an 8-device mesh == the same step on a
    1-device mesh: identical loss and identical updated params. SGD is used
    as the optimizer here so updates are LINEAR in the gradients — with
    Adam the first step is ~ lr*sign(g), which amplifies f32
    accumulation-order noise on near-zero grads into full sign flips.
  * make_sharded_dfdp_step == dfdp_train_step: same losses, same updated
    BatchNorm statistics, and the same loss on a SECOND step from the
    updated state (transitively pins the updated params).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from sdirt_tpu.parallel.mesh import make_mesh
from sdirt_tpu.parallel.steps import (make_sharded_dfdp_step,
                                      make_sharded_psfnet_step)

LENS = "lenses/rf50mm/lens_web.json"


@pytest.fixture(scope="module")
def psf_lens():
    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    return PSFNetLens(LENS, kernel_size=11, sensor_res=(512, 768))


@pytest.mark.slow
def test_dp_psf_ray_sharding_equivalence(psf_lens):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdirt_tpu.dp.psf import dp_psf, lens_scalars

    lens = psf_lens
    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(np.stack([rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8),
                                -(rng.uniform(0, 1, 8) * 5000 + 500)],
                               -1).astype(np.float32))
    key = jax.random.PRNGKey(3)

    ref_l, ref_r = dp_psf(lens.stack, eta, skip, pts, key, scalars,
                          spp=512, ks=11)

    mesh = make_mesh(n_data=4, n_rays=2)

    def shard_rays(rays):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(*(["rays", "data"]
                                           + [None] * (a.ndim - 2))))), rays)

    with mesh:
        sh_l, sh_r = jax.jit(lambda: dp_psf(
            lens.stack, eta, skip, pts, key, scalars,
            spp=512, ks=11, shard_rays=shard_rays))()

    # identical rays; differences are splat-matmul accumulation order only
    # (the bilinear splat contracts in bf16 -> ~1e-3-level reorder noise,
    # same band as the round-1 batched-vs-per-item render cross-check)
    for sh, ref in ((sh_l, ref_l), (sh_r, ref_r)):
        diff = np.abs(np.asarray(sh) - np.asarray(ref))
        assert diff.max() < 2e-3, diff.max()
        assert diff.mean() < 5e-5, diff.mean()


def _run_psfnet_step(lens, mesh):
    from sdirt_tpu.dp.psf import lens_scalars
    from sdirt_tpu.psfnet.train import PSFNetTrainState

    tx = optax.sgd(0.05)
    params = lens.net.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 3), jnp.float32))
    state = PSFNetTrainState(params=params, opt_state=tx.init(params), step=0)
    step = make_sharded_psfnet_step(lens, tx, mesh, bs=8, spp=512, ks=11)
    eta, skip = lens.eta_arrays(0.589, True)
    with mesh:
        state, loss = step(state, jax.random.PRNGKey(11), lens.stack, eta,
                           skip, lens_scalars(lens))
    return jax.device_get(state.params), float(loss)


@pytest.mark.slow
def test_sharded_psfnet_step_matches_single_device(psf_lens):
    mesh8 = make_mesh(n_data=4, n_rays=2)
    mesh1 = make_mesh(n_data=1, n_rays=1, devices=jax.devices()[:1])

    params8, loss8 = _run_psfnet_step(psf_lens, mesh8)
    params1, loss1 = _run_psfnet_step(psf_lens, mesh1)

    assert np.isclose(loss8, loss1, rtol=2e-5), (loss8, loss1)
    flat8 = jax.tree.leaves(params8)
    flat1 = jax.tree.leaves(params1)
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


@pytest.mark.slow
def test_sharded_dfdp_step_matches_unsharded():
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_train_step

    # H, W >= 128 so the 32x32 SPP pooling branch is non-degenerate; a
    # 2-device mesh keeps the CPU-backend 3D-conv cost test-sized while
    # still exercising the batch collectives
    h, w = 128, 192
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.uniform(0, 1, (2, 6, h, w)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.3, 9.0, (2, 1, h, w)).astype(np.float32))

    def fresh():
        state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 10,
                                     (1, 6, h, w))
        return state

    mesh = make_mesh(n_data=2, n_rays=1, devices=jax.devices()[:2])
    sharded_step = make_sharded_dfdp_step(mesh)
    with mesh:
        s_state, s_losses = sharded_step(fresh(), stack, depth)
        # the train step donates its input state: snapshot before reusing
        s_bstats = jax.device_get(s_state.batch_stats)
        _, s_losses2 = sharded_step(s_state, stack, depth)

    r_state, r_losses = dfdp_train_step(fresh(), stack, depth)
    r_bstats = jax.device_get(r_state.batch_stats)
    _, r_losses2 = dfdp_train_step(r_state, stack, depth)

    for k in r_losses:
        assert np.isclose(float(s_losses[k]), float(r_losses[k]),
                          rtol=3e-5), (k, float(s_losses[k]), float(r_losses[k]))
    # BatchNorm statistics: linear reductions over the (sharded) batch, but
    # taken of ACTIVATIONS 20+ conv layers deep, where partition-dependent
    # f32 reduction tilings accumulate ~1e-4-level differences (the losses
    # above match to 3e-5, so the forward itself is equivalent)
    for a, b in zip(jax.tree.leaves(s_bstats), jax.tree.leaves(r_bstats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-2)
    # second-step loss transitively pins the updated parameters
    assert np.isclose(float(s_losses2["total"]), float(r_losses2["total"]),
                      rtol=5e-4), (float(s_losses2["total"]),
                                   float(r_losses2["total"]))
