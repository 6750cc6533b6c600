"""PSF-surrogate fitting: ray-traced supervision generated INSIDE the jitted
train step.

Parity source: /root/reference/deeplens/psfnet.py:101-241. The reference
alternates host-side data generation (a full ray-trace dispatch chain) with
an AMP torch step; here sampling, tracing, splatting, the MLP forward/backward
and the optimizer update are one XLA program — the TPU never idles between
supervision and learning.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dp.psf import dp_psf, dp_psf_fused, lens_scalars


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR's closed form — periodic
    past t_max, exactly like the reference's T_max=iters/3 setting
    (psfnet.py:111) which sweeps 1.5 periods over training."""

    def schedule(step):
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * step / t_max)) / 2

    return schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PSFNetTrainState:
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def create_train_state(lens, lr: float = 1e-4, iters: int = 10000) -> tuple:
    """AdamW + cosine annealing (reference psfnet.py:110-111)."""
    tx = optax.adamw(cosine_annealing(lr, max(iters // 3, 1)))
    # Copy params: the train step donates its state, which would otherwise
    # invalidate the lens-held buffers after the first step.
    params = jax.tree.map(jnp.copy, lens.params)
    state = PSFNetTrainState(params=params,
                             opt_state=tx.init(params),
                             step=jnp.zeros((), jnp.int32))
    return state, tx


def sample_training_points(key, bs: int, foc_z_arr, d_min, d_max):
    """(x, y) uniform, z piecewise-Gaussian around a random focus setting
    (reference psfnet.py:180-201)."""
    kf, kx, ky, kz = jax.random.split(key, 4)
    foc_z = foc_z_arr[jax.random.randint(kf, (), 0, foc_z_arr.shape[0])]
    x = (jax.random.uniform(kx, (bs,)) - 0.5) * 2
    y = (jax.random.uniform(ky, (bs,)) - 0.5) * 2
    g = jnp.clip(jax.random.normal(kz, (bs,)), -3.0, 3.0)
    z = jnp.where(g > 0, (1 - foc_z) * g / 3 + foc_z, foc_z * g / 3 + foc_z)
    inp = jnp.stack([x, y, z], -1)
    depth = z * (d_max - d_min) + d_min
    points = jnp.stack([x, y, depth], -1)
    return inp, points


def _trace_impl(lens):
    """Trace implementation for stop-gradient'd PSF supervision.

    Returns (mode, static_arg): ('scan', None), ('specialized', desc) or
    ('fused', FusedPlan). Resolution: SDIRT_TRACE env wins; otherwise the
    fused-trace promotion manifest (ckpt/FUSED_TRACE.json, written by the
    on-chip A/B in scripts/bench_fused_trace.py) flips the default to the
    Pallas fused kernel; otherwise the lax.scan trace (TPU-lean, see the
    A/B history in make_train_step's comment)."""
    import json
    import os

    mode = os.environ.get("SDIRT_TRACE")
    if mode is None and jax.default_backend() == "tpu":
        # manifest default is TPU-only: off-TPU the kernel would run in the
        # (slow) interpreter, and the scan trace is the right CPU default
        man = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "ckpt", "FUSED_TRACE.json")
        try:
            with open(man) as f:
                if json.load(f).get("promote"):
                    mode = "fused"
        except (OSError, ValueError):
            pass
    if mode == "specialized":
        return mode, lens.static_desc()
    if mode == "fused":
        from ..dp.fused_trace import make_fused_plan

        return mode, make_fused_plan(lens)
    return "scan", None


def make_train_step(lens, tx, *, bs: int, spp: int, ks: int):
    """Build the fused sample+trace+fit step for a PSFNetLens."""
    apply_fn = lens.net.apply
    foc_z_arr = jnp.asarray(lens.foc_z_arr)
    d_min, d_max = lens.d_min, lens.d_max
    # the traced supervision is stop_gradient'd, so any trace serves it
    # (golden-parity-tested). Idle-chip A/B (logs/bench_trace_ab_*.log):
    # the lax.scan trace is ~25% FASTER on TPU than the statically-unrolled
    # XLA trace at this very shape (134 vs 107 Mrays/s) and far leaner on
    # HBM temps; the Pallas fused trace (dp/fused_trace.py) takes over as
    # default once its on-chip A/B promotes it (ckpt/FUSED_TRACE.json).
    mode, static = _trace_impl(lens)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: PSFNetTrainState, key, stack, eta, skip, scalars):
        k_pts, k_psf = jax.random.split(key)
        inp, points = sample_training_points(k_pts, bs, foc_z_arr, d_min, d_max)
        if mode == "fused":
            psf_gt, _ = dp_psf_fused(points, k_psf, scalars, static,
                                     spp=spp, ks=ks)
        else:
            psf_gt, _ = dp_psf(stack, eta, skip, points, k_psf, scalars,
                               spp=spp, ks=ks, static_desc=static)
        psf_gt = jax.lax.stop_gradient(psf_gt)

        def loss_fn(params):
            pred = apply_fn(params, inp).reshape(bs, ks, ks)
            return jnp.mean((pred - psf_gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PSFNetTrainState(params=params, opt_state=opt_state,
                                step=state.step + 1), loss

    return train_step


def make_eval_fn(lens, *, bs: int = 1024, spp: int = 65536, ks: int = 21):
    """Held-out L1/L2 on sum-normalized PSFs (reference psfnet.py:204-241:
    32x32 xy grid, z linspace over the +-3 sigma band). bs must be a square
    (the xy grid is sqrt(bs) x sqrt(bs), matching the reference's 1024=32^2)."""
    apply_fn = lens.net.apply
    foc_z = float(lens.foc_z_arr[1])
    d_min, d_max = lens.d_min, lens.d_max

    mode, static = _trace_impl(lens)
    psf_grid = int(round(bs ** 0.5))
    assert psf_grid * psf_grid == bs, "eval bs must be a perfect square"
    hb = 1 / (2 * psf_grid)
    x, y = np.meshgrid(np.linspace(-1 + hb, 1 - hb, psf_grid),
                       np.linspace(1 - hb, -1 + hb, psf_grid), indexing="xy")
    x, y = x.reshape(-1).astype(np.float32), y.reshape(-1).astype(np.float32)
    g = np.linspace(-3, 3, bs).astype(np.float32)
    z = np.where(g > 0, (1 - foc_z) * g / 3 + foc_z, foc_z * g / 3 + foc_z)
    z[g == 0] = 0.0
    inp = np.stack([x, y, z], -1)
    depth = z * (d_max - d_min) + d_min
    points = jnp.asarray(np.stack([x, y, depth], -1))
    inp = jnp.asarray(inp)

    # Chunk the point axis: the full [spp, bs] trace (65536 x 1024 rays at
    # once) OOMs a 16 GB chip under the statically-unrolled trace — the
    # unrolled graph's remat temps are [spp, bs] f32 buffers (256 MB each,
    # dozens live), where the lax.scan trace kept one surface live at a
    # time. 128-point chunks bound every temp at 32 MB on either path.
    cbs = bs if bs <= 128 or bs % 128 else 128
    n_chunks = bs // cbs
    points_c = points.reshape(n_chunks, cbs, 3)

    @partial(jax.jit)
    def eval_fn(params, key, stack, eta, skip, scalars):
        keys = jax.random.split(key, n_chunks)

        def one_chunk(args):
            pts, k = args
            if mode == "fused":
                psf, _ = dp_psf_fused(pts, k, scalars, static,
                                      spp=spp, ks=ks, chunk=8192)
            else:
                psf, _ = dp_psf(stack, eta, skip, pts, k, scalars,
                                spp=spp, ks=ks, chunk=8192, static_desc=static)
            return psf

        psf_gt = jax.lax.map(one_chunk, (points_c, keys)).reshape(bs, ks, ks)
        pred = apply_fn(params, inp).reshape(bs, ks, ks)
        gt_n = psf_gt / (psf_gt.sum((-1, -2), keepdims=True) + 1e-9)
        pd_n = pred / (pred.sum((-1, -2), keepdims=True) + 1e-9)
        return jnp.mean(jnp.abs(pd_n - gt_n)), jnp.mean((pd_n - gt_n) ** 2)

    return eval_fn


def fit_psfnet(lens, iters: int = 10000, bs: int = 128, lr: float = 1e-4,
               spp: int = 2048, evaluate_every: int = 1000,
               result_dir: str | None = None, seed: int = 0,
               log_fn=print, resume: bool = False,
               eval_bs: int = 1024, eval_spp: int = 65536, mesh=None,
               keep_states: int = 3):
    """Train loop (reference psfnet.py:101-167). Returns the trained params
    (also written into lens.params). With resume=True and a result_dir, the
    FULL train state (params + optimizer + step) restores from the newest
    checkpoint — the reference could only reload weights.

    mesh: optional ('data', 'rays') jax.sharding.Mesh — shards field points
    over 'data' and Monte-Carlo rays over 'rays' (the splat grids psum over
    ICI; see parallel/steps.py). bs must divide by the mesh's data size."""
    state, tx = create_train_state(lens, lr, iters)
    if mesh is not None:
        from ..parallel.steps import make_sharded_psfnet_step

        step_fn = make_sharded_psfnet_step(lens, tx, mesh, bs=bs, spp=spp,
                                           ks=lens.kernel_size)
    else:
        step_fn = make_train_step(lens, tx, bs=bs, spp=spp, ks=lens.kernel_size)
    eval_fn = make_eval_fn(lens, ks=lens.kernel_size, bs=eval_bs, spp=eval_spp)

    ckpt = None
    start = 0
    if result_dir is not None:
        from ..utils.checkpoint import TrainCheckpointer

        ckpt = TrainCheckpointer(f"{result_dir}/state", max_to_keep=keep_states)
        if resume:
            restored, step = ckpt.restore_latest(state)
            if restored is not None:
                state = restored
                start = int(step)
                log_fn(f"resumed from step {start}")

    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), start)

    for i in range(start, iters + 1):
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, sub, lens.stack, eta, skip, scalars)
        if (i + 1) % evaluate_every == 0:
            key, sub = jax.random.split(key)
            l1, l2 = eval_fn(state.params, sub, lens.stack, eta, skip, scalars)
            log_fn(f"{i}, {float(l1)}, {float(l2)}")
            if ckpt is not None:
                ckpt.save(i + 1, state)
                lens.params = state.params
    lens.params = state.params
    if ckpt is not None:
        ckpt.wait()
    if result_dir is not None:
        lens.save_net(f"{result_dir}/psfnet_{lens.model_name}")
    return state.params


def get_training_psf_map(lens, key, bs: int = 8, psf_grid=(11, 11),
                         psf_map_size=(128, 128), spp: int = 2048):
    """PSF-map training batches for the MLPConv architecture
    (reference psfnet.py:243-312): sample depths around a focus setting,
    trace a grid of PSFs per depth, tile into a map, resize.

    Returns (inp [B, 2] = (z, foc_z), maps [B, 3, H, W]).
    """
    import jax.image

    from ..dp.psf import compute_psf_rgb
    from ..optics.sampling import point_source_grid

    kf, kz, kp = jax.random.split(key, 3)
    foc_z = float(np.asarray(lens.foc_z_arr)[
        int(jax.random.randint(kf, (), 0, len(lens.foc_z_arr)))])
    g = jnp.clip(jax.random.normal(kz, (bs,)), -3, 3)
    z = jnp.where(g > 0, (1 - foc_z) * g / 3 + foc_z, foc_z * g / 3 + foc_z)
    depth = z * (lens.d_max - lens.d_min) + lens.d_min
    inp = jnp.stack([z, jnp.full_like(z, foc_z)], -1)

    gh, gw = psf_grid
    ks = lens.kernel_size
    maps = []
    for i in range(bs):
        pts = point_source_grid(depth=float(depth[i]), grid=max(gh, gw),
                                center=True)[:gh, :gw].reshape(-1, 3)
        kp, sub = jax.random.split(kp)
        psfs = compute_psf_rgb(lens, pts, key=sub, spp=spp, ks=ks)
        m = psfs.reshape(gh, gw, 3, ks, ks).transpose(2, 0, 3, 1, 4)
        m = m.reshape(3, gh * ks, gw * ks)
        m = jax.image.resize(m, (3, *psf_map_size), "linear")
        maps.append(m)
    return inp, jnp.stack(maps)
