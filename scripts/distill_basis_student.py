#!/usr/bin/env python
"""Distill a linear-head basis student (PSFMLPBasis) from a fitted PSFMLP
teacher — dense-tap supervision instead of ray tracing.

Why: the ray-traced fit of mlpb@256x32 converged ~1.8x above the w256
teacher's truth L1 (6.1e-4 vs 3.3e-4; logs/f4_fit_basis32.log vs
logs/f4_fit_w256_150k.log) and failed the real-capture gate by ~2 dB.
The MC supervision (spp=20000 splats) is noisy and one 441-tap target per
query is expensive; the teacher's predicted taps are noise-free, cost one
GEMM chain, and are EXACTLY what the render-variant gate compares the
basis path against. Distilling student -> teacher isolates the
representation question (can a K-dim linear basis express the teacher's
PSF manifold?) from the optimization noise.

Method: batches of sample_training_points queries (the fit distribution,
reference psfnet.py:180-201), MSE on raw taps (the fit objective),
AdamW + cosine, ONE jitted step per dispatch, pipelined — exactly the fit
loop's shape. (A lax.scan of N train steps per dispatch was tried first
and is pathological on this stack: even a ~6 MB carry stalled the tunnel
for 20 min with zero dispatches completing; the per-step loop moves no
carry host-side and pipelines at full rate.) Periodic ray-traced truth
eval (train.make_eval_fn) so the student's L1 is directly comparable
with every fit log.

Usage:
  python scripts/distill_basis_student.py --student mlpb@256x32 \
      --warm results/f4_fit_basis32/psfnet_mlpb@256x32 \
      --out results/distill_basis32 [--iters 400000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json")
    ap.add_argument("--teacher", default="mlp@256")
    ap.add_argument("--teacher-ckpt", default="ckpt/rf50mm/F4_PSFNet_mlp@256")
    ap.add_argument("--student", default="mlpb@256x32")
    ap.add_argument("--warm", default=None,
                    help="student checkpoint to warm-start (trunk and head)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=200000)
    ap.add_argument("--bs", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--eval-every", type=int, default=20000)
    ap.add_argument("--ks", type=int, default=21)
    ap.add_argument("--resume", action="store_true",
                    help="resume the full train state from OUT/state")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import (PSFNetTrainState, cosine_annealing,
                                        make_eval_fn, sample_training_points)
    from sdirt_tpu.dp.psf import lens_scalars

    teacher = PSFNetLens(args.lens, model_name=args.teacher,
                         kernel_size=args.ks, sensor_res=(512, 768))
    teacher.load_net(args.teacher_ckpt)
    student = PSFNetLens(args.lens, model_name=args.student,
                         kernel_size=args.ks, sensor_res=(512, 768))
    if args.warm:
        student.load_net(args.warm)

    t_apply, t_params = teacher.net.apply, teacher.params
    s_apply = student.net.apply
    foc_z_arr = jnp.asarray(student.foc_z_arr)
    d_min, d_max = student.d_min, student.d_max
    bs = args.bs

    tx = optax.adamw(cosine_annealing(args.lr, max(args.iters // 3, 1)))
    params = jax.tree.map(jnp.copy, student.params)
    state = PSFNetTrainState(params=params, opt_state=tx.init(params),
                             step=jnp.zeros((), jnp.int32))

    # Mid-run checkpointing (ADVICE r3): this host gets recycled; a 200k-iter
    # run with only a final save loses everything. State is saved at every
    # eval and --resume picks up from the newest step (per-iter keys are
    # fold_in(i) so the data stream is identical across a resume).
    from sdirt_tpu.utils.checkpoint import TrainCheckpointer

    os.makedirs(args.out, exist_ok=True)
    ckptr = TrainCheckpointer(f"{args.out}/state")
    start_iter = 0
    if args.resume:
        restored, step = ckptr.restore_latest(state)
        if restored is not None:
            state, start_iter = restored, int(step)
            print(f"resumed train state at iter {start_iter}", flush=True)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def distill_step(state, key):
        inp, _ = sample_training_points(key, bs, foc_z_arr, d_min, d_max)
        gt = lax.stop_gradient(t_apply(t_params, inp))

        def loss_fn(p):
            return jnp.mean((s_apply(p, inp) - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return PSFNetTrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, step=state.step + 1), loss

    eval_fn = make_eval_fn(student, ks=args.ks)
    eta, skip = student.eta_arrays(0.589, True)
    scalars = lens_scalars(student)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(start_iter, args.iters):
        state, loss = distill_step(state, jax.random.fold_in(key, i))
        if (i + 1) % args.eval_every == 0:
            l1, l2 = eval_fn(state.params,
                             jax.random.fold_in(key, args.iters + i + 1),
                             student.stack, eta, skip, scalars)
            print(f"iter {i + 1}: distill mse {float(loss):.3e}  "
                  f"truth L1 {float(l1):.6f}  L2 {float(l2):.3e}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
            ckptr.save(i + 1, state)

    ckptr.wait()
    ckptr.close()
    student.params = state.params
    student.save_net(f"{args.out}/psfnet_{args.student}")
    print(f"saved {args.out}/psfnet_{args.student}")


if __name__ == "__main__":
    main()
