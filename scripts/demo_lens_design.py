#!/usr/bin/env python
"""End-to-end differentiable lens design demo.

Simulates a manufacturing-detuned Canon RF50mm (multiplicative jitter on
curvatures / conic / asphere coefficients, additive on thicknesses — the
reference's tolerance model, surfaces.py:926-943), then gradient-descends the
surface parameters through the ray tracer to recover the RMS spot size over a
grid of field points x RGB wavelengths. Gradients flow through the
stop-gradient-re-attached Newton intersection (reference surfaces.py:563-578;
ours optics/surfaces.py), so the whole recovery is one jitted optax loop.

Parity source: /root/reference/deeplens/surfaces.py:881-983
(get_optimizer_params / perturb) + optics.py:2103-2143 (RMS analysis).

Run (CPU ok):  python scripts/demo_lens_design.py --steps 300
Emits a before/perturbed/recovered RMS-spot table (um) per field point.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def rms_table(lens, stack, rays_per_wvln, etas, d_sensor):
    """Per-field RMS spot radius (um) averaged over wavelengths."""
    import jax.numpy as jnp

    from sdirt_tpu.optics.surfaces import trace_rays

    per_field = []
    for rays, (eta, skip) in zip(rays_per_wvln, etas):
        out = trace_rays(rays, stack, eta, skip).propagate_to(d_sensor)
        xy, m = out.o[..., :2], out.ra
        ctr = (xy * m[..., None]).sum(0) / (m.sum(0)[..., None] + 1e-9)
        r2 = (((xy - ctr) ** 2).sum(-1) * m).sum(0) / (m.sum(0) + 1e-9)
        per_field.append(jnp.sqrt(r2) * 1e3)   # mm -> um
    return np.asarray(jnp.stack(per_field).mean(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="/root/reference/lenses/rf50mm/lens_web.json")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--perturb", type=float, default=0.002,
                    help="relative manufacturing jitter on c/k/ai")
    ap.add_argument("--base-lr", type=float, default=1.0)
    ap.add_argument("--rel-step", type=float, default=2e-4,
                    help="per-step relative parameter change (Adam updates "
                         "are ~unit-scale, so this IS the step size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. while the TPU is held "
                         "by a training run)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from sdirt_tpu.optics.lens import Lens
    from sdirt_tpu.optics.optimize import (apply_params, make_lens_optimizer,
                                           optimizable_params, perturb_stack,
                                           surface_param_labels)
    from sdirt_tpu.optics.surfaces import trace_rays

    lens = Lens(args.lens, sensor_res=(512, 768))
    wvlns = (0.656, 0.589, 0.486)
    etas = [lens.eta_arrays(w, True) for w in wvlns]

    # field grid: on-axis -> 0.7 field at the far conjugate
    fields = np.array([0.0, 0.35, 0.7], np.float32)
    scale = lens.calc_scale_pinhole(-20000.0)
    pts = np.stack([np.zeros_like(fields),
                    fields * scale * lens.sensor_size[0] / 2,
                    np.full_like(fields, -20000.0)], -1)
    rays_per_wvln = [lens.sample_from_points(jax.random.PRNGKey(args.seed + i),
                                             pts, spp=args.spp)
                     for i in range(len(wvlns))]

    nominal = rms_table(lens, lens.stack, rays_per_wvln, etas, lens.d_sensor)

    key = jax.random.PRNGKey(args.seed + 100)
    detuned_stack = perturb_stack(lens.stack, key, ratio=args.perturb,
                                  thickness_precision=0.002)
    detuned = rms_table(lens, detuned_stack, rays_per_wvln, etas, lens.d_sensor)

    def loss_fn(params):
        stack = apply_params(detuned_stack, params)
        total = 0.0
        for rays, (eta, skip) in zip(rays_per_wvln, etas):
            out = trace_rays(rays, stack, eta, skip).propagate_to(lens.d_sensor)
            xy, m = out.o[..., :2], out.ra
            ctr = (xy * m[..., None]).sum(0) / (m.sum(0)[..., None] + 1e-9)
            total += (((xy - ctr) ** 2).sum(-1) * m).sum() / (m.sum() + 1e-9)
        return total / len(wvlns)

    params = optimizable_params(detuned_stack)
    # Freezing policy from the reference's param groups, but step MAGNITUDES
    # proportional to each parameter (multiplicative recovery): Adam's
    # unit-scale updates would step high-order asphere coefficients
    # (|a_10| ~ 1e-9..1e-15) by absolute 1e-6-ish and wreck the sag.
    labels = surface_param_labels(detuned_stack, aper_idx=lens.aper_idx)
    scales = jax.tree.map(
        lambda lbl, p: (lbl > 0) * args.rel_step * jnp.abs(p), labels, params)
    tx = make_lens_optimizer(scales, base_lr=args.base_lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    best, best_params = np.inf, params
    for i in range(args.steps):
        prev = params
        params, opt_state, loss = step(params, opt_state)
        # `loss` is evaluated at `prev` — pair them, not the updated params
        if float(loss) < best:
            best, best_params = float(loss), prev
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6e}  "
                  f"({time.time()-t0:.1f}s)", flush=True)

    recovered_stack = apply_params(detuned_stack, best_params)
    recovered = rms_table(lens, recovered_stack, rays_per_wvln, etas,
                          lens.d_sensor)

    print("\nRMS spot radius (um), RGB-averaged, rf50mm @ -20 m conjugate")
    print(f"{'field':>6} | {'nominal':>8} | {'detuned':>8} | {'recovered':>9}")
    for f, a, b, c in zip(fields, nominal, detuned, recovered):
        print(f"{f:6.2f} | {a:8.2f} | {b:8.2f} | {c:9.2f}")
    mean_rec = recovered.mean()
    print(f"\nmean: nominal {nominal.mean():.2f}  detuned {detuned.mean():.2f}"
          f"  recovered {mean_rec:.2f}")
    ok = mean_rec < 0.5 * detuned.mean() or mean_rec < 1.1 * nominal.mean()
    print("RECOVERY", "OK" if ok else "WEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
