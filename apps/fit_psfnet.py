#!/usr/bin/env python
"""Fit the implicit dual-pixel PSF network against ray-traced supervision.

Parity source: /root/reference/1_fit_psfnet.py (ks=21 for F/4, rf50mm at
512x768, refocus to 1 m, lens analysis at -500/-20000 mm, 90k iterations at
bs=64 / spp=20000). Defaults match the reference; everything is a flag.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from datetime import datetime


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="./lenses/rf50mm/lens_web.json")
    ap.add_argument("--model", default="mlp",
                    help="PSF net architecture: mlp | mlpconv | siren, or "
                         "mlp@WIDTH for a narrower trunk (e.g. mlp@256 — a "
                         "render-throughput option gated on fidelity). "
                         "Reference psfnet.py:62-89; 'mlp' is the published "
                         "configuration; 'mlp+lum' predicts (psf, lum) "
                         "tuples and needs its own loss, so not offered")
    ap.add_argument("--ks", type=int, default=21, help="21 for F/4, 35 for F/1.8")
    ap.add_argument("--fnum", type=float, default=None,
                    help="re-stop the lens to this f-number before fitting "
                         "(reference optics.py:1527-1538 set_aperture; e.g. "
                         "1.8 with --ks 35)")
    ap.add_argument("--res", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--focus-mm", type=float, default=-1000.0,
                    help="object-side focus distance in mm (negative). The "
                         "reference pins ~1 m (psfnet.py:50-52); other values "
                         "(e.g. -5000) fit far-focused surrogates for the "
                         "multi-focus stack (psfnet/stack.py)")
    ap.add_argument("--iters", type=int, default=90000)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--spp", type=int, default=20000)
    ap.add_argument("--evaluate-every", type=int, default=1000)
    ap.add_argument("--pretrained", default=None, help="checkpoint to warm-start")
    ap.add_argument("--result-dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-analysis", action="store_true")
    ap.add_argument("--resume", action="store_true", help="resume full train state from result-dir")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--eval-bs", type=int, default=1024)
    ap.add_argument("--keep-states", type=int, default=3,
                    help="orbax retention: resumable train-state checkpoints kept")
    ap.add_argument("--eval-spp", type=int, default=65536)
    ap.add_argument("--mesh", type=int, nargs=2, metavar=("DATA", "RAYS"),
                    default=None,
                    help="multi-chip fit over a (data, rays) device mesh: "
                         "field points shard over DATA chips, Monte-Carlo "
                         "rays over RAYS chips (DATA*RAYS <= device count; "
                         "bs %% DATA == 0)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import fit_psfnet
    from sdirt_tpu.utils.logging import set_logger, set_seed

    result_dir = args.result_dir or (
        "./results/" + datetime.now().strftime("%m%d-%H%M%S") + "-psfnet")
    os.makedirs(result_dir, exist_ok=True)
    set_logger(result_dir)
    set_seed(args.seed)

    lens = PSFNetLens(filename=args.lens, model_name=args.model,
                      sensor_res=tuple(args.res), kernel_size=args.ks)
    if args.fnum is not None:
        lens.set_aperture(fnum=args.fnum)
        print(f"aperture re-stopped to F/{lens.fnum:.3f}")
    d_sensor = lens.d_sensor
    lens.refocus(args.focus_mm + d_sensor)
    if args.focus_mm != -1000.0:
        # re-center the training-z sampler + eval band on the new focus;
        # the default keeps the reference's pinned ~1 m prior untouched
        lens.set_focus_prior(args.focus_mm)
    lens.write_lens_json(f"{result_dir}/lens.json")
    print("d_sensor:", lens.d_sensor)

    if not args.skip_analysis:
        from sdirt_tpu.optics.analysis import analysis

        for depth0 in (-500, -20000):
            depth = depth0 + d_sensor
            analysis(lens, save_name=f"{result_dir}/{int(depth)}",
                     depth=depth, ks=args.ks)

    if args.pretrained and os.path.exists(args.pretrained):
        lens.load_net(args.pretrained)

    import logging

    mesh = None
    if args.mesh is not None:
        import jax

        from sdirt_tpu.parallel.mesh import make_mesh

        n_data, n_rays = args.mesh
        assert args.bs % n_data == 0, (args.bs, n_data)
        devices = jax.devices()[:n_data * n_rays]
        mesh = make_mesh(n_data=n_data, n_rays=n_rays, devices=devices)
        logging.info(f"multi-chip fit over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    fit_psfnet(lens, iters=args.iters, bs=args.bs, lr=args.lr, spp=args.spp,
               evaluate_every=args.evaluate_every, result_dir=result_dir,
               seed=args.seed, log_fn=logging.info, resume=args.resume,
               eval_bs=args.eval_bs, eval_spp=args.eval_spp, mesh=mesh,
               keep_states=args.keep_states)

    lens.compare_psf(save_dir=result_dir)
    print("Finish PSF net fitting.")


if __name__ == "__main__":
    main()
