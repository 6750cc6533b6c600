#!/usr/bin/env python
"""Ray-traced truth L1 of a fitted PSF surrogate under TODAY's eval.

Settles teacher-staleness questions: if a distilled student's truth L1
floors at X while its distill MSE keeps falling, the teacher itself scores
~X under the current eval geometry (fit-era checkpoints predate geometry
fixes). Usage:
  python scripts/probe_teacher_l1.py --lens lenses/rf35mm/lens_web.json \
      --model mlp --ckpt ckpt/rf35mm/F4_PSFNet_mlp
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="lenses/rf35mm/lens_web.json")
    ap.add_argument("--model", default="mlp")
    ap.add_argument("--ckpt", default="ckpt/rf35mm/F4_PSFNet_mlp")
    ap.add_argument("--ks", type=int, default=21)
    args = ap.parse_args()

    import jax

    from sdirt_tpu.dp.psf import lens_scalars
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.psfnet.train import make_eval_fn

    lens = PSFNetLens(args.lens, model_name=args.model, kernel_size=args.ks,
                      sensor_res=(512, 768))
    lens.load_net(args.ckpt)
    eval_fn = make_eval_fn(lens, ks=args.ks)
    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)
    l1, l2 = eval_fn(lens.params, jax.random.PRNGKey(123), lens.stack,
                     eta, skip, scalars)
    print(f"{args.ckpt}: truth L1 {float(l1):.6f}  L2 {float(l2):.3e}")


if __name__ == "__main__":
    main()
