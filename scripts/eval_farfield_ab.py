#!/usr/bin/env python
"""Far-field A/B: F/4 ks21 net vs F/1.8 ks35 net on the SAME v2 val scenes.

VERDICT r3 item 8: the ray-traced physics probe says F/1.8 carries ~4x the
far-field DP disparity (0.54 px vs 0.14 px across 5-9 m,
scripts/dp_disparity_probe.py --traced). This evaluates whether that extra
signal translates to depth accuracy: each arm renders the identical v2
scenes through ITS OWN aperture/surrogate (the capture physics under test)
and its net predicts depth; metrics are split into near (<=3 m) and FAR
(>3 m) bands.

Usage:
  python scripts/eval_farfield_ab.py \
      --arm f4  ckpt/rf50mm/Sdirt_f4_farfield  ckpt/rf50mm/F4_PSFNet_mlp 21 \
      --arm f18 ckpt/rf50mm/Sdirt_f18_farfield ckpt/rf50mm/F18_PSFNet_mlp_ks35 35 --fnum18 1.8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", nargs=4, action="append", required=True,
                    metavar=("NAME", "CKPT", "PSFNET", "KS"),
                    help="evaluation arm: name, depth ckpt, surrogate, ks. "
                         "PSFNET may be a comma list of path[@focus_mm] "
                         "entries (e.g. 'a@-1000,b@-5000') — a multi-focus "
                         "stack arm (psfnet/stack.py); the net's input is "
                         "then 6xV channels")
    ap.add_argument("--fnum18", type=float, default=1.8,
                    help="aperture for any arm whose name contains '18'")
    ap.add_argument("--res", type=int, nargs=2, default=(256, 384))
    ap.add_argument("--val-len", type=int, default=16)
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    from sdirt_tpu.dfdp.datasets import SyntheticRGBD
    from sdirt_tpu.dfdp.metrics import mask_accuracy_k, mask_mae
    from sdirt_tpu.dfdp.monitor import select_focus_dist
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_infer
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.utils.checkpoint import restore_inference_ckpt

    h, w = args.res
    rows = []
    for name, ckpt, psfnet, ks in args.arm:
        ks = int(ks)

        def build_one(spec):
            path, _, foc = spec.partition("@")
            sub = PSFNetLens(args.lens, kernel_size=ks, sensor_res=(h, w))
            if "18" in name:
                sub.set_aperture(fnum=args.fnum18)
            if foc and float(foc) != -1000.0:
                sub.refocus(float(foc) + sub.d_sensor)
                sub.set_focus_prior(float(foc))
            sub.load_net(path)
            return sub

        subs = [build_one(s) for s in psfnet.split(",")]
        if len(subs) == 1:
            lens = subs[0]
        else:
            from sdirt_tpu.psfnet.stack import FocalStackLens

            lens = FocalStackLens(subs)
        state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 1,
                                     (1, 6 * len(subs), h, w))
        params, bstats = restore_inference_ckpt(ckpt, state.params,
                                                state.batch_stats)
        ds = SyntheticRGBD((h, w), length=args.val_len, seed=999,
                           train=False, style="v2")
        key = jax.random.PRNGKey(7)
        acc, mae, facc, fmae, nacc = [], [], [], [], []
        for i in range(len(ds)):
            aif, gt = ds[i]
            aif, gt = aif[None], gt[None]
            focus = select_focus_dist(gt, 1, mode="linear")
            key, sub = jax.random.split(key)
            dp = lens.render(aif, depth=-gt * 1e3,
                             foc_dist=-focus[:, 0] * 1e3,
                             train=False, key=sub)
            pred = np.asarray(dfdp_infer(params, bstats, dp))
            mask = gt > 0
            acc.append(mask_accuracy_k(pred, gt, 1, mask))
            mae.append(mask_mae(pred, gt, mask))
            far = mask & (gt > 3.0)
            near = mask & (gt <= 3.0)
            if far.any():
                facc.append(mask_accuracy_k(pred, gt, 1, far))
                fmae.append(mask_mae(pred, gt, far))
            if near.any():
                nacc.append(mask_accuracy_k(pred, gt, 1, near))
        rows.append((name, np.mean(acc), np.mean(mae), np.mean(facc),
                     np.mean(fmae), np.mean(nacc)))
        print(f"[{name}] overall acc1 {rows[-1][1]:.4f} mae {rows[-1][2]:.3f}"
              f" | FAR>3m acc1 {rows[-1][3]:.4f} mae {rows[-1][4]:.3f}"
              f" | near acc1 {rows[-1][5]:.4f}", flush=True)

    print("\narm      acc1    mae    far_acc1  far_mae  near_acc1")
    for r in rows:
        print(f"{r[0]:8s} {r[1]:.4f}  {r[2]:.3f}  {r[3]:.4f}    "
              f"{r[4]:.3f}    {r[5]:.4f}")


if __name__ == "__main__":
    main()
