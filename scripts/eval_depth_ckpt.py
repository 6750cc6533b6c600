#!/usr/bin/env python
"""Evaluate a DfDP checkpoint on synthetic val sets (v1-v4 styles) and
the bundled real sample sets — used to pick which trained candidate ships as
ckpt/rf50mm/Sdirt_best_acc1.

Also reports the best-CONSTANT-predictor acc1 for each synthetic val style:
a depth net only demonstrates learning if it beats that floor (the v1 val
style is dominated by far backgrounds where a constant scores 0.45).

Usage: python scripts/eval_depth_ckpt.py --ckpt PATH [--skip-real]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def constant_floor(depths):
    best = 0.0
    for c in np.exp(np.linspace(np.log(0.3), np.log(9), 120)):
        r = np.maximum(depths / c, c / depths)
        best = max(best, float((r < 1.25).mean()))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--res", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--skip-real", action="store_true")
    ap.add_argument("--skip-synth", action="store_true",
                    help="real sample sets only (fast — no rendered val)")
    ap.add_argument("--val-len", type=int, default=16)
    ap.add_argument("--lens", default="lenses/rf50mm/lens_web.json")
    ap.add_argument("--psfnet", default="ckpt/rf50mm/F4_PSFNet_mlp")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU admits ONE process; "
                         "a second blocks silently until the first exits)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sdirt_tpu.dfdp.datasets import SyntheticRGBD
    from sdirt_tpu.dfdp.metrics import mask_accuracy_k, mask_mae
    from sdirt_tpu.dfdp.monitor import select_focus_dist
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_infer
    from sdirt_tpu.psfnet.surrogate import PSFNetLens
    from sdirt_tpu.utils.checkpoint import restore_inference_ckpt

    h, w = args.res
    state, _ = create_dfdp_state(jax.random.PRNGKey(0), 1e-4, 1, (1, 6, h, w))
    params, bstats = restore_inference_ckpt(args.ckpt, state.params,
                                            state.batch_stats)

    if not args.skip_synth:
        # only the synthetic styles render through the surrogate; with
        # --skip-synth the real-set path below uses dfdp_infer alone, so
        # skip the lens build + net load (ADVICE r3: keeps the flag fast)
        lens = PSFNetLens(args.lens, kernel_size=21, sensor_res=(h, w))
        lens.load_net(args.psfnet)

    for style in () if args.skip_synth else ("v1", "v2", "v3", "v4", "v5",
                                             "v6"):
        ds = SyntheticRGBD((h, w), length=args.val_len, seed=999, train=False,
                           style=style)
        accs, maes, gts = [], [], []
        near_accs, near_gts = [], []
        key = jax.random.PRNGKey(7)
        for i in range(len(ds)):
            aif, gt = ds[i]
            aif, gt = aif[None], gt[None]
            focus = select_focus_dist(gt, 1, mode="linear")
            key, sub = jax.random.split(key)
            dp = lens.render(aif, depth=-gt * 1e3, foc_dist=-focus[:, 0] * 1e3,
                             train=False, key=sub)
            pred = np.asarray(dfdp_infer(params, bstats, dp))
            mask = gt > 0
            accs.append(mask_accuracy_k(pred, gt, 1, mask))
            maes.append(mask_mae(pred, gt, mask))
            # near band: <= 3 m, where the dual-pixel disparity signal is
            # discriminable (DP disparity spans only ~0.3 px from 3 m to
            # 9 m on the rf50mm at 1 m focus — far-field per-pixel acc1 is
            # physically near-chance; DP119's scenes are mostly near-range)
            near = mask & (gt <= 3.0)
            if near.any():
                near_accs.append(mask_accuracy_k(pred, gt, 1, near))
                near_gts.append(gt[near].ravel())
            gts.append(gt.ravel())
        floor = constant_floor(np.concatenate(gts))
        if near_gts:
            nfloor = constant_floor(np.concatenate(near_gts))
            near_str = f"{np.mean(near_accs):.4f} (floor {nfloor:.3f})"
        else:
            near_str = "n/a (no pixels <= 3 m)"
        print(f"[{style}] val acc1 {np.mean(accs):.4f}  mae {np.mean(maes):.3f}"
              f"  (best-constant floor {floor:.3f})  |  near<=3m acc1 "
              f"{near_str}", flush=True)

    if args.skip_real:
        return

    from sdirt_tpu.dfdp.factory import get_depth_sample_set
    from sdirt_tpu.dfdp.datasets import DataLoader
    from sdirt_tpu.dfdp.monitor import ResultsMonitor

    cfg = {"res": (h, w),
           "real_box_sample": "./real_sample_set/box",
           "real_flat_sample": "./real_sample_set/flat",
           "real_casual_sample": "./real_sample_set/casual"}
    for ds, tag in zip(get_depth_sample_set(cfg), ("box", "f2d", "casual")):
        monitor = ResultsMonitor("dfdp")
        for imgs, gt in DataLoader(ds, batch_size=1, num_workers=2):
            pred = np.asarray(dfdp_infer(params, bstats, imgs))
            monitor.set_outputs({"gt_depth": gt, "gt_aif": None,
                                 "gt_l": imgs[:, :3], "gt_r": imgs[:, 3:],
                                 "pred_depth_est": pred})
            monitor.compute_metrics()
        m = monitor.metric_dict(len(ds))
        print(f"[real {tag}] acc1 {m['acc1']:.4f}  mae {m['mae']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
