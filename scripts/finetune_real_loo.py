#!/usr/bin/env python
"""Leave-one-scene-out fine-tuning of a DfDP checkpoint on the bundled
real capture sets (box / f2d / casual).

Motivation (BACKLOG round-5 candidates): if synthetic-composition realism
is exhausted, the next honest lever for real-scene accuracy is
fine-tuning on in-domain captures. With only 19 real scenes bundled
(box 5, f2d 2, casual 12) a train/test split is impossible, so this uses
leave-one-scene-out: for every scene, fine-tune on the other 18 and
evaluate ONLY the held-out scene with the fine-tuned net. Per-set
aggregates over held-out predictions are then honest estimates of what a
real-capture fine-tune buys — no scene is ever evaluated by a net that
saw it.

Reference context: LinYark/Sdirt trains on DP119's train split and
reports on its test split (2_dfdp_net.py:133-185); DP119 is not bundled
in this container, so this protocol is the closest honest analogue on
the data that IS bundled.

DP-aware augmentation: the reference's auto_augment (dataset.py:246-306)
flips BEFORE DP rendering, so view geometry is untouched. Here the DP
pair is already captured, so a horizontal flip must also SWAP the l/r
views: mirroring the scene turns the left-half-aperture image into the
mirrored right-half-aperture image. Vertical flips and photometric jitter
(applied identically to both views) are geometry-safe.

Usage:
  python scripts/finetune_real_loo.py --ckpt ckpt/rf50mm/Sdirt_best_acc1 \
      [--steps 300] [--lr 2e-5] [--batch 2] [--holdout-set]
--holdout-set switches to the stricter protocol: hold out an entire SET,
fine-tune on the other two sets only (cross-set generalization).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_all_scenes(res):
    """Pre-load every bundled real scene as (set_tag, img[6,H,W], d[1,H,W])."""
    from sdirt_tpu.dfdp.factory import get_depth_sample_set

    cfg = {"res": tuple(res),
           "real_box_sample": "./real_sample_set/box",
           "real_flat_sample": "./real_sample_set/flat",
           "real_casual_sample": "./real_sample_set/casual"}
    scenes = []
    for ds, tag in zip(get_depth_sample_set(cfg), ("box", "f2d", "casual")):
        for i in range(len(ds)):
            img, depth = ds[i]
            scenes.append((tag, img.astype(np.float32),
                           depth.astype(np.float32)))
    return scenes


def hflip_dp(img, depth):
    """Horizontal flip of a CAPTURED DP pair (img CHW stacked [l;r]).

    Mirroring the scene turns the left-half-aperture view into the
    mirrored right-half-aperture view, so the views must swap. An
    involution: applying it twice is the identity.
    """
    img = np.flip(img, 2)
    img = np.concatenate([img[3:], img[:3]], 0)
    return img, np.flip(depth, 2)


def augment(img, depth, rng):
    """DP-aware photometric + flip augmentation (CHW, img stacked [l;r])."""
    if rng.random() > 0.5:
        contrast = rng.uniform(0.75, 1.25)
        brightness = rng.uniform(-0.25, 0.25)
        img = np.clip(contrast * img + brightness, 0.0, 1.0)
    if rng.random() > 0.5:
        gamma = rng.uniform(1, 2) if rng.random() > 0.5 else rng.uniform(0.5, 1)
        img = img ** gamma
    if rng.random() > 0.5:                      # vertical flip: geometry-safe
        img, depth = np.flip(img, 1), np.flip(depth, 1)
    if rng.random() > 0.5:                      # horizontal flip: swap l<->r
        img, depth = hflip_dp(img, depth)
    return np.ascontiguousarray(img), np.ascontiguousarray(depth)


def finetune(base_params, base_bstats, train_scenes, args, seed):
    import jax
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_train_step

    h, w = args.res
    state, _ = create_dfdp_state(jax.random.PRNGKey(seed), args.lr,
                                 args.steps, (args.batch, 6, h, w))
    state = state.replace(params=base_params, batch_stats=base_bstats)
    rng = np.random.default_rng(seed)
    for _ in range(args.steps):
        idx = rng.choice(len(train_scenes), size=args.batch,
                         replace=len(train_scenes) < args.batch)
        imgs, gts = [], []
        for j in idx:
            img, d = augment(train_scenes[j][1], train_scenes[j][2], rng)
            imgs.append(img)
            gts.append(d)
        state, _ = dfdp_train_step(state, np.stack(imgs), np.stack(gts))
    return state.params, state.batch_stats


def eval_scene(params, bstats, img, depth):
    import numpy as np
    from sdirt_tpu.dfdp.metrics import mask_accuracy_k, mask_mae
    from sdirt_tpu.dfdp.train import dfdp_infer

    pred = np.asarray(dfdp_infer(params, bstats, img[None]))
    mask = depth[None] > 0
    return (float(mask_accuracy_k(pred, depth[None], 1, mask)),
            float(mask_mae(pred, depth[None], mask)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--res", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--holdout-set", action="store_true",
                    help="hold out a whole set instead of one scene")
    ap.add_argument("--sets", nargs="*", default=["box", "f2d", "casual"],
                    help="restrict which sets provide held-out folds "
                         "(training always uses every non-held-out scene)")
    ap.add_argument("--save-all-ckpt", default=None,
                    help="additionally fine-tune on ALL 19 scenes and save "
                         "params here (ship with LOO-estimated metrics)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU admits ONE process; "
                         "a second blocks silently until the first exits)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from sdirt_tpu.dfdp.train import create_dfdp_state
    from sdirt_tpu.utils.checkpoint import restore_inference_ckpt

    h, w = args.res
    state, _ = create_dfdp_state(jax.random.PRNGKey(0), args.lr, 1,
                                 (1, 6, h, w))
    base_params, base_bstats = restore_inference_ckpt(
        args.ckpt, state.params, state.batch_stats)
    del state
    # dfdp_train_step donates its state arg: materialize the base tree as
    # host numpy so every fold hands the step a FRESH device buffer
    # (otherwise fold 2 would pass buffers fold 1 already donated)
    base_params = jax.tree.map(np.asarray, base_params)
    base_bstats = jax.tree.map(np.asarray, base_bstats)

    scenes = load_all_scenes(args.res)
    print(f"loaded {len(scenes)} real scenes "
          f"({', '.join(t for t, _, _ in scenes)})", flush=True)

    # zero-shot baseline per scene (same numbers eval_depth_ckpt aggregates)
    base = [eval_scene(base_params, base_bstats, img, d)
            for _, img, d in scenes]

    if args.holdout_set:
        folds = [[i for i, s in enumerate(scenes) if s[0] == tag]
                 for tag in args.sets]
    else:
        folds = [[i] for i, s in enumerate(scenes) if s[0] in args.sets]

    results = {}  # scene idx -> (acc1, mae) with its held-out net
    for fold in folds:
        train_scenes = [s for i, s in enumerate(scenes) if i not in fold]
        t0 = time.time()
        params, bstats = finetune(base_params, base_bstats, train_scenes,
                                  args, seed=fold[0])
        for i in fold:
            tag, img, d = scenes[i]
            acc, mae = eval_scene(params, bstats, img, d)
            results[i] = (acc, mae)
            print(f"[fold {tag}/{i}] held-out acc1 {acc:.4f} mae {mae:.3f} "
                  f"(zero-shot {base[i][0]:.4f}/{base[i][1]:.3f}) "
                  f"[{time.time() - t0:.0f}s]", flush=True)

    for tag in args.sets:
        idxs = [i for i, s in enumerate(scenes) if s[0] == tag]
        if not idxs or any(i not in results for i in idxs):
            continue
        ft_acc = float(np.mean([results[i][0] for i in idxs]))
        ft_mae = float(np.mean([results[i][1] for i in idxs]))
        zs_acc = float(np.mean([base[i][0] for i in idxs]))
        zs_mae = float(np.mean([base[i][1] for i in idxs]))
        print(f"[loo {tag}] acc1 {ft_acc:.4f} mae {ft_mae:.3f}  "
              f"(zero-shot acc1 {zs_acc:.4f} mae {zs_mae:.3f})", flush=True)
        print(json.dumps({"metric": f"loo_{tag}_acc1", "value": ft_acc,
                          "zero_shot": zs_acc, "mae": ft_mae,
                          "steps": args.steps, "lr": args.lr}), flush=True)

    if args.save_all_ckpt:
        from sdirt_tpu.utils.checkpoint import save_inference_ckpt

        params, bstats = finetune(base_params, base_bstats, scenes, args,
                                  seed=1234)
        save_inference_ckpt(args.save_all_ckpt, params, bstats)
        print(f"saved all-scenes fine-tune -> {args.save_all_ckpt} "
              f"(report the LOO numbers above as its honest estimate)",
              flush=True)


if __name__ == "__main__":
    main()
