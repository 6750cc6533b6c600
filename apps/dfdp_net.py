#!/usr/bin/env python
"""Depth-from-dual-pixel training and evaluation.

Parity source: /root/reference/2_dfdp_net.py. The reference's workflow
switches are literal exit() edits (2_dfdp_net.py:105,130 per its README);
here they are explicit stages:

  --stage sample   evaluate on the bundled real_sample_set (DP-sim fidelity
                   PSNR/SSIM on flat scenes + depth metrics on box/f2d/casual)
  --stage full     same on the full DP119 set (paths from the config)
  --stage train    train DDDNet on simulated DP pairs (NYU + FlyingThings
                   first half of epochs, NYU-only finetune after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging
import time
from datetime import datetime

import numpy as np


def config(path):
    import yaml

    with open(path) as f:
        args = yaml.safe_load(f)
    args["res"] = tuple(args["res"])
    args["lr"] = float(args["lr"])
    return args


def _render_batch(lens, aif, gt_depth, key, train=False, sharding=None):
    """Simulate the DP input stack for a batch (reference 2_dfdp_net.py:161-174).

    The reference renders item-by-item in Python; the render pipeline is
    batch-shaped (and the 4D branch ignores foc_dist, psfnet.py:683-694),
    so the whole batch goes through one jitted dispatch here (2.8x faster
    at bs=2) — per-image outputs match per-item rendering to bf16 matmul
    accumulation order (max |diff| ~2e-3 on [0,1] images).

    Host->device payload is quantized (uint8 images, f16 depth) and widened
    back on device: through the axon tunnel the f32 transfer dominates the
    step time otherwise. Returns the device-resident f32 depth too so the
    train step does not re-upload it.
    """
    import jax
    import jax.numpy as jnp

    from sdirt_tpu.dfdp.monitor import select_focus_dist

    aif_u8 = (np.asarray(aif) * 255.0 + 0.5).astype(np.uint8)
    depth_f16 = np.asarray(gt_depth).astype(np.float16)
    # With a batch sharding (data-parallel training) the uint8 uploads land
    # pre-split over the mesh, and XLA partitions the whole render program
    # along the batch — the simulation scales with the chips, not just the
    # depth-net step.
    aif_dev = jax.device_put(aif_u8, sharding).astype(jnp.float32) / 255.0
    depth_dev = jax.device_put(depth_f16, sharding).astype(jnp.float32)

    focus = select_focus_dist(gt_depth, 1, mode="linear")
    key, sub = jax.random.split(key)
    dp = lens.render(aif_dev, depth=-depth_dev * 1e3,
                     foc_dist=-focus[:, 0] * 1e3, train=train, key=sub)
    return dp, depth_dev, aif_dev, key


def test_depth(state_params, batch_stats, test_set, scene, args, epoch=0):
    """Depth metrics on a real DP set (reference 2_dfdp_net.py:234-271)."""
    from sdirt_tpu.dfdp.datasets import DataLoader
    from sdirt_tpu.dfdp.monitor import ResultsMonitor
    from sdirt_tpu.dfdp.train import dfdp_infer

    loader = DataLoader(test_set, batch_size=1, num_workers=2)
    monitor = ResultsMonitor(args["train_mode"])
    n = len(test_set)
    t_infer = 0.0
    deblur = args["train_mode"] == "deblur"
    for idx, (imgs, gt_depth) in enumerate(loader):
        t0 = time.time()
        pred = dfdp_infer(state_params, batch_stats, imgs,
                          train_mode=args["train_mode"])
        if deblur:
            pred, pred_fix, pred_aif = pred
        pred.block_until_ready()
        t_infer += time.time() - t0
        outputs = {
            "gt_depth": gt_depth, "gt_aif": None,
            "gt_l": imgs[:, :3], "gt_r": imgs[:, 3:],
            "pred_depth_est": np.asarray(pred),
        }
        if deblur:
            # real capture sets have no all-in-focus ground truth: the
            # monitor skips psnr/ssim_deblur when gt_aif is None
            outputs["pred_depth_fix"] = np.asarray(pred_fix)
            outputs["pred_aif"] = np.asarray(pred_aif)
        monitor.set_outputs(outputs)
        monitor.compute_metrics()
        if args.get("save_images"):
            monitor.save_images(f"{args['results_dir']}/tests/", scene, idx)
    logging.info(f"Test Depth Est on {scene} ({t_infer:.2f}s inference)")
    monitor.logging(epoch, n)
    if state_params is not None and args.get("save_ckpt", True):
        monitor.save_pth(args, scene, n, state_params, batch_stats)
    return monitor.metric_dict(n)


def test_dp_images(test_lens, flat_set, scene, args):
    """DP-simulation fidelity: render F/20 -> F/4 and compare to the real
    F/4 captures (reference 2_dfdp_net.py:273-344)."""
    import jax
    import pandas as pd

    from sdirt_tpu.dfdp.datasets import DataLoader
    from sdirt_tpu.dfdp.metrics import mask_psnr, mask_ssim
    from sdirt_tpu.dfdp.monitor import select_focus_dist
    from sdirt_tpu.dfdp.perceptual import batch_perceptual

    loader = DataLoader(flat_set, batch_size=1, num_workers=2)
    result_dir = f"{args['results_dir']}/DPimages/"
    os.makedirs(result_dir, exist_ok=True)
    records = []
    key = jax.random.PRNGKey(0)
    for idx, (f4_img, f20_img, depth) in enumerate(loader):
        focus = select_focus_dist(depth, args["n_stack"], mode="linear")
        f4_l, f4_r = f4_img[:, :3], f4_img[:, 3:]
        f20_l, f20_r = f20_img[:, :3], f20_img[:, 3:]

        key, k1, k2 = jax.random.split(key, 3)
        dof_l = np.asarray(test_lens.render(f20_l, depth=-depth * 1e3,
                                            foc_dist=-focus[:, 0] * 1e3, key=k1))[:, :3]
        dof_r = np.asarray(test_lens.render(f20_r, depth=-depth * 1e3,
                                            foc_dist=-focus[:, 0] * 1e3, key=k2))[:, 3:]

        res = [idx, round(float(depth[0, 0, 0, 0] * 1e3)),
               mask_psnr(dof_l, f4_l), mask_psnr(dof_r, f4_r),
               mask_ssim(dof_l, f4_l), mask_ssim(dof_r, f4_r),
               # weight-free perceptual distance (LPIPS stand-in; lower=better)
               round(batch_perceptual(dof_l, np.asarray(f4_l)), 5),
               round(batch_perceptual(dof_r, np.asarray(f4_r)), 5)]
        records.append(res)
        logging.info(f"[idx, depth (mm), psnr_l, psnr_r, ssim_l, ssim_r, "
                     f"perc_l, perc_r] : {res}")

    df = pd.DataFrame(records, columns=["idx", "distance", "psnr_l", "psnr_r",
                                        "ssim_l", "ssim_r", "perc_l", "perc_r"])
    try:
        df.to_excel(f"{result_dir}/res.xlsx", index=False)
    except ImportError:
        # xlsx writer not installed in this image; CSV carries the same table
        df.to_csv(f"{result_dir}/res.csv", index=False)
    avg = df[["psnr_l", "psnr_r", "ssim_l", "ssim_r"]].mean().to_numpy()
    logging.info(f"Test DP Images on {scene}")
    logging.info(f"Avg [psnr_l, psnr_r, ssim_l, ssim_r]: {avg}")
    return avg


def validate(state, test_lens, valid_set, scene, args, epoch=0):
    """Synthetic-set validation with on-the-fly rendering
    (reference 2_dfdp_net.py:187-231)."""
    import jax

    from sdirt_tpu.dfdp.datasets import DataLoader
    from sdirt_tpu.dfdp.monitor import ResultsMonitor
    from sdirt_tpu.dfdp.train import dfdp_infer

    loader = DataLoader(valid_set, batch_size=1, num_workers=2)
    monitor = ResultsMonitor(args["train_mode"])
    key = jax.random.PRNGKey(7)
    n = len(valid_set)
    deblur = args["train_mode"] == "deblur"
    for idx, (aif, gt_depth) in enumerate(loader):
        stack, _, _, key = _render_batch(test_lens, aif, gt_depth, key,
                                         train=False)
        if len(jax.tree.leaves(state.params)[0].devices()) > 1:
            # host round-trip so inference follows the params' placement
            # (mesh-replicated train state vs single-device rendered stack);
            # single-chip runs skip the sync + double copy
            stack = np.asarray(stack)
        pred = dfdp_infer(state.params, state.batch_stats, stack,
                          train_mode=args["train_mode"])
        if deblur:
            pred, pred_fix, pred_aif = pred
        outputs = {
            "gt_depth": gt_depth, "gt_aif": aif,
            "rt_render_l": np.asarray(stack)[:, :3],
            "rt_render_r": np.asarray(stack)[:, 3:],
            "pred_depth_est": np.asarray(pred),
        }
        if deblur:
            outputs["pred_depth_fix"] = np.asarray(pred_fix)
            outputs["pred_aif"] = np.asarray(pred_aif)
        monitor.set_outputs(outputs)
        monitor.compute_metrics()
        if args.get("save_images"):
            monitor.save_images(f"{args['results_dir']}/results/", scene, idx)
    logging.info(f"Validate Depth Est on {scene}")
    monitor.logging(epoch, n)
    monitor.save_pth(args, scene, n, state.params, state.batch_stats)
    return monitor.metric_dict(n)


def train(args):
    import jax

    # Arm the lost-RPC watchdog BEFORE the first device touch. The 08-20
    # tunnel outage froze a fresh trainer during setup (zero CPU, every
    # thread futex-parked, nothing past the backend banner) — ahead of the
    # old arming point at the epoch loop, so nothing tripped the supervised
    # relaunch and the hang ran to the queue step's 4 h cap. Setup on an
    # idle host is ~2.5 min; the 1800 s default bounds even a loaded first
    # compile.
    from sdirt_tpu.utils.stall import StallWatchdog

    wd = StallWatchdog(timeout_s=float(args.get("stall_timeout_s", 1800)))

    from sdirt_tpu.dfdp.factory import (get_dataset, get_depth_test_set,
                                        get_flat_test_set, get_lens)
    from sdirt_tpu.dfdp.datasets import DataLoader
    from sdirt_tpu.dfdp.train import create_dfdp_state, dfdp_train_step

    # Data-parallel training over however many chips are visible: batch
    # shards over the mesh 'data' axis, BatchNorm reductions and gradient
    # all-reduces become XLA collectives over ICI (parallel/steps.py). The
    # reference scaffolds-but-disables DDP (2_dfdp_net.py:11-13).
    sharded_step, dp_mesh = None, None
    if args.get("data_parallel"):
        n_dev, bs = jax.device_count(), args["bs"]
        n_data = max(d for d in range(1, min(n_dev, bs) + 1) if bs % d == 0)
        if n_data > 1:
            from sdirt_tpu.parallel.mesh import make_mesh
            from sdirt_tpu.parallel.steps import make_sharded_dfdp_step

            dp_mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
            sharded_step = make_sharded_dfdp_step(dp_mesh, args["train_mode"])
            logging.info(f"data-parallel training over {n_data} devices")
        else:
            logging.info("data_parallel requested but only one usable "
                         "device; running single-chip")

    train_lens, test_lens = get_lens(args)
    wd.beat()  # setup milestone (ADVICE r4): lens built
    nyu_fs_train, nyu_train, val_set = get_dataset(args)
    wd.beat()  # setup milestone: dataset loaded
    print(f"Totally {len(nyu_fs_train)} images for training, "
          f"{len(val_set)} images for test.")

    h, w = args["res"]
    # Reference parity: T_max = epochs * len(dataset) (2_dfdp_net.py:119)
    # while the scheduler steps once per BATCH, so the cosine never gets past
    # 1/bs of its period and the LR barely anneals. anneal_over_steps: True
    # (synthetic configs) uses the true optimizer-step count instead so the
    # LR reaches ~0 by the end — markedly more stable late training.
    if args.get("anneal_over_steps"):
        total_steps = args["epochs"] * (len(nyu_fs_train) // args["bs"])
    else:
        total_steps = args["epochs"] * len(nyu_fs_train)
    # multi-focus stack configs render V views -> a 6V-channel input; the
    # net's view count is carried entirely by the input shape (basenet.py)
    n_views = getattr(train_lens, "n_views", 1)
    state, _ = create_dfdp_state(jax.random.PRNGKey(0), args["lr"], total_steps,
                                 (1, 6 * n_views, h, w), args["train_mode"])
    if args["train"].get("dfdpnet_pretrained") and \
            os.path.exists(args["train"]["dfdpnet_pretrained"]):
        from sdirt_tpu.utils.checkpoint import restore_inference_ckpt

        params, batch_stats = restore_inference_ckpt(
            args["train"]["dfdpnet_pretrained"], state.params,
            state.batch_stats)
        state = state.replace(params=params, batch_stats=batch_stats)

    if dp_mesh is not None:
        # replicate the train state and the PSF surrogate's weights over the
        # mesh so the batch shardings are the only partitioning XLA has to
        # solve (committed single-device leaves would conflict otherwise)
        from sdirt_tpu.parallel.mesh import replicated

        state = jax.device_put(state, replicated(dp_mesh))
        train_lens.params = jax.device_put(train_lens.params,
                                           replicated(dp_mesh))

    flat_set = get_flat_test_set(args)
    box_set, f2d_set, casual_set = get_depth_test_set(args)

    # Shipped-checkpoint policy: track the PEAK validation acc1 and export
    # those params to a stable path (config 'ckpt_out'), so the published
    # checkpoint is the best epoch, not the last.
    ckpt_out = args.get("ckpt_out")
    best_acc1 = -1.0
    wd.beat()  # setup milestone: model state created / pretrained restored

    # Crash-safe training: full train state (params + optimizer + step) is
    # checkpointed after every epoch and auto-restored on restart, so a
    # multi-hour run survives preemption. The reference has no equivalent
    # (weight-only pickles, no optimizer state — dfdp/utils.py:229-235).
    resume_epoch, tc = 0, None
    state_dir = args.get("train_state_dir")
    if state_dir:
        import json

        from sdirt_tpu.utils.checkpoint import TrainCheckpointer

        tc = TrainCheckpointer(state_dir,
                               max_to_keep=args.get("train_state_keep", 2))
        restored, step = tc.restore_latest(state)
        if restored is not None:
            state, resume_epoch = restored, int(step)
            side = os.path.join(state_dir, "train_meta.json")
            if os.path.exists(side):
                try:
                    with open(side) as f:
                        best_acc1 = json.load(f).get("best_acc1", -1.0)
                except (json.JSONDecodeError, OSError):
                    logging.warning("train_meta.json unreadable; best-acc1 "
                                    "watermark resets (peak ckpt may be "
                                    "re-exported)")
            logging.info(f"resumed train state at epoch {resume_epoch} "
                         f"(best val acc1 so far {best_acc1:.4f})")

    # Watermark hardening (the 2026-08-20 outage, VERDICT r4): if the
    # resumable train state was lost but a banked export survives, a fresh
    # watermark would let epoch-0 validation clobber the banked peak. Seed
    # from the export's own sidecar so a restart can never overwrite a
    # better artifact (retired scripts/r4j_v6_guard.py, the after-the-fact
    # restore this replaces).
    if ckpt_out:
        from sdirt_tpu.utils.checkpoint import read_ckpt_watermark

        banked = read_ckpt_watermark(ckpt_out)
        if banked is not None and banked > best_acc1:
            best_acc1 = banked
            logging.info(f"seeded best-acc1 watermark {best_acc1:.4f} from "
                         f"banked checkpoint {ckpt_out}")

    def write_meta():
        # atomic (tmp + rename): a preemption mid-write must not corrupt
        # the watermark the resume path depends on
        if not state_dir:
            return
        import json

        tmp = os.path.join(state_dir, "train_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"best_acc1": best_acc1}, f)
        os.replace(tmp, os.path.join(state_dir, "train_meta.json"))

    # Two observed hangs on this rig were lost TPU-tunnel RPCs right after a
    # checkpoint D2H burst: zero CPU, every thread futex-parked, forever.
    # The watchdog (armed at the top of train()) dumps all stacks and exits
    # STALL_EXIT_CODE; the epoch-checkpointed state then resumes under
    # run_train_supervised.sh. Setup is done — reset the idle clock.
    wd.beat()

    for epoch in range(resume_epoch, args["epochs"] + 1):
        # epoch-keyed RNG: deterministic and identical whether or not the
        # run was interrupted and resumed mid-way
        key = jax.random.fold_in(jax.random.PRNGKey(1), epoch)
        wd.beat()
        val_metrics = validate(state, test_lens, val_set, "fs", args, epoch)
        wd.beat()
        if n_views == 1:
            test_depth(state.params, state.batch_stats, box_set, "box", args,
                       epoch)
        elif epoch == resume_epoch:
            logging.info("multi-focus stack net: real-capture eval skipped "
                         "(bundled sets are single-focus 1 m captures)")
        wd.beat()
        if ckpt_out and val_metrics["acc1"] > best_acc1:
            best_acc1 = val_metrics["acc1"]
            from sdirt_tpu.utils.checkpoint import (save_inference_ckpt,
                                                    write_ckpt_watermark)

            # params + BN running stats: BN runs on running averages at
            # inference, so exporting params alone ships a broken net
            save_inference_ckpt(ckpt_out, state.params, state.batch_stats)
            write_ckpt_watermark(ckpt_out, best_acc1)
            # persist the watermark at the moment it moves, so a crash
            # between now and the post-epoch state save can't resume with a
            # stale best and overwrite the exported peak with worse params
            write_meta()
            logging.info(f"ckpt_out: saved epoch {epoch} "
                         f"(val acc1 {best_acc1:.4f}) -> {ckpt_out}")
        logging.info("")
        if epoch == args["epochs"]:
            break

        dataset = nyu_fs_train if epoch <= args["epochs"] // 2 else nyu_train
        loader = DataLoader(dataset, batch_size=args["bs"], shuffle=True,
                            num_workers=4, drop_last=True, seed=epoch)
        epoch_loss, n_steps, t0 = 0.0, 0, time.time()
        pending = []   # device-side losses; pulled in blocks so the next
        # batch's host->device transfer overlaps the current compute

        def drain():
            nonlocal epoch_loss
            for dev_loss in pending:
                loss = float(dev_loss)
                assert np.isfinite(loss), loss
                epoch_loss += loss
            pending.clear()
            wd.beat()   # a host pull completed -> the device pipeline is live

        batch_sharding = None
        if dp_mesh is not None:
            from sdirt_tpu.parallel.mesh import data_sharded

            batch_sharding = data_sharded(dp_mesh)
        for aif, gt_depth in loader:
            stack, depth_dev, aif_dev, key = _render_batch(
                train_lens, aif, gt_depth, key, train=True,
                sharding=batch_sharding)
            gt_aif = aif_dev if args["train_mode"] == "deblur" else None
            if sharded_step is not None:
                state, losses = sharded_step(state, stack, depth_dev, gt_aif)
            else:
                state, losses = dfdp_train_step(state, stack, depth_dev,
                                                gt_aif=gt_aif,
                                                train_mode=args["train_mode"])
            pending.append(losses["total"])
            n_steps += 1
            if len(pending) >= 8:
                drain()
        drain()
        logging.info(f"Epoch {epoch}: train loss {epoch_loss / max(n_steps, 1):.4f} "
                     f"({n_steps} steps, {time.time() - t0:.1f}s)")
        wd.beat()
        if tc is not None:
            tc.save(epoch + 1, state)
            tc.wait()
            write_meta()
            wd.beat()
            # Leak watchdog: the TPU tunnel runtime retains the host staging
            # buffers of per-step device_put uploads (~8 MB/step here), so a
            # multi-hour run is OOM-killed around 30 epochs on a 128 GB host.
            # The train state was just checkpointed, so re-exec'ing this
            # process reclaims every leaked buffer and resumes at epoch+1
            # for the cost of one jit recompile (~3 min).
            from sdirt_tpu.utils.logging import host_rss_gb

            rss = host_rss_gb()
            logging.info(f"host RSS {rss:.1f} GiB")
            # Default 48 GiB: beyond ~65 GiB the leak also doubles epoch
            # times (memory-pressure stalls), and one run hung outright at
            # 110 GiB mid-epoch before the boundary check could fire.
            if rss > float(args.get("max_rss_gb", 48)):
                logging.warning(
                    f"host RSS {rss:.1f} GiB exceeds max_rss_gb="
                    f"{args.get('max_rss_gb', 48)} — re-exec to reclaim "
                    f"leaked transfer buffers; auto-resume at epoch {epoch + 1}")
                tc.close()
                logging.shutdown()
                try:
                    os.execv(sys.executable, [sys.executable] + sys.argv)
                except OSError as e:
                    # logging is already shut down — re-init so the failure
                    # is visible in the log instead of dying silently.
                    logging.basicConfig(level=logging.INFO)
                    logging.error(f"watchdog re-exec failed: {e}; "
                                  f"continuing in-process")
    wd.close()
    if tc is not None:
        tc.close()
    return state


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/dfdp_by_sdirt_rf50mm.yml")
    ap.add_argument("--stage", choices=("sample", "full", "train"),
                    default="sample")
    ap.add_argument("--save-images", action="store_true")
    ap.add_argument("--train-mode", choices=("dfdp", "deblur"), default="dfdp",
                    help="'deblur' adds the Mydeblur refinement head and its "
                         "depth_fix/aif loss terms (the reference selects "
                         "this by editing 2_dfdp_net.py:59)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard training batches over all visible devices "
                         "(largest divisor of bs <= device count)")
    args_cli = ap.parse_args()

    if args_cli.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sdirt_tpu.utils.logging import set_logger, set_seed

    args = config(args_cli.config)
    result_dir = "./results/" + datetime.now().strftime("%m%d-%H%M%S") + "-Sdirt_dev"
    os.makedirs(result_dir, exist_ok=True)
    args["results_dir"] = result_dir
    args["train_mode"] = args_cli.train_mode
    args["save_images"] = args_cli.save_images
    args["data_parallel"] = args_cli.data_parallel or args.get("data_parallel", False)
    set_logger(result_dir)
    set_seed(123456)
    logging.info(f"Result folder: {result_dir}")

    if args_cli.stage == "train":
        train(args)
        return

    from sdirt_tpu.dfdp.factory import (get_depth_sample_set,
                                        get_depth_test_set,
                                        get_flat_sample_set,
                                        get_flat_test_set, get_lens)

    _, test_lens = get_lens(args)
    if args_cli.stage == "sample":
        flat = get_flat_sample_set(args)
        box, f2d, casual = get_depth_sample_set(args)
        tags = ("flatSample", "boxSample", "f2dSample", "casualSample")
    else:
        flat = get_flat_test_set(args)
        box, f2d, casual = get_depth_test_set(args)
        tags = ("flat", "box", "f2d", "casual")

    test_dp_images(test_lens, flat, tags[0], args)

    # Depth evaluation needs a trained DfDP net
    import jax

    from sdirt_tpu.dfdp.train import create_dfdp_state

    h, w = args["res"]
    n_views = getattr(test_lens, "n_views", 1)
    state, _ = create_dfdp_state(jax.random.PRNGKey(0), args["lr"], 1,
                                 (1, 6 * n_views, h, w), args["train_mode"])
    params, batch_stats = state.params, state.batch_stats
    ckpt = args["train"].get("dfdpnet_pretrained")
    if ckpt and os.path.exists(ckpt):
        from sdirt_tpu.utils.checkpoint import restore_inference_ckpt

        params, batch_stats = restore_inference_ckpt(ckpt, params, batch_stats)
        untrained = ""
    else:
        # Make it impossible to mistake random-weight output for results:
        # every depth-metric line below carries the UNTRAINED tag.
        untrained = "-UNTRAINED(no ckpt)"
        logging.warning("No pretrained DfDP checkpoint found - depth metrics "
                        "below come from an UNTRAINED net and are meaningless "
                        "(DP-image fidelity above is checkpoint-free). Train "
                        "one with --stage train or set train.dfdpnet_pretrained.")
    args["save_ckpt"] = False
    for ds, tag in ((box, tags[1]), (f2d, tags[2]), (casual, tags[3])):
        test_depth(params, batch_stats, ds, tag + untrained, args)


if __name__ == "__main__":
    main()
