"""Config-driven construction of lenses and dataset mixes.

Parity source: /root/reference/dfdp/factory.py. The dataset mix is NYU +
2x FlyingThings for the first half of training, NYU-only for finetuning
(factory.py:58-61).
"""

from __future__ import annotations

from .datasets import (CanonCasualSet, CanonDepthSet, CanonFlat2DepthSet,
                       CanonFlatSet, ConcatDataset, FlyingThings3D,
                       Middlebury, MiddleburyFS, NYUData, SyntheticRGBD)


def get_lens(args):
    from ..psfnet.surrogate import PSFNetLens
    from ..psfnet.thinlens import ThinLens

    ks = args["ks"]
    sensor_res = args["res"]

    def build(cfg):
        if cfg["lens"] == "thinlens":
            return ThinLens(foc_len=cfg["foc_len"], fnum=cfg["fnum"],
                            kernel_size=ks,
                            sensor_size=[float(i) for i in cfg["sensor_size"]],
                            sensor_res=sensor_res)
        if cfg.get("stack"):
            # multi-focus stack (psfnet/stack.py): a list of per-view
            # sub-configs, each naming its surrogate checkpoint and focus.
            # Unlisted keys (lens file, fnum, model) inherit from cfg.
            from ..psfnet.stack import FocalStackLens

            subs = []
            for sub in cfg["stack"]:
                merged = {k: v for k, v in cfg.items() if k != "stack"}
                merged.update(sub)
                subs.append(build(merged))
            return FocalStackLens(subs)
        lens = PSFNetLens(filename=cfg["lens"], sensor_res=sensor_res,
                          kernel_size=ks,
                          model_name=cfg.get("psfnet_model", "mlp"))
        if cfg.get("fnum"):
            # wide-aperture configs (reference 1_fit_psfnet.py:20 pairs
            # F/1.8 with ks=35): re-stop the pupil so the surrogate's
            # query geometry matches the F/1.8 fit it loads
            lens.set_aperture(fnum=float(cfg["fnum"]))
        if cfg.get("focus_mm"):
            # reproduce the fit-time geometry of a surrogate fitted at a
            # non-default focus (apps/fit_psfnet.py --focus-mm): same
            # order as the fit — set_aperture, then refocus
            lens.refocus(float(cfg["focus_mm"]) + lens.d_sensor)
            lens.set_focus_prior(float(cfg["focus_mm"]))
        if cfg.get("psfnet_path"):
            import os

            if os.path.exists(cfg["psfnet_path"]):
                lens.load_net(cfg["psfnet_path"])
        return lens

    return build(args["train"]), build(args["test"])


def get_dataset(args):
    res = args["res"]
    name = args["train"]["dataset"]
    if name == "FlyingThings3D":
        train_set = FlyingThings3D(args["FlyingThings3D_train"], resize=res)
    elif name == "NYUdata":
        train_set = NYUData(args["NYUdata_train"], resize=res)
    elif name == "Synthetic":
        train_set = SyntheticRGBD(resize=res, length=args.get("synthetic_len", 64),
                                  style=args.get("synthetic_style", "v1"))
    else:
        raise NotImplementedError(name)

    tname = args["test"]["dataset"]
    if tname == "Middlebury2014":
        test_set = Middlebury(args["Middlebury2014_val"], resize=res, train=False)
    elif tname == "Middlebury2021":
        test_set = Middlebury(args["Middlebury2021_val"], resize=res, train=False)
    elif tname == "Middlebury_FS":
        test_set = MiddleburyFS(args["Middlebury_FS"], resize=res, train=False)
    elif tname == "FlyingThings3D":
        test_set = FlyingThings3D(args["FlyingThings3D_test"], resize=res, train=False)
    elif tname == "NYUdata":
        test_set = NYUData(args["NYUdata_test"], resize=res, train=False)
    elif tname == "Synthetic":
        test_set = SyntheticRGBD(resize=res, length=args.get("synthetic_val_len", 4),
                                 seed=999, train=False,
                                 style=args.get("synthetic_style", "v1"))
    else:
        raise NotImplementedError(tname)

    if name == "Synthetic":
        # synthetic mode has no FlyingThings mix
        return ConcatDataset(train_set), ConcatDataset(train_set), test_set
    fly = FlyingThings3D(args["FlyingThings3D_train"], resize=res)
    nyu_fs_train = ConcatDataset(train_set, fly, fly)
    nyu_train = ConcatDataset(train_set, train_set)
    return nyu_fs_train, nyu_train, test_set


def get_depth_test_set(args):
    res = args["res"]
    return (CanonDepthSet(args["real_box_test"], resize=res),
            CanonFlat2DepthSet(args["real_flat_test"], resize=res),
            CanonCasualSet(args["real_casual_test"], resize=res))


def get_flat_test_set(args):
    return CanonFlatSet(args["real_flat_test"], resize=args["res"])


def get_depth_sample_set(args):
    res = args["res"]
    return (CanonDepthSet(args["real_box_sample"], resize=res),
            CanonFlat2DepthSet(args["real_flat_sample"], resize=res),
            CanonCasualSet(args["real_casual_sample"], resize=res))


def get_flat_sample_set(args):
    return CanonFlatSet(args["real_flat_sample"], resize=args["res"])
