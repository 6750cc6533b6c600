"""Full training-state checkpoint/resume.

The reference only pickles network weights with no optimizer state or step
counter (SURVEY §5 checkpoint row; psfnet.py:153,167, dfdp/utils.py:229-235).
Here the complete train state (params, optimizer state, step) goes through an
orbax CheckpointManager with retention, so training resumes exactly.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


SCHEMA_VERSION = 1


def _watermark_path(path: str) -> str:
    # Sidecar NEXT TO the orbax directory, not inside it: orbax owns the
    # dir's contents and a foreign file would break its atomic-rename dance.
    return os.path.abspath(path) + ".meta.json"


def write_ckpt_watermark(path: str, best_acc1: float) -> None:
    """Record the validation metric an exported checkpoint was banked at.

    Atomic (tmp + rename). The trainer seeds its best-acc watermark from
    this at startup, so a restart whose resumable train state was lost (the
    2026-08-20 outage) can never re-export a worse net over a banked peak.
    """
    import json

    sidecar = _watermark_path(path)
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"best_acc1": float(best_acc1)}, f)
    os.replace(tmp, sidecar)


def read_ckpt_watermark(path: str):
    """best_acc1 the checkpoint at `path` was exported with, or None.

    None when the sidecar is absent (pre-hardening checkpoints) or
    unreadable — callers fall back to their own watermark.
    """
    import json

    try:
        with open(_watermark_path(path)) as f:
            return float(json.load(f)["best_acc1"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def save_inference_ckpt(path: str, params, batch_stats) -> None:
    """Export an inference checkpoint: params AND BatchNorm running stats.

    The DfDP nets run BatchNorm with use_running_average=True at inference
    (models/layers.py), so a checkpoint holding only params produces garbage
    predictions when paired with freshly-initialized running stats. The
    reference's torch state_dict always carries running_mean/var
    (reference dfdp/utils.py:223-235); this is the JAX equivalent.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {"params": params, "batch_stats": batch_stats}, force=True)
    ckptr.wait_until_finished()


def restore_inference_ckpt(path: str, params_template, batch_stats_template):
    """Restore (params, batch_stats) from an inference checkpoint.

    Accepts the combined {params, batch_stats} layout written by
    save_inference_ckpt; falls back to the legacy params-only layout with a
    loud warning, because BN inference with init running stats is garbage
    (mean 0 / var 1 instead of the trained activation statistics).
    """
    import logging

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    # Decide the layout from the checkpoint's own saved structure instead of
    # try/except, so a genuinely corrupt/mismatched checkpoint surfaces its
    # real error rather than a confusing fallback-template mismatch.
    try:
        saved_keys = set(ckptr.metadata(path).item_metadata.keys())
    except Exception:
        saved_keys = None  # metadata unreadable -> let restore() report it
    if saved_keys is not None and "batch_stats" not in saved_keys:
        params = ckptr.restore(path, params_template)
        logging.warning(
            "%s is a legacy params-only checkpoint (no batch_stats): BN "
            "running stats fall back to init values and depth predictions "
            "will be meaningless. Re-export with save_inference_ckpt.", path)
        return params, batch_stats_template
    out = ckptr.restore(path, {"params": params_template,
                               "batch_stats": batch_stats_template})
    return out["params"], out["batch_stats"]


class TrainCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.mngr = ocp.CheckpointManager(
            self.directory, options=options,
            metadata={"schema_version": SCHEMA_VERSION})

    def save(self, step: int, state) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state):
        """Restore the newest checkpoint into the given state template, or
        return None if the directory has none. Refuses checkpoints written
        by a newer schema than this code understands."""
        step = self.mngr.latest_step()
        if step is None:
            return None, None
        meta = self.mngr.metadata() or {}
        custom = getattr(meta, "custom_metadata", None) or \
            (meta.get("custom_metadata") if isinstance(meta, dict) else None) or {}
        version = custom.get("schema_version", meta.get("schema_version", 0)
                             if isinstance(meta, dict) else 0)
        if version and version > SCHEMA_VERSION:
            raise ValueError(
                f"checkpoint schema v{version} in {self.directory} is newer "
                f"than this build (v{SCHEMA_VERSION}); upgrade the code or "
                "refit")
        state = self.mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return state, step

    def wait(self):
        self.mngr.wait_until_finished()

    def close(self):
        self.mngr.close()
