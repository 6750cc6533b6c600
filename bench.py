#!/usr/bin/env python
"""North-star benchmarks: DP PSF trace-and-splat throughput + DP render rate.

Two metrics, one JSON line each (primary metric printed LAST):

1. dp_image_pairs_per_sec — full DP image formation at the production shape
   (512x768, ks 21: per-pixel MLP PSF prediction for both views, degamma,
   441-tap spatially-varying DP convolution, gamma, clip), reference path
   /root/reference/deeplens/psfnet.py:644-714. Measured with MARGINAL-dispatch
   timing: time N1 and N2 pipelined dispatches (one host pull at the end of
   each batch) and divide the difference — the only method that cancels this
   TPU tunnel's large variable per-dispatch overhead (block_until_ready does
   not truly sync here).

2. dp_psf_trace_and_splat_rays_per_sec_per_chip — rf50mm (12 surfaces),
   production PSF-fit batch: 64 field points x 20,000 pupil rays + 2,048
   chief rays per point, ks=21, full pipeline (sample -> trace -> chief
   centering -> DP splat -> normalize) fused in one XLA program on one chip.
   The timing loop runs ON DEVICE (lax.scan, scalar carry); the carry
   consumes the MEAN of every PSF so no output can be dead-code-eliminated.

Baselines: the reference PyTorch implementation on this host's CPU at the
IDENTICAL workload shapes (it published GPU-only prose numbers, no
machine-readable benchmarks — BASELINE.md):
  * psf_diff(center=True), 64 pts x (20000+2048) rays, ks 21: 137,729 rays/s
    (3-call mean at the EXACT bench shape, 10.25 s/call, torch 2.13 CPU,
    measured 2026-08-16 via /root/reference deeplens.optics.Lensgroup.psf).
  * PSFNet.render, 1x3x512x768, ks 21: 0.00725 pairs/s (137.97 s/pair,
    warmed second call; first call 195.5 s — same host/date, exact shape).
vs_baseline = ours / cpu_reference. BASELINE.json target: >=20x on rays/s.

Busy-chip fallback: only ONE process can hold the TPU here — a bench
launched while an unattended training queue is mid-flight would block
silently for hours, not fail. If a live queue/trainer pid is detected
(chip_holder), the script instead re-emits the most recent BANKED
idle-chip bench lines (every queue ends its chip session with a bench
run), tagged with "banked_from"/"banked_utc" provenance. Set
SDIRT_BENCH_FORCE=1 to measure live regardless.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_REFERENCE_RAYS_PER_SEC = 137_729.0   # exact-shape re-measure 2026-08-16
CPU_REFERENCE_PAIRS_PER_SEC = 0.00725    # exact-shape measure 2026-08-16

# CI smoke mode (scripts/ci.sh): tiny shapes so the script end-to-end-parses
# on CPU in seconds; the emitted numbers are NOT the benchmark.
SMOKE = bool(os.environ.get("SDIRT_BENCH_SMOKE"))


def bench_render(lens):
    """dp_image_pairs_per_sec via marginal-dispatch timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    h, w = (64, 96) if SMOKE else (512, 768)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32))
    depth = jnp.asarray(-(rng.uniform(0, 1, (1, 1, h, w)) * 900 + 100)
                        .astype(np.float32))
    foc = jnp.asarray([-1000.0], jnp.float32)

    def run_batch(n, seed0):
        acc = jnp.float32(0.0)
        for i in range(n):
            key = jax.random.PRNGKey(seed0 + i)
            out = lens.render(img, depth, foc, train=False, key=key)
            acc = acc + out.mean()       # consume the full output
        return float(acc)                # single true sync per batch

    _ = run_batch(2, 100)                # compile + warmup
    n1, n2 = (1, 3) if SMOKE else (4, 16)
    t0 = time.perf_counter()
    _ = run_batch(n1, 200)
    t1 = time.perf_counter()
    _ = run_batch(n2, 300)
    t2 = time.perf_counter()
    sec_per_pair = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    return 1.0 / sec_per_pair


def chip_holder(pid_globs=("/tmp/r4*_queue.pid", "/tmp/*_tpu_queue.pid",
                           "/tmp/train_*.pid")):
    """Pid of a live unattended queue/trainer that owns (or is about to
    re-own) the exclusive TPU chip, else None. Only ONE process can hold
    the chip on this host; a second jax process blocks silently until the
    first exits, so a bench launched while a multi-hour training queue is
    mid-flight would hang rather than fail. Pid files are written by the
    queue launch convention (BACKLOG.md); stale files and reused pids are
    rejected by requiring the live pid's cmdline to name one of our
    chip-holding entry points."""
    import glob

    holders = (b"_tpu_queue", b"run_train_supervised", b"dfdp_net",
               b"fit_psfnet", b"distill_basis_student")

    def queue_has_live_step(pid):
        """A queue process holds the chip only while a STEP child is
        running; between steps (or while waiting on another queue) the
        chip is free. CONFIG_PROC_CHILDREN is standard here; if the
        children file is missing, err on the side of 'holding'."""
        path = f"/proc/{pid}/task/{pid}/children"
        try:
            with open(path) as f:
                return bool(f.read().split())
        except OSError:
            return True
    # A queue's OWN bench step must measure live: the queue is idle-waiting
    # on us, so the chip is free. Skip any pid in our ancestor chain.
    skip = {os.getpid()}
    pid = os.getpid()
    for _ in range(64):
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        skip.add(pid)
        if pid <= 1:
            break
    seen = set(skip)
    for pat in pid_globs:
        for pf in glob.glob(pat):
            try:
                pid = int(open(pf).read().strip())
            except (OSError, ValueError):
                continue
            if pid in seen:
                continue
            seen.add(pid)
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if not any(h in cmd for h in holders):
                continue
            if b"_tpu_queue" in cmd and not queue_has_live_step(pid):
                continue   # idle/waiting queue — the chip itself is free
            return pid
    return None


def banked_bench(log_dir="logs"):
    """Most recent banked idle-chip bench: (utc_iso, path, [json objects])
    from the newest logs/bench_idle_*.log that carries BOTH metric lines,
    else None. The unattended queues end every chip session with a bench
    run that banks exactly these lines. Lines that are themselves fallback
    output (tagged banked_from) are ignored — re-serving a re-bank would
    let one stale measurement masquerade as fresh forever."""
    import glob

    for path in sorted(glob.glob(os.path.join(log_dir, "bench_idle_*.log")),
                       key=os.path.getmtime, reverse=True):
        objs = []
        try:
            for line in open(path):
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    try:
                        o = json.loads(line)
                    except ValueError:
                        continue
                    if "banked_from" not in o:
                        objs.append(o)
        except OSError:
            continue
        if len(objs) >= 2:
            ts = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                               time.gmtime(os.path.getmtime(path)))
            return ts, path, objs
    return None


def trace_mode():
    """Resolve the trace implementation for the rays/s benchmark.

    Priority: SDIRT_TRACE env (scan | specialized | fused) then the
    fused-trace promotion manifest (ckpt/FUSED_TRACE.json, written by
    scripts/bench_fused_trace.py when the Pallas fused kernel beats the
    scan on-chip AND matches its PSFs) then the scan default. History:
    the idle-chip A/B (logs/bench_trace_ab_*) measured scan at 134.3
    Mrays/s vs the statically-unrolled XLA trace's 107.0 — XLA unrolling
    is a regression (HBM temps outweigh the saved scan overhead); the
    Pallas kernel unrolls in VMEM instead.
    """
    env = os.environ.get("SDIRT_TRACE")
    if env:
        return env
    man = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ckpt", "FUSED_TRACE.json")
    if os.path.exists(man):
        with open(man) as f:
            if json.load(f).get("promote"):
                return "fused"
    return "scan"


def bench_trace_splat(lens, mode: str | None = None):
    """dp_psf_trace_and_splat rays/s via an on-device lax.scan loop."""
    import jax
    import numpy as np

    from sdirt_tpu.dp.psf import dp_psf, dp_psf_fused, lens_scalars

    eta, skip = lens.eta_arrays(0.589, True)
    scalars = lens_scalars(lens)
    mode = mode or trace_mode()
    print(f"# trace mode: {mode}", file=sys.stderr)
    desc = lens.static_desc() if mode == "specialized" else None
    if mode == "fused":
        from sdirt_tpu.dp.fused_trace import make_fused_plan

        plan = make_fused_plan(lens)   # auto-interprets off-TPU

    n_pts, spp, spp_chief, ks = 64, 20000, 2048, 21
    if SMOKE:
        n_pts, spp, spp_chief = 4, 512, 256
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    -(rng.uniform(0, 1, n_pts) * 19800 + 200)], -1).astype(np.float32)
    pts = jax.numpy.asarray(pts)

    iters = 20

    @jax.jit
    def run_many(key):
        def body(carry, k):
            if mode == "fused":
                psf_l, _ = dp_psf_fused(pts, k, scalars, plan, spp=spp,
                                        spp_chief=spp_chief, ks=ks, chunk=2048)
            else:
                psf_l, _ = dp_psf(lens.stack, eta, skip, pts, k, scalars,
                                  spp=spp, spp_chief=spp_chief, ks=ks,
                                  chunk=2048, static_desc=desc)
            return carry + psf_l.mean(), None   # consume every output element
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, 0.0, keys)
        return acc

    _ = float(run_many(jax.random.PRNGKey(0)))   # compile + warmup
    t0 = time.perf_counter()
    _ = float(run_many(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    return iters * n_pts * (spp + spp_chief) / dt


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    if not SMOKE and not os.environ.get("SDIRT_BENCH_FORCE"):
        pid = chip_holder()
        if pid is not None:
            banked = banked_bench(os.path.join(here, "logs"))
            if banked:
                ts, src, objs = banked
                print(f"# chip held by pid {pid}; serving the last banked "
                      f"idle-chip bench ({src})", file=sys.stderr)
                for o in objs:
                    o["banked_from"] = os.path.relpath(src, here)
                    o["banked_utc"] = ts
                    print(json.dumps(o))
                return
            print(f"# chip held by pid {pid} and no banked bench found; "
                  f"measuring live (may wait for the chip)", file=sys.stderr)

    if SMOKE:
        # this image preloads jax via sitecustomize, so the JAX_PLATFORMS
        # env var is ineffective — switch backends at runtime instead
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sdirt_tpu.psfnet.surrogate import PSFNetLens

    # The render benchmark runs the PROMOTED surrogate/variant: the fastest
    # configuration that passed the real-capture fidelity gate (within
    # 0.1 dB PSNR of the golden-tested w512 scan path on the bundled F/20
    # -> F/4 flat captures — scripts/gate_render_variants.py). The manifest
    # records which gate run authorized it.
    model, ckpt = "mlp", os.path.join(here, "ckpt/rf50mm/F4_PSFNet_mlp")
    manifest = os.path.join(here, "ckpt/rf50mm/PROMOTED_SURROGATE.json")
    if os.path.exists(manifest) and not os.environ.get("SDIRT_RENDER_VARIANT"):
        with open(manifest) as f:
            promo = json.load(f)
        if os.path.exists(os.path.join(here, promo["ckpt"])):
            model, ckpt = promo["model"], os.path.join(here, promo["ckpt"])
            os.environ["SDIRT_RENDER_VARIANT"] = promo["variant"]
            print(f"# promoted surrogate: {promo['model']} "
                  f"variant={promo['variant']} ({promo['ckpt']})",
                  file=sys.stderr)

    lens = PSFNetLens(os.path.join(here, "lenses/rf50mm/lens_web.json"),
                      model_name=model, kernel_size=21, sensor_res=(512, 768))
    if os.path.exists(ckpt):
        lens.load_net(ckpt)

    pairs_per_sec = bench_render(lens)
    print(json.dumps({
        "metric": "dp_image_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / CPU_REFERENCE_PAIRS_PER_SEC, 2)
        if CPU_REFERENCE_PAIRS_PER_SEC else None,
    }))

    rays_per_sec = bench_trace_splat(lens)
    print(json.dumps({
        "metric": "dp_psf_trace_and_splat_rays_per_sec_per_chip",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / CPU_REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
