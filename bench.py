"""Benchmark: flagship UniBEV (L+C CNW 256) inference samples/sec on one chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline", ...}
IMMEDIATELY after the headline measurement (flushed — the artifact survives
any later timeout), then runs the L / C / train extras and prints an ENRICHED
line second.  The driver parses the LAST line of stdout, so a completed run
reports the self-contained record and a timed-out run still carries the
headline (VERDICT r4 #1: round 4 lost its whole perf story to an unflushed
headline behind 3x1500 s of extras).

The reference repo publishes no throughput numbers (BASELINE.md — published
{}); vs_baseline is computed against an assumed 2.0 samples/s for the
reference torch/mmdet3d stack on a V100-class GPU (BEVFormer-era models run
1.5-3 fps at this resolution), so vs_baseline = value / 2.0.  Target from
BASELINE.json: >= 4x => vs_baseline >= 4.

Budgets: UNIBEV_BENCH_DEADLINE (default 1200 s) bounds the WHOLE process
from import time; each extra subprocess gets min(UNIBEV_BENCH_EXTRA_TIMEOUT
default 420 s, time remaining).  Extras that don't fit are reported as
"skipped: deadline" — the headline is never at risk.
Set UNIBEV_BENCH_FAST=1 (or --headline-only) to skip the extras.
"""

import json
import os
import sys
import time

T_START = time.time()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compile cache: flagship graphs take minutes through the axon
# tunnel; cache them across bench/driver invocations.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import numpy as np

BASELINE = 2.0  # assumed reference GPU samples/s (no published number)


def _deadline_remaining():
    budget = float(os.environ.get("UNIBEV_BENCH_DEADLINE", "1200"))
    return budget - (time.time() - T_START)


def _tail(text, n=20, width=2400):
    """Last n lines / width chars of a (possibly bytes, possibly None) blob."""
    if not text:
        return ""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    return "\n".join(text.strip().splitlines()[-n:])[-width:]


def run_sub(cmd, budget):
    """Run one bench extra in a subprocess.

    Returns (parsed_json_or_None, failure_info_or_None).  On ANY failure the
    info dict carries the rc and a stderr tail so the driver artifact is
    diagnosable (VERDICT r3 #2: a dead subprocess used to surface as the
    useless 'failed: IndexError').
    """
    import subprocess
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=budget)
    except subprocess.TimeoutExpired as e:
        return None, {"status": "failed: timeout",
                      "stderr_tail": _tail(e.stderr)}
    lines = p.stdout.strip().splitlines()
    if p.returncode == 0 and lines:
        try:
            return json.loads(lines[-1]), None
        except Exception:
            pass
    return None, {"status": f"failed: rc={p.returncode}",
                  "stderr_tail": _tail(p.stderr)}


def _init_variables(model, batch):
    return jax.jit(lambda b: model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        b, train=False))(batch)


def bench_inference(modality: str, batch_size: int = 1,
                    n_iters: int = 10, n_rounds: int = 3):
    """(best per-sample seconds, sca_overflow) for one modality combination.

    The timed predict also returns the sown sca_topk_overflow max (VERDICT
    r4 #5: the counter used to be test-only — a geometry overflowing the
    rebatch_k=10240 capacity would silently drop pillar hits).  It rides the
    same jitted fn, so it costs one scalar reduce, not a second compile.

    Inference defaults to the fp8 sparse-conv x-quad tables (measured
    -30 ms LC with score drift max |d| 0.004 — PERF.md; the BASELINE gate
    is mAP-within-0.5, not bit parity).  UNIBEV_FP8=0 opts back to bf16.
    """
    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.runtime.predict import max_sca_overflow

    fp8 = os.environ.get("UNIBEV_FP8", "1") == "1" and "L" in modality
    model = build_flagship(use_lidar="L" in modality,
                           use_camera="C" in modality,
                           fp8_tables=fp8)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, B=batch_size)
    variables = _init_variables(model, batch)

    @jax.jit
    def predict(v, b):
        out, inter = model.apply(v, b, method=UniBEV.predict,
                                 mutable=["intermediates"])
        out = dict(out)
        out["sca_overflow"] = max_sca_overflow(inter)
        return out

    out = jax.device_get(predict(variables, batch))  # compile + warm
    assert np.isfinite(out["bboxes"]).all()
    overflow = int(out["sca_overflow"])

    # The axon relay adds high-variance per-dispatch latency; take the best
    # of several rounds (standard min-timing practice) so the recorded number
    # reflects the hardware, not tunnel hiccups.
    best = float("inf")
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = predict(variables, batch)
        jax.device_get(out["scores"])
        best = min(best, (time.perf_counter() - t0) / n_iters)

    return best / batch_size, overflow


def bench_train_step(batch_size: int = 1):
    """(s/step, step_tflop, mfu) for the full LC train step on one chip."""
    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.parallel.train_state import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)

    model = build_flagship()
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, B=batch_size)
    variables = _init_variables(model, batch)

    tx, _ = make_optimizer(total_steps=1000)
    state = create_train_state(variables, tx, jax.random.PRNGKey(7))
    compiled = jax.jit(make_train_step(model, tx), donate_argnums=(0,)).lower(
        state, batch).compile()
    state, metrics = compiled(state, batch)   # warm
    float(metrics["loss"])   # device_get forces the step through the relay
    # (block_until_ready alone measured 0.024 s/step — a relay artifact)

    n_iters, best = 3, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = compiled(state, batch)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n_iters)

    # MFU straight from XLA's own cost analysis of the whole step
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
    flops = float(ca.get("flops", 0.0))
    peak = 197e12   # v5e bf16 peak
    mfu = flops / best / peak if flops else None

    # HBM accounting from the compiled step (VERDICT r3 #6: the r03 OOM was
    # invisible until the driver ran).  NOTE: temp+args is NOT the scheduled
    # peak XLA's compile-time OOM check uses (measured: a running step
    # reported temp+args 450 MB over the 15.75 GiB line) — the authoritative
    # fit signal is that this compile+run succeeded at all; the size is
    # recorded for round-over-round trend only.
    hbm_temp_args_mb = None
    try:
        ma = compiled.memory_analysis()
        used = ((getattr(ma, "temp_size_in_bytes", 0) or 0)
                + (getattr(ma, "argument_size_in_bytes", 0) or 0))
        hbm_temp_args_mb = round(used / 2**20, 1)
    except Exception:
        pass
    return best, (flops / 1e12 if flops else None), mfu, hbm_temp_args_mb


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--modality", default="LC", choices=["LC", "L", "C"],
                   help="sensor combination to bench (headline: LC)")
    p.add_argument("--batch", type=int, default=1,
                   help="inference batch size; throughput reported per-sample "
                        "(B=1 measured fastest: batching doubles the sparse "
                        "encoder's gather tables past the fast window)")
    p.add_argument("--train", action="store_true",
                   help="bench ONLY the train step; reports s/step + MFU")
    p.add_argument("--headline-only", action="store_true",
                   help="skip the L/C/train extras in the default run")
    args = p.parse_args()

    if args.train:
        best, tflop, mfu, hbm_mb = bench_train_step(args.batch)
        print(json.dumps({
            "metric": "flagship LC train step seconds (fwd+bwd+AdamW, 1 chip)",
            "value": round(best, 3),
            "unit": "s/step",
            "vs_baseline": round(3.72 / best, 3),   # round-1 step time
            "batch": args.batch,
            "step_tflop": round(tflop, 2) if tflop else None,
            "mfu": round(mfu, 4) if mfu else None,
            "hbm_temp_args_mb": hbm_mb,   # trend only; fit == this ran
            "device": str(jax.devices()[0]),
        }), flush=True)
        return

    dt, overflow = bench_inference(args.modality, args.batch)
    rec = {
        "metric": f"nuScenes-scale {args.modality} inference samples/sec/chip",
        "value": round(1.0 / dt, 3),
        "unit": "samples/s",
        "vs_baseline": round(1.0 / dt / BASELINE, 3),
        "ms_per_sample": round(dt * 1e3, 1),
        "batch": args.batch,
        "fp8_sparse": os.environ.get("UNIBEV_FP8", "1") == "1"
                      and "L" in args.modality,
        # dropped camera-SCA hits beyond rebatch_k; MUST be 0 (-1 = no camera)
        "sca_overflow": overflow,
        "device": str(jax.devices()[0]),
        "baseline_note": "assumed 2.0 samples/s reference GPU (none published)",
    }
    # The headline must survive anything the extras do: print + flush NOW.
    print(json.dumps(rec), flush=True)

    fast = (os.environ.get("UNIBEV_BENCH_FAST", "0") == "1"
            or args.headline_only or args.modality != "LC")
    if not fast:
        # Self-contained driver artifact (VERDICT r2 #6): per-modality +
        # train + MFU in the same line.  Each extra runs in its OWN
        # subprocess under a hard timeout: a hung compile or an OOM in one
        # extra never loses the headline number or the driver's budget
        # (an in-process XLA compile cannot be interrupted; killing the
        # whole bench mid-compile can wedge the axon relay for an hour).
        per_extra = float(os.environ.get("UNIBEV_BENCH_EXTRA_TIMEOUT", "420"))
        me = os.path.abspath(__file__)

        def sub_bench(extra_args, key):
            remaining = _deadline_remaining()
            if remaining < 60:
                rec[key] = "skipped: deadline"
                return None
            sub, fail = run_sub([sys.executable, me] + extra_args,
                                min(per_extra, remaining))
            if fail is not None:
                rec[key] = fail["status"]
                rec[key + "_stderr"] = fail["stderr_tail"]
            return sub

        for key, modality in (("L_ms", "L"), ("C_ms", "C")):
            sub = sub_bench(["--modality", modality], key)
            if sub is not None:
                rec[key] = sub["ms_per_sample"]
                if modality == "C":
                    rec["sca_overflow"] = max(rec["sca_overflow"],
                                              sub.get("sca_overflow", -1))
        sub = sub_bench(["--train"], "train_s")
        if sub is not None:
            rec["train_s"] = sub["value"]
            rec["step_tflop"] = sub.get("step_tflop")
            rec["mfu"] = sub.get("mfu")
            rec["hbm_temp_args_mb"] = sub.get("hbm_temp_args_mb")

        # Enriched record second: the driver parses the tail, so a completed
        # run reports this line and a killed run still has the headline.
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
