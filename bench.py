"""Benchmark: flagship UniBEV (L+C CNW 256) inference samples/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference repo publishes no throughput numbers (BASELINE.md — published {});
vs_baseline is computed against an assumed 2.0 samples/s for the reference
torch/mmdet3d stack on a V100-class GPU (BEVFormer-era models run 1.5-3 fps at
this resolution), so vs_baseline = value / 2.0.  Target from BASELINE.json:
>= 4x => vs_baseline >= 4.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


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
                   help="bench the full train step (fwd+bwd+AdamW) instead "
                        "of inference; reports s/step and an MFU estimate")
    args = p.parse_args()

    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.models.detectors.unibev import UniBEV

    model = build_flagship(use_lidar="L" in args.modality,
                           use_camera="C" in args.modality)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, B=args.batch)

    variables = jax.jit(lambda b: model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        b, train=False))(batch)

    if args.train:
        return bench_train(model, variables, batch, args)

    predict = jax.jit(lambda v, b: model.apply(v, b, method=UniBEV.predict))
    out = jax.device_get(predict(variables, batch))  # compile + warm
    assert np.isfinite(out["bboxes"]).all()

    # The axon relay adds high-variance per-dispatch latency; take the best
    # of several rounds (standard min-timing practice) so the recorded number
    # reflects the hardware, not tunnel hiccups.
    n_iters, n_rounds = 10, 3
    best = float("inf")
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = predict(variables, batch)
        jax.device_get(out["scores"])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    dt = best / args.batch                 # per-sample
    samples_per_sec = 1.0 / dt

    baseline = 2.0  # assumed reference GPU samples/s (no published number)
    print(json.dumps({
        "metric": f"nuScenes-scale {args.modality} inference samples/sec/chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / baseline, 3),
        "ms_per_sample": round(dt * 1e3, 1),
        "batch": args.batch,
        "ms_per_dispatch": round(best * 1e3, 1),
        "device": str(jax.devices()[0]),
    }))


def bench_train(model, variables, batch, args):
    from unibev_tpu.parallel.train_state import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)
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
    print(json.dumps({
        "metric": "flagship LC train step seconds (fwd+bwd+AdamW, 1 chip)",
        "value": round(best, 3),
        "unit": "s/step",
        "vs_baseline": round(3.72 / best, 3),   # round-1 step time
        "batch": args.batch,
        "step_tflop": round(flops / 1e12, 2) if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
