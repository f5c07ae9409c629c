"""Flagship train-step HBM fit check (VERDICT r3 #6).

AOT-compiles the FULL flagship train step (fwd+bwd+AdamW, B=1) on the
current backend and reports XLA's own memory analysis — peak HBM, argument
/ output / temp sizes — as one JSON line.  On a compile-time OOM the error
text (which carries XLA's ranked allocation table) is captured and the tail
printed, so HBM regressions are diagnosable from the artifact alone instead
of surfacing as `train_s: "failed: IndexError"` (the round-3 failure mode).

Usage:
  python tools/memcheck_flagship.py            # real chip (or whatever backend)
  python tools/memcheck_flagship.py --infer    # also check the predict path

Exit code 0 = fits, 1 = OOM/compile failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import numpy as np

V5E_HBM = 15.75 * 2**30  # usable HBM on one v5e chip (from XLA's own OOM text)


def _mem_record(compiled) -> dict:
    ma = compiled.memory_analysis()
    rec = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            rec[k.replace("_size_in_bytes", "_mb")] = round(v / 2**20, 1)
    # NOTE: temp+args is NOT the scheduled peak XLA's compile-time OOM check
    # enforces (a running step has been measured with temp+args 450 MB over
    # the 15.75 GiB line).  The authoritative fit signal is that the compile
    # SUCCEEDED — XLA rejects programs whose scheduled peak exceeds HBM at
    # compile time (the r03 failure mode).  Sizes recorded for trend only.
    temp = getattr(ma, "temp_size_in_bytes", 0) or 0
    arg = getattr(ma, "argument_size_in_bytes", 0) or 0
    rec["temp_plus_args_gb"] = round((temp + arg) / 2**30, 3)
    return rec


def check_train(batch_size: int = 1) -> dict:
    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.parallel.train_state import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)

    model = build_flagship()
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, B=batch_size)
    batch_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    rngs = dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3))
    variables_sds = jax.eval_shape(lambda b: model.init(rngs, b, train=True),
                                   batch_sds)
    tx, _ = make_optimizer(total_steps=1000)
    state_sds = jax.eval_shape(
        lambda v: create_train_state(v, tx, jax.random.PRNGKey(7)),
        variables_sds)
    lowered = jax.jit(make_train_step(model, tx),
                      donate_argnums=(0,)).lower(state_sds, batch_sds)
    compiled = lowered.compile()
    return _mem_record(compiled)


def check_infer(modality: str = "LC", batch_size: int = 1) -> dict:
    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.models.detectors.unibev import UniBEV

    model = build_flagship(use_lidar="L" in modality,
                           use_camera="C" in modality)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, B=batch_size)
    batch_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    rngs = dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3))
    variables_sds = jax.eval_shape(lambda b: model.init(rngs, b, train=False),
                                   batch_sds)
    lowered = jax.jit(
        lambda v, b: model.apply(v, b, method=UniBEV.predict)).lower(
            variables_sds, batch_sds)
    compiled = lowered.compile()
    return _mem_record(compiled)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--infer", action="store_true",
                   help="check the LC predict path instead of the train step")
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    rec = {"check": "infer_LC" if args.infer else "train",
           "batch": args.batch,
           "device": str(jax.devices()[0]),
           "env": {k: v for k, v in os.environ.items()
                   if k.startswith("UNIBEV_")}}
    try:
        rec.update(check_infer() if args.infer else check_train(args.batch))
        rec["fits"] = True   # compile succeeded == XLA's own peak check passed
    except Exception as e:
        msg = str(e)
        rec["fits"] = False
        rec["error"] = type(e).__name__
        # XLA's OOM text carries the ranked allocation table ("Largest
        # program allocations in hbm"); keep the usage summary and the
        # table itself so the artifact alone diagnoses the regression.
        lines = msg.splitlines()
        keep = [ln for ln in lines
                if ("hbm" in ln.lower() or "Size:" in ln or "Operator:" in ln
                    or "Shape:" in ln or "padding:" in ln
                    or "Unpadded" in ln or ln.strip().startswith(
                        ("reserved", "program", "arguments", "HLO temp",
                         "overlays")))]
        rec["error_head"] = "\n".join(lines[:3])
        rec["error_buffers"] = "\n".join(keep[:80])
        print(json.dumps(rec))
        sys.exit(1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
