"""Timeline profiler for flagship inference/train on the real TPU chip.

Captures a jax.profiler trace around N steps, then parses the xplane proto
directly (tensorboard isn't reachable here) to report:
  - per-op-category device time (fusions, convs, gathers, custom-calls...)
  - top individual ops by total self time
  - timeline busy-vs-gap accounting on the TPU core plane (the ~480 ms of
    "copy-start" dead time from round 1 lives in the gaps, not the op totals)

Usage: python tools/profile_flagship.py [--modality LC] [--train] [--iters 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def capture(fn, n_iters, log_dir):
    fn()  # warm
    jax.effects_barrier()
    with jax.profiler.trace(log_dir):
        for _ in range(n_iters):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0])


def load_xspace(log_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {log_dir}"
    xs = xplane_pb2.XSpace()
    raw = open(paths[-1], "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    xs.ParseFromString(raw)
    return xs


def analyze_by_scope(xs, n_iters, depth=2):
    """Roll device time up by the flax module scope carried in each op's
    tf_op metadata — the ground-truth per-block attribution (opcode+shape
    families misattribute fused glue; the round-2 PERF.md '140 ms decoder
    tail' was really the sparse middle encoder's index machinery)."""
    plane = next(p for p in xs.planes if "TPU" in p.name)
    smeta = {k: v.name for k, v in plane.stat_metadata.items()}
    emeta = plane.event_metadata
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in line.events:
        md = emeta[ev.metadata_id]
        tf_op = ""
        for st in md.stats:
            if smeta.get(st.metadata_id) == "tf_op":
                tf_op = st.str_value
        parts = tf_op.split("/")
        # path: jit(...)/<Model.method>/<Model>/<module>/<sub>/...
        key = "/".join(parts[3:3 + depth]) or "(no-scope)"
        agg[key] += ev.duration_ps
        cnt[key] += 1
    print(f"== rollup by module scope (depth {depth}), ms/iter ==")
    for k, d in agg.most_common(60):
        print(f"  {d/1e9/n_iters:9.2f} ms  x{cnt[k]//n_iters:<6d} {k[:110]}")
    print(f"  TOTAL {sum(agg.values())/1e9/n_iters:.1f} ms   "
          f"ops/iter {sum(cnt.values())//n_iters}")


def analyze(xs, n_iters):
    for plane in xs.planes:
        if "TPU" in plane.name and ("Core" in plane.name or "TensorCore"
                                    in plane.name or "XLA Ops" in plane.name):
            tpu_plane = plane
            break
    else:
        # fall back: largest plane with events
        tpu_plane = max(xs.planes, key=lambda p: sum(len(l.events) for l in p.lines))
    print(f"== plane: {tpu_plane.name}")
    emeta = tpu_plane.event_metadata
    for line in tpu_plane.lines:
        if not line.events:
            continue
        evs = []
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            evs.append((ev.offset_ps, ev.duration_ps, name))
        evs.sort()
        # self-time aggregation by name (events on one line shouldn't nest,
        # but XLA op lines sometimes do; treat as flat intervals)
        tot = collections.Counter()
        for off, dur, name in evs:
            tot[name] += dur
        span = evs[-1][0] + evs[-1][1] - evs[0][0]
        busy = 0
        cur_end = 0
        gaps = []
        for off, dur, name in evs:
            if off > cur_end:
                gaps.append((off - cur_end, cur_end, name))
            busy += max(0, off + dur - max(off, cur_end))
            cur_end = max(cur_end, off + dur)
        gaps.sort(reverse=True)
        print(f"-- line: {line.name}  events={len(evs)}  "
              f"span={span/1e12*1000:.1f}ms busy={busy/1e12*1000:.1f}ms "
              f"gap={(span-busy)/1e12*1000:.1f}ms   (/{n_iters} iters)")
        if span == 0:
            continue
        # family aggregation: strip %, .N suffixes and "= <shape>" detail;
        # key on opcode + output shape signature
        fam = collections.Counter()
        famn = collections.Counter()
        for name, d in tot.items():
            base = name.split(" = ")
            opname = base[0].lstrip("%").split(".")[0]
            shape = base[1].split(" ")[0] if len(base) > 1 else ""
            # drop layout annotation {...}
            shape = shape.split("{")[0]
            k = f"{opname} {shape}"
            fam[k] += d
            famn[k] += 1
        print("   top op families (opcode+shape) by total time:")
        for k, d in fam.most_common(250):
            print(f"     {d/1e12*1000/n_iters:8.2f} ms/iter  x{famn[k]//n_iters:<4d} {k[:110]}")
        print("   top gaps (before-op):")
        for g, at, nxt in gaps[:12]:
            print(f"     {g/1e12*1000:8.2f} ms before {nxt[:90]}")
        # full rollup: every op bucketed by opcode (nothing hides in the
        # tail below the top-40 cut)
        cat = collections.Counter()
        catn = collections.Counter()
        for name, d in tot.items():
            op = name.lstrip("%").split(".")[0].split(" ")[0]
            cat[op] += d
            catn[op] += 1
        print("   rollup by opcode (ALL ops):")
        for k, d in cat.most_common(25):
            print(f"     {d/1e12*1000/n_iters:8.2f} ms/iter  x{catn[k]//n_iters:<5d} {k}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modality", default="LC")
    p.add_argument("--train", action="store_true")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--logdir", default="/tmp/flagship_trace")
    p.add_argument("--by-scope", action="store_true",
                   help="roll up by flax module scope instead of op family")
    p.add_argument("--scope-depth", type=int, default=2)
    p.add_argument("--reuse-trace", action="store_true",
                   help="analyze an existing --logdir without re-capturing")
    args = p.parse_args()

    if args.reuse_trace:
        xs = load_xspace(args.logdir)
        if args.by_scope:
            analyze_by_scope(xs, args.iters, args.scope_depth)
        else:
            analyze(xs, args.iters)
        return

    from unibev_tpu.flagship import build_flagship, synthetic_batch
    from unibev_tpu.models.detectors.unibev import UniBEV

    # match bench.py's inference default (fp8 sparse tables) so the trace
    # attributes the same graph the headline measures; UNIBEV_FP8=0 opts out
    fp8 = (os.environ.get("UNIBEV_FP8", "1") == "1" and "L" in args.modality
           and not args.train)
    model = build_flagship(use_lidar="L" in args.modality,
                           use_camera="C" in args.modality,
                           fp8_tables=fp8)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng)
    variables = jax.jit(lambda b: model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        b, train=False))(batch)

    if args.train:
        from unibev_tpu.parallel.train_state import (create_train_state,
                                                     make_optimizer,
                                                     make_train_step)
        tx, _ = make_optimizer(total_steps=1000)
        state = create_train_state(variables, tx, jax.random.PRNGKey(7))
        step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
        holder = {"state": state}

        def fn():
            holder["state"], m = step(holder["state"], batch)
            return m
    else:
        predict = jax.jit(lambda v, b: model.apply(v, b, method=UniBEV.predict))
        fn = lambda: predict(variables, batch)

    os.system(f"rm -rf {args.logdir}")
    capture(fn, args.iters, args.logdir)
    xs = load_xspace(args.logdir)
    if args.by_scope:
        analyze_by_scope(xs, args.iters, args.scope_depth)
    else:
        analyze(xs, args.iters)


if __name__ == "__main__":
    main()
