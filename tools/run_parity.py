#!/usr/bin/env python
"""One-command reference-parity harness (SURVEY §4 step 2, §7 step 9).

The released reference checkpoints (/root/reference/README.md:40-47:
UniBEV_CNW / UniBEV_avg / UniBEV_cat) and the nuScenes dataset cannot enter
this build environment, so trained-weight parity is unprovable HERE — this
tool makes it a one-command check the moment they arrive:

  python tools/run_parity.py --weights-dir weights/ --data-root data/nuscenes

For every ``*.pth`` found it:
  1. converts torch -> orbax (tools/convert_checkpoint.py) and reports
     key-mapping coverage,
  2. regenerates module goldens from the CONVERTED weights
     (tools/make_goldens.py --checkpoint ...), replacing the random-init
     regression anchors,
  3. evaluates the converted checkpoint with each inference config
     (configs/unibev/inference/unibev_val_{LC,L,C}_full.py) over the real
     val split via tools/test_UniBEV.py,
and prints the mAP/NDS table next to the reference numbers
(/root/reference/README.md:37: CNW 64.2/58.2/35.0 mAP for L+C/L/C; gate =
within 0.5, BASELINE.md).

Without weights or data it prints exactly what is missing and where to put
it, and exits 2 (distinct from a parity FAILURE, which exits 1).
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

REF_MAP = {  # README.md:37-39 — nuScenes val mAP (%), columns L+C / L / C
    "cnw": {"LC": 64.2, "L": 58.2, "C": 35.0},
    "avg": {"LC": 64.1, "L": 57.6, "C": 35.1},
    "cat": {"LC": 63.8, "L": 57.6, "C": 34.4},
}
CFG_BY_KIND = {
    "cnw": "configs/unibev/unibev_nus_LC_cnw_256_modality_dropout.py",
    "avg": "configs/unibev/unibev_nus_LC_avg_256_modality_dropout.py",
    "cat": "configs/unibev/unibev_nus_LC_cat_128_modality_dropout.py",
}
INFER_CFG = {m: f"configs/unibev/inference/unibev_val_{m}_full.py"
             for m in ("LC", "L", "C")}


def _kind_of(path: str) -> str:
    name = osp.basename(path).lower()
    for kind in ("avg", "cat", "cnw"):
        if kind in name:
            return kind
    return "cnw"   # the flagship; README's primary released checkpoint


def _run(cmd, log_path):
    print(f"  $ {' '.join(cmd)}")
    with open(log_path, "w") as log:
        p = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                           cwd=REPO)
    if p.returncode != 0:
        print(f"    FAILED (rc={p.returncode}); log: {log_path}")
    return p.returncode


def _last_json(path):
    try:
        with open(path) as f:
            for line in reversed(f.read().strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
    except Exception:
        pass
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", default="weights",
                   help="directory holding the released reference .pth files")
    p.add_argument("--data-root", default="data/nuscenes",
                   help="nuScenes root (raw tables + info files from "
                        "tools/create_data.py)")
    p.add_argument("--out", default="work_dirs/parity")
    p.add_argument("--max-samples", type=int, default=None,
                   help="cap val samples (smoke the harness on a subset)")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="BASELINE.md mAP gate: |ours - reference| <= this")
    args = p.parse_args()

    weights_dir = osp.join(REPO, args.weights_dir) \
        if not osp.isabs(args.weights_dir) else args.weights_dir
    data_root = osp.join(REPO, args.data_root) \
        if not osp.isabs(args.data_root) else args.data_root

    pths = sorted(
        osp.join(weights_dir, f) for f in (
            os.listdir(weights_dir) if osp.isdir(weights_dir) else [])
        if f.endswith(".pth"))
    val_infos = osp.join(data_root, "nuscenes_infos_val.json")
    have_data = osp.exists(val_infos)

    missing = []
    if not pths:
        missing.append(
            f"reference checkpoints: put the released .pth files "
            f"(/root/reference/README.md:40-47 — UniBEV_CNW/avg/cat) in "
            f"{weights_dir}/ (filenames containing 'cnw'/'avg'/'cat' map to "
            f"their configs; anything else is treated as CNW)")
    if not have_data:
        missing.append(
            f"nuScenes val data: {val_infos} not found — download nuScenes "
            f"to {data_root} and run `python tools/create_data.py nuscenes "
            f"--root-path {args.data_root} --out-dir {args.data_root}`")
    if missing:
        print("PARITY: prerequisites not present in this environment:")
        for m in missing:
            print(f"  - {m}")
        print("Re-run this command once they exist; nothing else to set up.")
        sys.exit(2)

    os.makedirs(osp.join(REPO, args.out), exist_ok=True)
    table = []        # (ckpt, modality, ours, ref, pass)
    hard_fail = False

    for pth in pths:
        kind = _kind_of(pth)
        cfg = CFG_BY_KIND[kind]
        name = osp.splitext(osp.basename(pth))[0]
        outdir = osp.join(REPO, args.out, name)
        os.makedirs(outdir, exist_ok=True)
        print(f"== {name} (kind={kind}) ==")

        converted = osp.join(outdir, "converted")
        rc = _run([sys.executable, "tools/convert_checkpoint.py", pth,
                   converted, "--config", cfg, "--tiny-batch"],
                  osp.join(outdir, "convert.log"))
        if rc != 0:
            hard_fail = True
            continue

        _run([sys.executable, "tools/make_goldens.py", "--config", cfg,
              "--checkpoint", converted,
              "--out", osp.join(outdir, "goldens")],
             osp.join(outdir, "goldens.log"))

        for modality, icfg in INFER_CFG.items():
            log = osp.join(outdir, f"eval_{modality}.log")
            if kind == "cnw":
                # the reference's inference configs are _base_'d on CNW
                cmd = [sys.executable, "tools/test_UniBEV.py", icfg,
                       converted, "--eval", "bbox"]
            else:
                # avg/cat have no inference configs in the reference; their
                # L/C README rows come from the same use_* overrides the
                # inference configs apply — pass them as --cfg-options
                cmd = [sys.executable, "tools/test_UniBEV.py",
                       CFG_BY_KIND[kind], converted, "--eval", "bbox",
                       "--cfg-options",
                       f"model.use_lidar={'L' in modality}",
                       f"model.use_camera={'C' in modality}",
                       f"input_modality.use_lidar={'L' in modality}",
                       f"input_modality.use_camera={'C' in modality}"]
            if args.max_samples:
                cmd += ["--max-samples", str(args.max_samples)]
            rc = _run(cmd, log)
            metrics = _last_json(log)
            ours = (metrics or {}).get("mAP")
            ref = REF_MAP[kind][modality]
            ok = (ours is not None
                  and abs(ours * 100.0 - ref) <= args.tolerance)
            if rc != 0 or ours is None:
                hard_fail = True
            table.append((name, modality, ours, ref, ok))

    print("\n| checkpoint | input | ours mAP | reference mAP | within "
          f"{args.tolerance} |")
    print("|---|---|---|---|---|")
    all_ok = not hard_fail
    for name, modality, ours, ref, ok in table:
        ours_s = f"{ours * 100.0:.1f}" if ours is not None else "FAILED"
        print(f"| {name} | {modality} | {ours_s} | {ref} | "
              f"{'yes' if ok else 'NO'} |")
        all_ok &= ok
    with open(osp.join(REPO, args.out, "parity.json"), "w") as f:
        json.dump([dict(ckpt=n, modality=m, ours=o, ref=r, ok=k)
                   for n, m, o, r, k in table], f, indent=2)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
