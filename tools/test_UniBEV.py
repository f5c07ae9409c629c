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


def parse_args():
    p = argparse.ArgumentParser(description="Test UniBEV (TPU)")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="orbax checkpoint path (optional: random init if absent)")
    p.add_argument("--out", help="output results file (.json)")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   help="evaluation metrics")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--show-dir", help="directory to dump visualizations")
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--fuse-conv-bn", action="store_true",
                   help="accepted for parity; XLA fuses conv+affine already")
    p.add_argument("--launcher", default="none")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import numpy as np

    from unibev_tpu.config.config import Config, parse_cfg_option_value
    from unibev_tpu.data.nuscenes_dataset import SyntheticNuScenes, collate
    from unibev_tpu.models.detectors.unibev import UniBEV
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

    predict = jax.jit(lambda v, b: model.apply(v, b, method=UniBEV.predict))

    results = []
    n = min(len(dataset), args.max_samples or len(dataset))
    for i in range(n):
        s = dataset[i]
        b = collate([s])
        meta = b.pop("img_metas", [{}])[0]
        out = jax.device_get(predict(variables, b))
        results.append(dict(
            sample_idx=str(meta.get("sample_idx", i)),
            boxes_3d=np.asarray(out["bboxes"])[0].tolist(),
            scores_3d=np.asarray(out["scores"])[0].tolist(),
            labels_3d=np.asarray(out["labels"])[0].tolist(),
            valid=np.asarray(out["valid"])[0].tolist(),
        ))
        if args.show_dir:
            from unibev_tpu.utils.visualize import save_bev
            valid = np.asarray(out["valid"])[0]
            scores = np.asarray(out["scores"])[0]
            keep = valid & (scores > 0.3)
            save_bev(os.path.join(args.show_dir, f"sample_{i:04d}.png"),
                     points=np.asarray(b["points"][0]) if "points" in b else None,
                     boxes=np.asarray(out["bboxes"])[0][keep],
                     labels=np.asarray(out["labels"])[0][keep],
                     pc_range=tuple(cfg.point_cloud_range)
                     if "point_cloud_range" in cfg else (-54, -54, -5, 54, 54, 3))
        if (i + 1) % 10 == 0:
            logger.info(f"[{i + 1}/{n}] samples done")

    if args.out:
        os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f)
        logger.info(f"wrote {args.out}")

    if not args.format_only and not args.synthetic_data and hasattr(dataset, "infos"):
        from unibev_tpu.data.eval import nuscenes_eval
        metrics = nuscenes_eval(results, dataset)
        logger.info(f"Evaluation: {json.dumps(metrics, indent=2)}")
        print(json.dumps(metrics))
    else:
        logger.info(f"produced {len(results)} result dicts")


if __name__ == "__main__":
    main()
