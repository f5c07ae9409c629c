#!/usr/bin/env python
"""Convert a reference torch UniBEV checkpoint (.pth) to an orbax checkpoint.

Usage:
  python tools/convert_checkpoint.py ref.pth out_dir --config configs/unibev/unibev_nus_LC_cnw_256_modality_dropout.py

Loads the torch state_dict (CPU), maps it through
unibev_tpu.utils.convert_torch, merges into a freshly-initialized variable
tree of the configured model (so un-mapped leaves keep their init), reports
coverage, and saves with orbax.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--config",
                   default="configs/unibev/unibev_nus_LC_cnw_256_modality_dropout.py")
    p.add_argument("--tiny-batch", action="store_true",
                   help="init with tiny synthetic inputs (faster)")
    args = p.parse_args()

    import numpy as np
    import torch
    import jax

    from unibev_tpu.config.config import Config
    from unibev_tpu.registry import DETECTORS, build_from_cfg
    from unibev_tpu.utils.convert_torch import convert_state_dict
    from unibev_tpu.runtime.checkpoints import save_params
    from unibev_tpu.flagship import synthetic_batch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    print(f"loaded {len(sd)} torch tensors")

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("use_lidar", cfg.input_modality["use_lidar"])
    model_cfg.setdefault("use_camera", cfg.input_modality["use_camera"])
    model = build_from_cfg(model_cfg, DETECTORS)

    dcn = tuple(dict(cfg.model["img_backbone"]).get(
        "stage_with_dcn", (False, False, False, False)))
    converted = convert_state_dict(sd, dcn_stages=dcn)
    if converted["unmapped"]:
        print(f"WARNING: {len(converted['unmapped'])} unmapped keys:")
        for k in converted["unmapped"][:40]:
            print("  ", k)

    rng = np.random.RandomState(0)
    data_test = dict(cfg.get("data", {}).get("test", {}) or {})
    if data_test.get("type") == "SyntheticNuScenes":
        from unibev_tpu.data.nuscenes_dataset import SyntheticNuScenes, collate
        keep = ("num_cams", "img_hw", "max_points", "max_gt")
        ds = SyntheticNuScenes(length=1,
                               **{k: v for k, v in data_test.items() if k in keep})
        batch = {k: np.asarray(v) for k, v in collate([ds[0]]).items()
                 if k != "img_metas"}
    else:
        batch = synthetic_batch(rng, B=1, P=20000 if args.tiny_batch else 300000)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)

    def merge(dst, src, path=()):
        n_hit = n_miss = 0
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict) or hasattr(v, "keys"):
                sub, h, m = merge(dict(v), src.get(k, {}), path + (k,))
                out[k] = sub
                n_hit += h
                n_miss += m
            else:
                if k in src:
                    sv = np.asarray(src[k])
                    assert sv.shape == np.asarray(v).shape, \
                        (path + (k,), sv.shape, np.asarray(v).shape)
                    out[k] = sv.astype(np.asarray(v).dtype)
                    n_hit += 1
                else:
                    out[k] = v
                    n_miss += 1
        return out, n_hit, n_miss

    merged = {}
    for col in ("params", "constants", "batch_stats"):
        if col in variables:
            merged[col], h, m = merge(dict(variables[col]),
                                      converted.get(col, {}))
            print(f"{col}: {h} loaded, {m} kept-at-init")
    save_params(args.out_dir, merged)
    print(f"saved orbax checkpoint to {args.out_dir}")


if __name__ == "__main__":
    main()
