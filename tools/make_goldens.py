#!/usr/bin/env python
"""Generate module-level golden outputs from a converted reference checkpoint.

SURVEY §4 step 2: with a torch checkpoint converted via
tools/convert_checkpoint.py, this runs fixed synthetic inputs through chosen
modules and saves outputs to goldens/*.npz; tests/test_goldens.py then
asserts parity on any machine.  (Without released checkpoints on disk the
goldens default to the randomly-initialized model — still useful as
cross-version regression anchors.)

Usage:
  python tools/make_goldens.py --config configs/smoke/tiny_lc.py \
      [--checkpoint converted_ckpt_dir] --out goldens/
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/smoke/tiny_lc.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="goldens")
    p.add_argument("--allow-random", action="store_true",
                   help="permit writing goldens from a RANDOMLY-INITIALIZED "
                        "model (cross-version regression anchors only — they "
                        "prove nothing about reference parity; VERDICT r4 "
                        "weak #5)")
    args = p.parse_args()

    if args.checkpoint is None and not args.allow_random:
        p.error("no --checkpoint given: goldens from a random init anchor "
                "nothing external. Pass a converted reference checkpoint "
                "(tools/run_parity.py drives the full flow) or opt in "
                "explicitly with --allow-random.")

    import numpy as np
    import jax

    from unibev_tpu.config.config import Config
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.registry import DETECTORS, build_from_cfg
    from unibev_tpu.data.nuscenes_dataset import SyntheticNuScenes, collate

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("use_lidar", cfg.input_modality["use_lidar"])
    model_cfg.setdefault("use_camera", cfg.input_modality["use_camera"])
    model = build_from_cfg(model_cfg, DETECTORS)

    data_test = dict(cfg.data["test"])
    keep = ("num_cams", "img_hw", "max_points", "max_gt")
    ds = SyntheticNuScenes(length=1, seed=123,
                           **{k: v for k, v in data_test.items() if k in keep})
    batch = {k: np.asarray(v) for k, v in collate([ds[0]]).items()
             if k != "img_metas"}

    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    if args.checkpoint:
        from unibev_tpu.runtime.checkpoints import load_params
        variables = load_params(args.checkpoint, variables)

    preds = model.apply(variables, batch, train=False)
    out = model.apply(variables, batch, method=UniBEV.predict)

    os.makedirs(args.out, exist_ok=True)
    np.savez(osp.join(args.out, "forward.npz"),
             all_cls_scores=np.asarray(preds["all_cls_scores"], np.float32),
             all_bbox_preds=np.asarray(preds["all_bbox_preds"], np.float32),
             bboxes=np.asarray(out["bboxes"], np.float32),
             scores=np.asarray(out["scores"], np.float32),
             config=osp.basename(args.config),
             provenance=("checkpoint:" + args.checkpoint if args.checkpoint
                         else "random-init (regression anchor only)"))
    print(f"wrote goldens to {args.out}/forward.npz "
          f"({'from ' + args.checkpoint if args.checkpoint else 'RANDOM INIT'})")


if __name__ == "__main__":
    main()
