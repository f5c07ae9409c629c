"""Golden regression: if goldens/ exists, the model must reproduce it."""

import os
import os.path as osp

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "goldens", "forward.npz")


@pytest.mark.skipif(not osp.exists(GOLDEN), reason="no goldens generated")
def test_forward_matches_golden():
    import jax
    from unibev_tpu.config.config import Config
    from unibev_tpu.registry import DETECTORS, build_from_cfg
    from unibev_tpu.data.nuscenes_dataset import SyntheticNuScenes, collate

    data = np.load(GOLDEN, allow_pickle=True)
    cfg = Config.fromfile(osp.join(REPO, "configs/smoke", str(data["config"])))
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("use_lidar", cfg.input_modality["use_lidar"])
    model_cfg.setdefault("use_camera", cfg.input_modality["use_camera"])
    model = build_from_cfg(model_cfg, DETECTORS)
    keep = ("num_cams", "img_hw", "max_points", "max_gt")
    ds = SyntheticNuScenes(length=1, seed=123,
                           **{k: v for k, v in dict(cfg.data["test"]).items()
                              if k in keep})
    batch = {k: np.asarray(v) for k, v in collate([ds[0]]).items()
             if k != "img_metas"}
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    preds = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(preds["all_cls_scores"]),
                               data["all_cls_scores"], atol=1e-3, rtol=1e-3)
