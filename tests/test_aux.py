"""Aux subsystems: dist utils, timers, vis-output intermediates."""

import numpy as np
import jax
import jax.numpy as jnp

from unibev_tpu.parallel.dist import process_allgather, shard_indices
from unibev_tpu.utils.timer import run_time, timing_stats


def test_shard_indices_partition():
    idx = shard_indices(100, shuffle=True, seed=0)
    assert len(idx) == 100 // jax.process_count()
    assert len(set(idx.tolist())) == len(idx)


def test_process_allgather_single_host():
    x = {"a": np.ones((3,))}
    out = process_allgather(x)
    np.testing.assert_array_equal(out["a"], x["a"])


def test_run_time_decorator(capsys):
    @run_time("toy")
    def f(x):
        return x * 2

    f(jnp.ones((4,)))
    assert "toy" in capsys.readouterr().out
    assert "toy" in timing_stats()


def test_transformer_intermediates():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    model = UniBEV(**tiny_model_cfg())
    batch = tiny_batch(np.random.RandomState(0))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    preds, inter = model.apply(variables, batch, train=False,
                               mutable=["intermediates"])
    flat = jax.tree_util.tree_leaves_with_path(inter)
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat}
    assert any("cnw_img_norm_weights" in n for n in names), names
    assert any("img_bev_embed" in n for n in names)


def test_eval_hook_runs():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.parallel.train_state import create_train_state, make_optimizer
    from unibev_tpu.runtime.eval_hook import make_eval_fn

    class TinyDS:
        classes = ["car"] * 10

        def __len__(self):
            return 2

        def __getitem__(self, i):
            b = tiny_batch(np.random.RandomState(i))
            return {k: np.asarray(v)[0] for k, v in b.items()}

    model = UniBEV(**tiny_model_cfg())
    batch = tiny_batch(np.random.RandomState(0))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    tx, _ = make_optimizer(total_steps=10)
    state = create_train_state(variables, tx, jax.random.PRNGKey(1))
    metrics = make_eval_fn(model)(state, TinyDS())
    assert "mAP" in metrics and "NDS" in metrics
    assert 0.0 <= metrics["mAP"] <= 1.0


def test_checkpoint_cross_modality_load(tmp_path):
    """An L+C checkpoint must load into an L-only model (paper's core flow)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.runtime.checkpoints import save_params, load_params

    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    rngs = dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3))

    lc = UniBEV(**tiny_model_cfg(use_lidar=True, use_camera=True))
    v_lc = lc.init(rngs, batch, train=False)
    path = str(tmp_path / "ckpt")
    save_params(path, jax.device_get(v_lc))

    l_only = UniBEV(**tiny_model_cfg(use_lidar=False, use_camera=True))
    v_l = l_only.init(rngs, batch, train=False)
    merged = load_params(path, jax.device_get(v_l))
    # shared subtree (head) must come from the checkpoint
    a = np.asarray(merged["params"]["pts_bbox_head"]["bev_embedding"])
    b = np.asarray(v_lc["params"]["pts_bbox_head"]["bev_embedding"])
    np.testing.assert_allclose(a, b)
    out = l_only.apply(merged, batch, method=UniBEV.predict)
    assert np.isfinite(np.array(out["bboxes"])).all()


def test_bev_visualization(tmp_path):
    from unibev_tpu.utils.visualize import save_bev
    rng = np.random.RandomState(0)
    pts = rng.uniform(-50, 50, (5000, 5)).astype(np.float32)
    boxes = np.array([[10, 5, 0, 2, 4.5, 1.6, 0.4, 0, 0],
                      [-20, -8, 0, 1, 1, 1.8, 1.2, 0, 0]], np.float32)
    p = tmp_path / "bev.png"
    save_bev(str(p), points=pts, boxes=boxes, labels=np.array([0, 7]),
             gt_boxes=boxes + 0.5)
    from PIL import Image
    im = Image.open(p)
    assert im.size == (800, 800)
    assert np.asarray(im).sum() > 0


def test_bench_sub_failure_diagnosable():
    """bench.run_sub must surface rc + stderr tail, never a bare IndexError
    (VERDICT r3 #2: the r03 HBM OOM was recorded as 'failed: IndexError')."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import run_sub

    # failing subprocess: rc and stderr must land in the failure info
    out, fail = run_sub(
        [sys.executable, "-c",
         "import sys; sys.stderr.write('hbm capacity exceeded\\n'); "
         "sys.exit(3)"], budget=30)
    assert out is None
    assert fail["status"] == "failed: rc=3"
    assert "hbm capacity exceeded" in fail["stderr_tail"]

    # healthy subprocess: JSON parsed, no failure info
    out, fail = run_sub(
        [sys.executable, "-c", "print('{\"value\": 1.5}')"], budget=30)
    assert fail is None and out == {"value": 1.5}


def test_replicated_predict_surfaces_sca_overflow():
    """make_replicated_predict must carry the sca_topk_overflow counter
    (VERDICT r4 #5: production paths, not just tests, read it)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from jax.sharding import Mesh
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.runtime.predict import make_replicated_predict

    cfg = tiny_model_cfg()
    sca = cfg["pts_bbox_head"]["transformer"]["img_encoder"][
        "transformerlayers"]["attn_cfgs"][1]
    sca["rebatch_k"] = 64                      # ample: all 8x8 queries fit
    model = UniBEV(**cfg)
    batch = tiny_batch(np.random.RandomState(0))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    out = jax.device_get(make_replicated_predict(model, mesh)(
        variables, batch))
    assert int(out["sca_overflow"]) == 0, out["sca_overflow"]

    # Starved capacity MUST report the dropped hits (same params: rebatch_k
    # is not a parameter, only a static capacity).
    sca["rebatch_k"] = 1
    starved = UniBEV(**cfg)
    out = jax.device_get(make_replicated_predict(starved, mesh)(
        variables, batch))
    assert int(out["sca_overflow"]) > 0


def test_parity_tools_gates(tmp_path):
    """run_parity reports missing prereqs (rc 2); make_goldens refuses
    random-init goldens without --allow-random (VERDICT r4 #6)."""
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/run_parity.py"),
         "--weights-dir", str(tmp_path / "w"),
         "--data-root", str(tmp_path / "d")],
        capture_output=True, text=True)
    assert p.returncode == 2, p.stdout + p.stderr
    assert "prerequisites" in p.stdout

    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/make_goldens.py"),
         "--out", str(tmp_path / "g")],
        capture_output=True, text=True)
    assert p.returncode != 0
    assert "--allow-random" in p.stderr
