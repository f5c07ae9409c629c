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
