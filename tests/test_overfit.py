"""Learning-loop integration: the tiny model must overfit one batch.

Validates the full chain end-to-end: forward, Hungarian targets, losses,
gradients, AdamW + clipping + paramwise masks — if any of it is broken the
loss will not drop.
"""

import numpy as np
import jax
import pytest


@pytest.mark.slow
def test_overfit_single_batch():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV
    from unibev_tpu.parallel.train_state import (create_train_state,
                                                 make_optimizer,
                                                 make_train_step)

    cfg = tiny_model_cfg()
    # disable stochastic augs so the loss target is stationary
    cfg["use_grid_mask"] = False
    cfg["pts_bbox_head"]["transformer"]["drop_modality"] = None
    model = UniBEV(**cfg)
    batch = tiny_batch(np.random.RandomState(0))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=True)
    tx, _ = make_optimizer(base_lr=5e-4, total_steps=60, warmup_iters=5,
                           paramwise=())
    state = create_train_state(variables, tx, jax.random.PRNGKey(7))
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    losses = []
    for _ in range(40):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.55 * first, (first, last, losses[::8])
