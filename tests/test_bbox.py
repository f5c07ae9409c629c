import numpy as np
import jax.numpy as jnp
import torch

from unibev_tpu.core.bbox.util import normalize_bbox, denormalize_bbox
from unibev_tpu.core.bbox.lsa import linear_sum_assignment
from unibev_tpu.core.bbox.assigners import HungarianAssigner3D
from unibev_tpu.ops.losses import sigmoid_focal_loss


def test_normalize_roundtrip():
    rng = np.random.RandomState(0)
    boxes = rng.randn(50, 9).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.1  # positive sizes
    norm = normalize_bbox(jnp.array(boxes))
    assert norm.shape == (50, 10)
    denorm = np.array(denormalize_bbox(norm))
    np.testing.assert_allclose(denorm[:, :6], boxes[:, :6], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.sin(denorm[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)
    np.testing.assert_allclose(np.cos(denorm[:, 6]), np.cos(boxes[:, 6]), atol=1e-4)
    np.testing.assert_allclose(denorm[:, 7:], boxes[:, 7:], atol=1e-5)


def test_lsa_vs_scipy_batch():
    from scipy.optimize import linear_sum_assignment as ref
    rng = np.random.RandomState(7)
    for _ in range(5):
        R, C = rng.randint(5, 100), 900
        cost = (rng.randn(R, C) * 5).astype(np.float32)
        ours = np.array(linear_sum_assignment(jnp.array(cost), jnp.int32(R)))
        ri, ci = ref(cost)
        assert abs(cost[np.arange(R), ours].sum() - cost[ri, ci].sum()) < 1e-2


def test_assigner_masks_padded_gt():
    rng = np.random.RandomState(1)
    Q, G, ncls = 64, 16, 10
    assigner = HungarianAssigner3D()
    bbox_pred = jnp.array(rng.randn(Q, 10).astype(np.float32))
    cls_pred = jnp.array(rng.randn(Q, ncls).astype(np.float32))
    gt = rng.randn(G, 9).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.5
    labels = rng.randint(0, ncls, size=(G,))
    valid = np.zeros((G,), bool)
    valid[:5] = True
    res = assigner.assign(bbox_pred, cls_pred, jnp.array(gt),
                          jnp.array(labels), jnp.array(valid))
    assert int(res.pos_mask.sum()) == 5
    matched_gts = np.array(res.gt_inds)[np.array(res.pos_mask)]
    assert set(matched_gts.tolist()) == set(range(5))


def test_focal_loss_matches_torch():
    rng = np.random.RandomState(2)
    N, C = 128, 10
    logits = rng.randn(N, C).astype(np.float32)
    labels = rng.randint(0, C + 1, size=(N,))  # C == background
    ours = np.array(sigmoid_focal_loss(jnp.array(logits), jnp.array(labels), C))

    # torchvision-style oracle
    t_logits = torch.from_numpy(logits)
    onehot = torch.zeros(N, C)
    fg = labels < C
    onehot[np.arange(N)[fg], labels[fg]] = 1.0
    p = torch.sigmoid(t_logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        t_logits, onehot, reduction="none")
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    ref = (alpha_t * (1 - p_t) ** 2.0 * ce).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_nmsfree_coder_threshold_decay_loop():
    """Reference nms_free_coder.py:64-73: the score threshold is relaxed by
    0.9x until at least one box passes (all pass if it decays below 0.01)."""
    import jax.numpy as jnp
    from unibev_tpu.core.bbox.coders import NMSFreeCoder

    coder = NMSFreeCoder(pc_range=(-54, -54, -5, 54, 54, 3),
                         post_center_range=(-61, -61, -10, 61, 61, 10),
                         max_num=4, score_threshold=0.5, num_classes=2)
    # logits so low every sigmoid score is ~0.12 << 0.5
    logits = jnp.full((3, 2), -2.0)
    preds = jnp.zeros((3, 10))
    out = coder.decode_single(logits, preds)
    # reference semantics: threshold decays 0.5 -> ... until 0.119 passes
    assert bool(np.asarray(out["valid"]).any())
    # and a normal case still filters
    logits2 = jnp.asarray([[3.0, -9.0], [-9.0, -9.0], [-9.0, -9.0]])
    out2 = coder.decode_single(logits2, preds)
    v = np.asarray(out2["valid"])
    s = np.asarray(out2["scores"])
    assert v[0] and s[0] > 0.5 and not v[1:].any()
