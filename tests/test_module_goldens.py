"""Torch-twin module goldens (VERDICT r1 #2).

Independent torch/numpy reimplementations of the reference's module
semantics, fed the SAME weights through ``convert_state_dict`` (so the
layout transforms are exercised numerically, not just structurally):

  * CNW channel_feature_norm + linear fusion  transformer_fusion.py:280-384
  * full ImgLayer (TSA -> LN -> per-camera-rebatch SCA -> LN -> FFN -> LN)
    encoder_unibev_detr_img.py:292-481, spatial_cross_attention_img.py:141-215
  * decoder layer with iterative box refinement  decoder.py:51-126
  * head loss_single (Hungarian + focal + weighted L1)  unibev_head.py:354-422

All twins run at small dims on CPU; parity target <= 1e-4 relative.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ref_inventory import (decoder_keys, encoder_keys, head_keys)  # noqa: E402

from unibev_tpu.utils.convert_torch import convert_state_dict
from tests.test_msda import torch_msda

C, HEADS = 32, 4
rtol = dict(rtol=2e-4, atol=2e-4)


def t_lin(x, sd, p):
    return x @ torch.as_tensor(sd[f"{p}.weight"]).T \
        + torch.as_tensor(sd[f"{p}.bias"])


def t_ln(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],),
                        torch.as_tensor(sd[f"{p}.weight"]),
                        torch.as_tensor(sd[f"{p}.bias"]))


def t_ffn(x, sd, p):
    h = F.relu(t_lin(x, sd, f"{p}.ffns.0.layers.0.0"))
    return x + t_lin(h, sd, f"{p}.ffns.0.layers.1")


def t_msda_attn(query, value, ref, shapes, sd, p, points, query_pos=None,
                z_anchors=None, output_proj=True, heads=None):
    """mmcv MultiScaleDeformableAttention / MSDeformableAttention3D* twin.

    ref: (B, Q, L, 2) for the 2D variant, (B, Q, Z, 2) with z_anchors=Z for
    the 3D (points//Z, Z) reshape contract (spatial_cross_attention_img.py
    :397-419)."""
    heads = HEADS if heads is None else heads
    identity = query
    if query_pos is not None:
        query = query + query_pos
    B, Q, c = query.shape
    L = len(shapes)
    hd = c // heads
    v = t_lin(value, sd, f"{p}.value_proj").view(B, -1, heads, hd)
    off = t_lin(query, sd, f"{p}.sampling_offsets").view(
        B, Q, heads, L, points, 2)
    w = t_lin(query, sd, f"{p}.attention_weights").view(B, Q, heads, L * points)
    w = w.softmax(-1).view(B, Q, heads, L, points)
    norm = torch.tensor([[wd, ht] for ht, wd in shapes], dtype=torch.float32)
    if z_anchors is None:
        loc = ref[:, :, None, :, None, :] + off / norm[None, None, None, :,
                                                       None, :]
    else:
        off = off / norm[None, None, None, :, None, :]
        off = off.view(B, Q, heads, L, points // z_anchors, z_anchors, 2)
        loc = ref[:, :, None, None, None, :, :] + off
        loc = loc.reshape(B, Q, heads, L, points, 2)
    out = torch_msda(v, shapes, loc, w)
    if output_proj:
        out = t_lin(out, sd, f"{p}.output_proj")
        return identity + out
    return out


# ------------------------------------------------------------------ CNW

def test_cnw_fusion_golden():
    from unibev_tpu.models.transformer_fusion import UniBEVTransformer
    rng = np.random.RandomState(0)
    B, HW = 1, 16
    img = rng.randn(B, HW, C).astype(np.float32)
    pts = rng.randn(B, HW, C).astype(np.float32)
    img_w = rng.randn(C).astype(np.float32)
    pts_w = rng.randn(C).astype(np.float32)

    tfm = UniBEVTransformer(embed_dims=C, feature_norm="ChannelNormWeights",
                            fusion_method="linear", bev_h=4, bev_w=4)

    def run(l_flag, c_flag):
        a, b = tfm.channel_feature_norm(
            jnp.asarray(img), jnp.asarray(pts), jnp.float32(l_flag),
            jnp.float32(c_flag),
            cnw_weights=(jnp.asarray(img_w), jnp.asarray(pts_w)))
        out = tfm.multi_modal_fusion(a, b, jnp.float32(l_flag),
                                     jnp.float32(c_flag))
        return np.asarray(out)

    def twin(l_flag, c_flag):
        # reference: stack [img, pts]; joint softmax iff both flags on,
        # else one-sided softmax over a single row == 1.0 (:327-337)
        t_img, t_pts = torch.as_tensor(img), torch.as_tensor(pts)
        fw = torch.stack([torch.as_tensor(img_w), torch.as_tensor(pts_w)])
        if c_flag == 1 and l_flag == 1:
            n = fw.softmax(dim=0)
            iw, pw = n[0], n[1]
        else:
            iw = fw[0:1].softmax(dim=0)[0]
            pw = fw[1:2].softmax(dim=0)[0]
        a = t_img * iw
        b = t_pts * pw
        return (c_flag * a + l_flag * b).numpy()

    for l, c in ((1.0, 1.0), (1.0, 0.0), (0.0, 1.0)):
        np.testing.assert_allclose(run(l, c), twin(l, c), **rtol)


# ------------------------------------------------------- decoder layer

@pytest.mark.parametrize("dims", [
    # (C, heads, jax dtype, tolerance): toy fp32 exactness, plus the
    # FLAGSHIP-dim bf16 drift bound (VERDICT r2 #7) — the reference keeps
    # these zones fp32 via force_fp32 (unibev_head.py:424); the repo runs
    # them bf16 and this tolerance is the measured/asserted numeric bound.
    (32, 4, "float32", dict(rtol=2e-4, atol=2e-4)),
    (256, 8, "bfloat16", dict(rtol=4e-2, atol=4e-2)),
], ids=["toy_fp32", "flagship_bf16"])
def test_decoder_layer_with_refinement_golden(dims):
    from unibev_tpu.models.decoder import DetectionTransformerDecoder

    C, HEADS, jdtype, tol = dims
    jdtype = jnp.dtype(jdtype)

    rng = np.random.RandomState(1)
    sd = {}
    decoder_keys(sd, rng, n_layers=2, C=C, heads=HEADS)
    head_keys(sd, rng, C=C, num_query=5, bev_hw=(4, 4), num_classes=3,
              code_size=10, num_pred=2)
    conv = convert_state_dict(sd, num_heads=HEADS)
    assert conv["unmapped"] == []
    dec_params = conv["params"]["pts_bbox_head"]["transformer"]["decoder"]
    reg_params = [conv["params"]["pts_bbox_head"][f"reg_branch{i}"]
                  for i in range(2)]

    B, Q, H, W = 1, 5, 6, 7
    query = rng.randn(B, Q, C).astype(np.float32)
    qpos = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, H * W, C).astype(np.float32)
    ref0 = rng.rand(B, Q, 3).astype(np.float32)

    from unibev_tpu.models.heads.unibev_head import Branch
    branches = [Branch(10, C, kind="reg", dtype=jdtype, name=f"reg_branch{i}")
                for i in range(2)]

    dec = DetectionTransformerDecoder(num_layers=2, embed_dims=C,
                                      num_heads=HEADS, ffn_dims=2 * C,
                                      dtype=jdtype,
                                      cross_attn_cfg=dict(num_levels=1,
                                                          num_heads=HEADS))

    def reg_fn(i):
        return lambda x: branches[i].apply({"params": reg_params[i]}, x)

    states, refs = dec.apply(
        {"params": dec_params}, jnp.asarray(query), jnp.asarray(value),
        jnp.asarray(qpos), jnp.asarray(ref0), ((H, W),),
        reg_branches=[reg_fn(0), reg_fn(1)])
    states = np.asarray(states, np.float32)
    refs = np.asarray(refs, np.float32)
    rtol = tol

    # ---- torch twin (decoder.py:94-126 semantics)
    def t_reg(x, i):
        h = F.relu(t_lin(x, sd, f"pts_bbox_head.reg_branches.{i}.0"))
        h = F.relu(t_lin(h, sd, f"pts_bbox_head.reg_branches.{i}.2"))
        return t_lin(h, sd, f"pts_bbox_head.reg_branches.{i}.4")

    def inv_sig(x, eps=1e-5):
        x = x.clamp(0, 1)
        return (x.clamp(eps) / (1 - x).clamp(eps)).log()

    tq = torch.as_tensor(query)
    tqp = torch.as_tensor(qpos)
    tv = torch.as_tensor(value)
    tref = torch.as_tensor(ref0)
    t_states, t_refs = [], []
    for i in range(2):
        p = f"pts_bbox_head.transformer.decoder.layers.{i}"
        t_refs.append(tref.clone())
        # MHA self-attn (q/k get pos, value does not)
        wq, wk, wv = torch.as_tensor(
            sd[f"{p}.attentions.0.attn.in_proj_weight"]).chunk(3)
        bq, bk, bv = torch.as_tensor(
            sd[f"{p}.attentions.0.attn.in_proj_bias"]).chunk(3)
        q = (tq + tqp) @ wq.T + bq
        k = (tq + tqp) @ wk.T + bk
        v = tq @ wv.T + bv
        hd = C // HEADS
        qh = q.view(1, Q, HEADS, hd).transpose(1, 2)
        kh = k.view(1, Q, HEADS, hd).transpose(1, 2)
        vh = v.view(1, Q, HEADS, hd).transpose(1, 2)
        attn = (qh @ kh.transpose(-1, -2) / hd ** 0.5).softmax(-1)
        o = (attn @ vh).transpose(1, 2).reshape(1, Q, C)
        o = t_lin(o, sd, f"{p}.attentions.0.attn.out_proj")
        tq = tq + o
        tq = t_ln(tq, sd, f"{p}.norms.0")
        # cross-attn at ref xy
        ref2d = tref[..., None, :2]
        tq = t_msda_attn(tq, tv, ref2d, ((H, W),), sd, f"{p}.attentions.1",
                         points=4, query_pos=tqp, heads=HEADS)
        tq = t_ln(tq, sd, f"{p}.norms.1")
        tq = t_ffn(tq, sd, p)
        tq = t_ln(tq, sd, f"{p}.norms.2")
        t_states.append(tq.clone())
        tmp = t_reg(tq, i)
        xy = torch.sigmoid(tmp[..., 0:2] + inv_sig(tref[..., 0:2]))
        z = torch.sigmoid(tmp[..., 4:5] + inv_sig(tref[..., 2:3]))
        tref = torch.cat([xy, z], -1).detach()

    np.testing.assert_allclose(states, torch.stack(t_states).numpy(), **rtol)
    np.testing.assert_allclose(refs, torch.stack(t_refs).numpy(), **rtol)


# ------------------------------------------------------------ ImgLayer

@pytest.mark.parametrize("rebatch_k,dims", [
    (0, (32, 4, "float32", dict(rtol=2e-4, atol=2e-4))),
    (36, (32, 4, "float32", dict(rtol=2e-4, atol=2e-4))),
    # flagship-dim bf16 drift bound (VERDICT r2 #7); reference analog keeps
    # SCA fp32 via force_fp32 (spatial_cross_attention_img.py:67)
    (36, (256, 8, "bfloat16", dict(rtol=4e-2, atol=4e-2))),
], ids=["dense_fp32", "rebatch_fp32", "rebatch_flagship_bf16"])
def test_img_layer_golden(rebatch_k, dims):
    from unibev_tpu.models.encoders import BEVEncoderLayer

    C, HEADS, jdtype, tol = dims
    jdtype = jnp.dtype(jdtype)

    rng = np.random.RandomState(2)
    sd = {}
    encoder_keys(sd, rng, "img", n_layers=1, C=C, sca_points=8, heads=HEADS)
    conv = convert_state_dict(sd, num_heads=HEADS)
    assert conv["unmapped"] == []
    lp = conv["params"]["pts_bbox_head"]["transformer"]["img_encoder"]["layer0"]

    B, N, bev_h, bev_w, Z = 1, 2, 6, 6, 4
    Q = bev_h * bev_w
    vh, vw = 5, 7
    query = rng.randn(B, Q, C).astype(np.float32)
    bev_pos = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, N, vh * vw, C).astype(np.float32)
    ref_cam = rng.rand(B, N, Q, Z, 2).astype(np.float32) * 1.3 - 0.15
    anchor_hit = (ref_cam > 0).all(-1) & (ref_cam < 1).all(-1)  # (B,N,Q,Z)
    hit = anchor_hit.any(-1)
    ref2d = ((np.stack(np.meshgrid(np.arange(bev_w), np.arange(bev_h)),
                       -1).reshape(Q, 1, 2) + 0.5)
             / np.array([bev_w, bev_h])).astype(np.float32)

    sca_cfg = dict(deformable_attention=dict(embed_dims=C, num_points=8,
                                             num_levels=1, num_heads=HEADS),
                   num_cams=N)
    if rebatch_k:
        sca_cfg["rebatch_k"] = rebatch_k
        order = np.argsort(~hit, axis=-1, kind="stable")
        topk = order[..., :rebatch_k].astype(np.int32)
    else:
        topk = None
    layer = BEVEncoderLayer(
        embed_dims=C, ffn_dims=2 * C, modality="img", dtype=jdtype,
        tsa_cfg=dict(embed_dims=C, num_heads=HEADS, num_levels=1,
                     num_points=4),
        sca_cfg=sca_cfg)
    out = layer.apply(
        {"params": lp}, jnp.asarray(query), jnp.asarray(value),
        jnp.asarray(bev_pos), jnp.asarray(ref2d), (bev_h, bev_w),
        jnp.asarray(ref_cam), jnp.asarray(hit), ((vh, vw),),
        topk_idx=None if topk is None else jnp.asarray(topk))
    out = np.asarray(out, np.float32)
    rtol = tol

    # ---- torch twin (ImgLayer op order, encoder_unibev_detr_img.py:413-481)
    p = "pts_bbox_head.transformer.img_bev_encoder.layers.0"
    tq = torch.as_tensor(query)
    tq = t_msda_attn(tq, tq, torch.as_tensor(ref2d)[None], ((bev_h, bev_w),),
                     sd, f"{p}.attentions.0", points=4,
                     query_pos=torch.as_tensor(bev_pos), heads=HEADS)
    tq = t_ln(tq, sd, f"{p}.norms.0")
    # SCA: per-camera nonzero rebatch + scatter/count
    # (spatial_cross_attention_img.py:141-215)
    slots = torch.zeros(B, Q, C)
    da = f"{p}.attentions.1.deformable_attention"
    for n in range(N):
        idx = np.nonzero(hit[0, n])[0]
        if len(idx) == 0:
            continue
        q_reb = tq[:, idx]
        ref_reb = torch.as_tensor(ref_cam[:, n, idx])        # (1, K, Z, 2)
        v = torch.as_tensor(value[:, n])
        o = t_msda_attn(q_reb, v, ref_reb, ((vh, vw),), sd, da, points=8,
                        z_anchors=Z, output_proj=False, heads=HEADS)
        slots[0, idx] += o[0]
    count = torch.as_tensor(hit.sum(1)).clamp(min=1)
    slots = slots / count[..., None]
    slots = t_lin(slots, sd, f"{p}.attentions.1.output_proj")
    tq = slots + tq
    tq = t_ln(tq, sd, f"{p}.norms.1")
    tq = t_ffn(tq, sd, p)
    tq = t_ln(tq, sd, f"{p}.norms.2")

    np.testing.assert_allclose(out, tq.numpy(), **rtol)


# ------------------------------------------------------------ head loss

def test_head_loss_single_golden():
    from scipy.optimize import linear_sum_assignment

    from unibev_tpu.flagship import flagship_model_cfg
    from unibev_tpu.models.heads.unibev_head import UniBEVHead

    rng = np.random.RandomState(3)
    ncls, Q, G = 3, 8, 3
    cls_scores = rng.randn(1, Q, ncls).astype(np.float32)
    bbox_preds = rng.randn(1, Q, 10).astype(np.float32)
    gt = np.zeros((1, G, 9), np.float32)
    gt[0, :, 0:2] = rng.uniform(-10, 10, (G, 2))
    gt[0, :, 2] = rng.uniform(-2, 0, G)
    gt[0, :, 3:6] = rng.uniform(0.5, 3, (G, 3))
    gt[0, :, 6] = rng.uniform(-3, 3, G)
    gt[0, :, 7:9] = rng.randn(G, 2)
    labels = rng.randint(0, ncls, (1, G))
    valid = np.array([[True, True, False]])

    head = UniBEVHead(
        num_classes=ncls, in_channels=C, num_query=Q, bev_h=4, bev_w=4,
        pc_range=(-54, -54, -5, 54, 54, 3),
        loss_cls=dict(use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(loss_weight=0.25),
        train_cfg=dict(assigner=dict(
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBox3DL1CostBEVFormer", weight=0.25))))
    variables = head.init(
        dict(params=jax.random.PRNGKey(0)), jnp.asarray(cls_scores),
        jnp.asarray(bbox_preds), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(valid), method=UniBEVHead.loss_single)
    cls_l, bbox_l = head.apply(
        variables, jnp.asarray(cls_scores), jnp.asarray(bbox_preds),
        jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid),
        method=UniBEVHead.loss_single)

    # ---- numpy/scipy twin (unibev_head.py:354-422 + hungarian assigner)
    def normalize(b):
        return np.concatenate(
            [b[..., 0:2], np.log(b[..., 3:5]), b[..., 2:3],
             np.log(b[..., 5:6]), np.sin(b[..., 6:7]), np.cos(b[..., 6:7]),
             b[..., 7:9]], -1)

    gtv = gt[0][valid[0]]
    glab = labels[0][valid[0]]
    p = 1 / (1 + np.exp(-cls_scores[0]))
    eps = 1e-12
    pos_cost = -np.log(p + eps) * 0.25 * (1 - p) ** 2
    neg_cost = -np.log(1 - p + eps) * 0.75 * p ** 2
    cls_cost = 2.0 * (pos_cost - neg_cost)[:, glab]
    ngt = normalize(gtv)
    reg_cost = 0.25 * np.abs(
        bbox_preds[0][:, None, :8] - ngt[None, :, :8]).sum(-1)
    r, c = linear_sum_assignment(cls_cost + reg_cost)

    tgt_labels = np.full(Q, ncls)
    tgt_labels[r] = glab[c]
    num_pos = float(len(r))
    onehot = np.zeros((Q, ncls))
    for i in range(Q):
        if tgt_labels[i] < ncls:
            onehot[i, tgt_labels[i]] = 1
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    focal = -alpha_t * (1 - pt) ** 2 * np.log(np.clip(pt, 1e-12, None))
    exp_cls = 2.0 * focal.sum() / max(num_pos, 1)

    cw = np.array([1] * 8 + [0.2, 0.2])
    diff = np.zeros((Q, 10))
    for i, j in zip(r, c):
        diff[i] = np.abs(bbox_preds[0][i] - ngt[j]) * cw
    exp_bbox = 0.25 * diff.sum() / max(num_pos, 1)

    np.testing.assert_allclose(float(cls_l), exp_cls, rtol=1e-3)
    np.testing.assert_allclose(float(bbox_l), exp_bbox, rtol=1e-3)


# ------------------------------------------------ MLP-CNW + modal embeds

@pytest.mark.parametrize("variant,act", [
    ("MLP_ChannelNormWeights", F.relu),
    ("Leaky_ReLU_MLP_ChannelNormWeights", F.leaky_relu),
    ("ELU_MLP_ChannelNormWeights", F.elu),
    ("Sigmoid_MLP_ChannelNormWeights", torch.sigmoid),
])
def test_mlp_cnw_golden(variant, act):
    """MLP-CNW is a SINGLE Linear(2HW->2) + variant activation over
    (B, C, 2HW), softmaxed across the 2 modal logits when both flags are on
    (reference transformer_fusion.py:136-151, forward :345-363) — weights fed
    through convert_state_dict to also pin the channel_weights_proj.* map."""
    import flax.linen as nn
    from unibev_tpu.models.transformer_fusion import UniBEVTransformer

    rng = np.random.RandomState(1)
    B, h, w = 1, 4, 4
    HW = h * w
    img = rng.randn(B, HW, C).astype(np.float32)
    pts = rng.randn(B, HW, C).astype(np.float32)

    sd = {
        "pts_bbox_head.transformer.channel_weights_proj.0.weight":
            rng.randn(2, 2 * HW).astype(np.float32) * 0.1,
        "pts_bbox_head.transformer.channel_weights_proj.0.bias":
            rng.randn(2).astype(np.float32) * 0.1,
        "pts_bbox_head.transformer.modal_embbeding_mlp.0.weight":
            rng.randn(C // 2, 2).astype(np.float32),
        "pts_bbox_head.transformer.modal_embbeding_mlp.0.bias":
            rng.randn(C // 2).astype(np.float32),
        "pts_bbox_head.transformer.modal_embbeding_mlp.2.weight":
            rng.randn(C, C // 2).astype(np.float32),
        "pts_bbox_head.transformer.modal_embbeding_mlp.2.bias":
            rng.randn(C).astype(np.float32),
    }
    out = convert_state_dict(sd)
    assert out["unmapped"] == [], out["unmapped"]
    params = out["params"]["pts_bbox_head"]["transformer"]

    class _Fuse(UniBEVTransformer):
        @nn.compact
        def __call__(self, a, b, l_flag, c_flag):
            a, b = self.channel_feature_norm(a, b, l_flag, c_flag)
            return self.multi_modal_fusion(a, b, l_flag, c_flag)

    tfm = _Fuse(embed_dims=C, feature_norm=variant, fusion_method="linear",
                use_modal_embeds="MLP", bev_h=h, bev_w=w)

    def run(l_flag, c_flag):
        return np.asarray(tfm.apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(pts),
            jnp.float32(l_flag), jnp.float32(c_flag)))

    def twin(l_flag, c_flag):
        t_img = torch.as_tensor(img) if c_flag else torch.zeros(B, HW, C)
        t_pts = torch.as_tensor(pts) if l_flag else torch.zeros(B, HW, C)
        x = torch.cat([t_img, t_pts], dim=1).permute(0, 2, 1)  # (B, C, 2HW)
        logits = act(t_lin(
            x, sd, "pts_bbox_head.transformer.channel_weights_proj.0"))
        if c_flag == 1 and l_flag == 1:
            n = logits.softmax(dim=-1)
            iw, pw = n[..., 0], n[..., 1]
        else:
            iw = logits[..., :1].softmax(dim=-1).squeeze(-1)
            pw = logits[..., 1:].softmax(dim=-1).squeeze(-1)
        a = t_img * iw[:, None, :]
        b = t_pts * pw[:, None, :]
        fused = c_flag * a + l_flag * b
        status = torch.tensor([c_flag, l_flag], dtype=torch.float32)
        e = F.relu(t_lin(
            status, sd, "pts_bbox_head.transformer.modal_embbeding_mlp.0"))
        e = F.relu(t_lin(
            e, sd, "pts_bbox_head.transformer.modal_embbeding_mlp.2"))
        return (fused + e).numpy()

    for l_flag, c_flag in ((1.0, 1.0), (1.0, 0.0), (0.0, 1.0)):
        got = run(l_flag, c_flag)
        # dropped-modality branch enters the jax path as zeros too
        np.testing.assert_allclose(got, twin(l_flag, c_flag), **rtol)
