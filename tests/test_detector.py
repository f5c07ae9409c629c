"""End-to-end integration: tiny UniBEV forward-train + loss + predict.

A scaled-down analog of unibev_nus_LC_cnw_256_modality_dropout: 2 cameras,
small BEV, shallow backbones — exercises every layer of the stack.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unibev_tpu.models.detectors.unibev import UniBEV


def tiny_model_cfg(use_lidar=True, use_camera=True, fusion="linear",
                   feature_norm="ChannelNormWeights"):
    dim = 32
    return dict(
        use_grid_mask=True,
        use_lidar=use_lidar,
        use_camera=use_camera,
        img_shape=(64, 96),
        pts_voxel_layer=dict(max_num_points=5,
                             voxel_size=(0.6, 0.6, 4.0 / 24),
                             point_cloud_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0),
                             max_voxels=(2000, 2000)),
        # z chain 25 -> 13 -> 7 -> 3 -> conv_out 1 (same structure as the real
        # 41 -> 21 -> 11 -> 5 -> 2)
        pts_middle_encoder=dict(in_channels=5, sparse_shape=(25, 32, 32),
                                output_channels=32,
                                encoder_channels=((8, 8, 16), (16, 16, 32),
                                                  (32, 32, 32), (32, 32)),
                                encoder_paddings=((0, 0, 1), (0, 0, 1),
                                                  (0, 0, (0, 1, 1)), (0, 0)),
                                capacities=(2000, 1500, 1000, 800)),
        pts_backbone=dict(in_channels=32, out_channels=(32, 64),
                          layer_nums=(1, 1), layer_strides=(1, 2)),
        pts_neck=dict(in_channels=(32, 64), out_channels=(16, 16),
                      upsample_strides=(1, 2)),
        img_backbone=dict(depth=50, num_stages=4, out_indices=(3,),
                          style="caffe",
                          stage_with_dcn=(False, False, False, True),
                          dcn=dict(type="DCNv2")),
        img_neck=dict(in_channels=(2048,), out_channels=dim, num_outs=1),
        pts_bbox_head=dict(
            num_classes=10, in_channels=dim, num_query=24,
            bev_h=8, bev_w=8,
            transformer=dict(
                embed_dims=dim,
                fusion_method=fusion,
                feature_norm=feature_norm,
                drop_modality=0.5,
                num_cams=2,
                img_encoder=dict(num_layers=1,
                                 pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0),
                                 num_points_in_pillar=2,
                                 transformerlayers=dict(
                                     attn_cfgs=[
                                         dict(embed_dims=dim, num_levels=1),
                                         dict(deformable_attention=dict(
                                             embed_dims=dim, num_points=4,
                                             num_levels=1)),
                                     ],
                                     feedforward_channels=dim * 2)),
                pts_encoder=dict(num_layers=1,
                                 pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0),
                                 num_points_in_pillar_lidar=2,
                                 transformerlayers=dict(
                                     attn_cfgs=[
                                         dict(embed_dims=dim, num_levels=1),
                                         dict(deformable_attention=dict(
                                             embed_dims=dim, num_points=4,
                                             num_levels=1)),
                                     ],
                                     feedforward_channels=dim * 2)),
                decoder=dict(num_layers=2,
                             transformerlayers=dict(
                                 attn_cfgs=[
                                     dict(embed_dims=dim, num_heads=4,
                                          dropout=0.1),
                                     dict(embed_dims=dim, num_levels=1),
                                 ],
                                 feedforward_channels=dim * 2))),
            bbox_coder=dict(post_center_range=(-12, -12, -4, 12, 12, 4),
                            pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0),
                            max_num=16, num_classes=10),
            positional_encoding=dict(num_feats=dim // 2, row_num_embed=8,
                                     col_num_embed=8),
            pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0)),
        train_cfg=dict(pts=dict(assigner=dict(
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBox3DL1CostBEVFormer", weight=0.25)))),
    )


def tiny_batch(rng, B=1, N=2, P=1024, G=6):
    img = rng.randn(B, N, 64, 96, 3).astype(np.float32)
    points = rng.uniform(-9, 9, (B, P, 5)).astype(np.float32)
    points[..., 2] = rng.uniform(-1.8, 1.8, (B, P))
    # simple pinhole-ish lidar2img
    l2i = np.zeros((B, N, 4, 4), np.float32)
    for n in range(N):
        K = np.array([[60., 0., 48., 0.], [0., 60., 32., 0.],
                      [0., 0., 1., 0.], [0., 0., 0., 1.]], np.float32)
        R = np.eye(4, dtype=np.float32)
        th = n * np.pi / 2
        R[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                              [0, 0, -1],
                              [np.sin(th), np.cos(th), 0]], np.float32)
        l2i[:, n] = K @ R
    gt = rng.randn(B, G, 9).astype(np.float32)
    gt[..., :2] *= 5
    gt[..., 3:6] = np.abs(gt[..., 3:6]) + 0.5
    labels = rng.randint(0, 10, (B, G))
    valid = np.ones((B, G), bool)
    valid[:, -2:] = False
    return dict(img=jnp.array(img), points=jnp.array(points),
                points_mask=jnp.ones((B, P), bool),
                lidar2img=jnp.array(l2i),
                gt_bboxes=jnp.array(gt), gt_labels=jnp.array(labels),
                gt_valid=jnp.array(valid))


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_model_cfg()
    model = UniBEV(**cfg)
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=True)
    return model, variables, batch


def test_forward_train_and_loss(model_and_vars):
    model, variables, batch = model_and_vars
    preds, _ = model.apply(
        variables, batch, train=True,
        rngs=dict(gridmask=jax.random.PRNGKey(1),
                  modality=jax.random.PRNGKey(2),
                  dropout=jax.random.PRNGKey(3)),
        mutable=["batch_stats"])
    assert preds["all_cls_scores"].shape == (2, 1, 24, 10)
    assert preds["all_bbox_preds"].shape == (2, 1, 24, 10)
    losses = model.apply(variables, batch, preds, method=UniBEV.loss)
    assert set(losses) == {"loss_cls", "loss_bbox", "d0.loss_cls", "d0.loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_gradients_flow(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        v = {**variables, "params": params}
        preds, _ = model.apply(
            v, batch, train=True,
            rngs=dict(gridmask=jax.random.PRNGKey(1),
                      modality=jax.random.PRNGKey(2),
                      dropout=jax.random.PRNGKey(3)),
            mutable=["batch_stats"])
        losses = model.apply(v, batch, preds, method=UniBEV.loss)
        return sum(losses.values())

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.array(l)).all() for l in leaves)
    # CNW weights must receive gradient
    gp = g["pts_bbox_head"]["transformer"]
    assert float(jnp.abs(gp["img_channel_weights"]).sum()) >= 0


def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, batch, method=UniBEV.predict)
    assert out["bboxes"].shape == (1, 16, 9)
    assert out["scores"].shape == (1, 16)
    assert out["labels"].shape == (1, 16)


def test_camera_only_and_lidar_only():
    rng = np.random.RandomState(1)
    batch = tiny_batch(rng)
    for use_l, use_c in [(False, True), (True, False)]:
        cfg = tiny_model_cfg(use_lidar=use_l, use_camera=use_c)
        model = UniBEV(**cfg)
        variables = model.init(
            dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                 modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
            batch, train=False)
        out = model.apply(variables, batch, method=UniBEV.predict)
        assert np.isfinite(np.array(out["bboxes"])).all()


def test_dual_queries_variant():
    rng = np.random.RandomState(3)
    cfg = tiny_model_cfg()
    cfg["pts_bbox_head"]["dual_queries"] = True
    cfg["pts_bbox_head"]["transformer"]["dual_queries"] = True
    model = UniBEV(**cfg)
    batch = tiny_batch(rng)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    # dual queries double the BEV embedding width
    assert variables["params"]["pts_bbox_head"]["bev_embedding"].shape == (64, 64)
    out = model.apply(variables, batch, method=UniBEV.predict)
    assert np.isfinite(np.array(out["bboxes"])).all()


@pytest.mark.parametrize("fusion,feature_norm", [
    ("avg", None),
    ("cat", None),
    ("linear", None),
])
def test_fusion_variants(fusion, feature_norm):
    rng = np.random.RandomState(4)
    cfg = tiny_model_cfg(fusion=fusion, feature_norm=feature_norm)
    if fusion == "cat":
        # decoder runs at 2x dims (dec_scale_factor), mirroring the cat-128
        # config's structure
        dec = cfg["pts_bbox_head"]["transformer"]["decoder"]["transformerlayers"]
        dec["attn_cfgs"][0]["embed_dims"] = 64
        dec["attn_cfgs"][1]["embed_dims"] = 64
        dec["feedforward_channels"] = 128
    model = UniBEV(**cfg)
    batch = tiny_batch(rng)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    if fusion == "cat":
        assert variables["params"]["pts_bbox_head"]["query_embedding"].shape \
            == (24, 128)
    out = model.apply(variables, batch, method=UniBEV.predict)
    assert np.isfinite(np.array(out["bboxes"])).all()
    # train path too (modality dropout flags exercise the fusion arithmetic)
    preds, _ = model.apply(
        variables, batch, train=True,
        rngs=dict(gridmask=jax.random.PRNGKey(1),
                  modality=jax.random.PRNGKey(5),
                  dropout=jax.random.PRNGKey(3)),
        mutable=["batch_stats"])
    losses = model.apply(variables, batch, preds, method=UniBEV.loss)
    assert all(np.isfinite(float(v)) for v in losses.values())


@pytest.mark.parametrize("feature_norm,fusion", [
    ("MLP_ChannelNormWeights", "linear"),
    ("ModalityProjection", "cat"),
])
def test_feature_norm_variants(feature_norm, fusion):
    rng = np.random.RandomState(6)
    cfg = tiny_model_cfg(fusion=fusion, feature_norm=feature_norm)
    if fusion == "cat":
        dec = cfg["pts_bbox_head"]["transformer"]["decoder"]["transformerlayers"]
        dec["attn_cfgs"][0]["embed_dims"] = 64
        dec["attn_cfgs"][1]["embed_dims"] = 64
        dec["feedforward_channels"] = 128
    model = UniBEV(**cfg)
    batch = tiny_batch(rng)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    out = model.apply(variables, batch, method=UniBEV.predict)
    assert np.isfinite(np.array(out["bboxes"])).all()


def test_modal_embeds_variants():
    rng = np.random.RandomState(7)
    for mode in ("MLP", "Fixed"):
        cfg = tiny_model_cfg()
        cfg["pts_bbox_head"]["transformer"]["use_modal_embeds"] = mode
        model = UniBEV(**cfg)
        batch = tiny_batch(rng)
        variables = model.init(
            dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
                 modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
            batch, train=False)
        out = model.apply(variables, batch, method=UniBEV.predict)
        assert np.isfinite(np.array(out["bboxes"])).all()
