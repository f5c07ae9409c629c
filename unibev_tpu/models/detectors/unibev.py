"""UniBEV detector: multi-modal feature extraction -> fused BEV head.

Structure from /root/reference/projects/UniBEV/unibev_plugin/models/
detectors/unibev_detector.py: modality flags (:29-32,69-71), GridMask on
images (:73-75,95-96), camera branch reshape (B,N,...) -> backbone -> neck
(:86-110), LiDAR branch voxelize -> VFE -> middle -> SECOND -> FPN
(:112-124), head consuming BOTH feature lists (:224-294 train, :296-343 test).

Static-shape batch contract (everything padded):
  batch = dict(
    img=(B, N, H, W, 3) float or absent,
    points=(B, P, 5), points_mask=(B, P) or absent,
    lidar2img=(B, N, 4, 4),
    gt_bboxes=(B, G, 9), gt_labels=(B, G), gt_valid=(B, G)  [train only]
  )
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.models.backbones.resnet import ResNet
from unibev_tpu.models.backbones.second import SECOND
from unibev_tpu.models.gridmask import grid_mask
from unibev_tpu.models.heads.unibev_head import UniBEVHead
from unibev_tpu.models.middle_encoder import SparseEncoder
from unibev_tpu.models.necks.fpn import FPN, SECONDFPN
from unibev_tpu.models.transformer_fusion import sample_modality_flags
from unibev_tpu.ops.voxelize import voxelize_and_encode
from unibev_tpu.registry import DETECTORS


def _clean(cfg: Optional[dict]) -> dict:
    out = dict(cfg or {})
    out.pop("type", None)
    return out


@DETECTORS.register_module(name="UniBEV")
class UniBEV(nn.Module):
    use_grid_mask: bool = True
    use_lidar: bool = True
    use_camera: bool = True
    use_radar: bool = False
    pts_voxel_layer: Optional[dict] = None
    pts_voxel_encoder: Optional[dict] = None
    pts_middle_encoder: Optional[dict] = None
    radar_voxel_layer: Optional[dict] = None
    radar_voxel_encoder: Optional[dict] = None
    radar_middle_encoder: Optional[dict] = None
    pts_backbone: Optional[dict] = None
    pts_neck: Optional[dict] = None
    img_backbone: Optional[dict] = None
    img_neck: Optional[dict] = None
    pts_bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    img_shape: Tuple[int, int] = (900, 1600)   # normalization shape (pre-pad)
    dtype: jnp.dtype = jnp.float32

    @property
    def compute_dtype(self):
        """Config files pass dtype as a string ('bfloat16'); coerce once."""
        return jnp.dtype(self.dtype) if isinstance(self.dtype, str) else self.dtype

    def setup(self):
        if self.use_camera and self.img_backbone is not None:
            cfg = _clean(self.img_backbone)
            self.backbone_img = ResNet(
                depth=cfg.get("depth", 101),
                num_stages=cfg.get("num_stages", 4),
                out_indices=tuple(cfg.get("out_indices", (3,))),
                frozen_stages=cfg.get("frozen_stages", 1),
                style=cfg.get("style", "caffe"),
                with_cp=cfg.get("with_cp", False),
                stage_with_dcn=tuple(cfg.get("stage_with_dcn",
                                             (False, False, False, False))),
                dcn=cfg.get("dcn"),
                dtype=self.compute_dtype, name="img_backbone")
            ncfg = _clean(self.img_neck)
            self.neck_img = FPN(
                in_channels=tuple(ncfg.get("in_channels", (2048,))),
                out_channels=ncfg.get("out_channels", 256),
                num_outs=ncfg.get("num_outs", 1),
                start_level=ncfg.get("start_level", 0),
                add_extra_convs=ncfg.get("add_extra_convs", "on_output"),
                relu_before_extra_convs=ncfg.get("relu_before_extra_convs", True),
                dtype=self.compute_dtype, name="img_neck")

        if (self.use_lidar or self.use_radar) and self.pts_backbone is not None:
            bcfg = _clean(self.pts_backbone)
            self.backbone_pts = SECOND(
                in_channels=bcfg.get("in_channels", 256),
                out_channels=tuple(bcfg.get("out_channels", (128, 256))),
                layer_nums=tuple(bcfg.get("layer_nums", (5, 5))),
                layer_strides=tuple(bcfg.get("layer_strides", (1, 2))),
                dtype=self.compute_dtype, name="pts_backbone")
            ncfg = _clean(self.pts_neck)
            self.neck_pts = SECONDFPN(
                in_channels=tuple(ncfg.get("in_channels", (128, 256))),
                out_channels=tuple(ncfg.get("out_channels", (128, 128))),
                upsample_strides=tuple(ncfg.get("upsample_strides", (1, 2))),
                use_conv_for_no_stride=ncfg.get("use_conv_for_no_stride", True),
                dtype=self.compute_dtype, name="pts_neck")

        if self.use_lidar and self.pts_middle_encoder is not None:
            mcfg = _clean(self.pts_middle_encoder)
            self.middle_encoder = SparseEncoder(
                in_channels=mcfg.get("in_channels", 5),
                sparse_shape=tuple(mcfg.get("sparse_shape", (41, 1440, 1440))),
                output_channels=mcfg.get("output_channels", 128),
                encoder_channels=tuple(tuple(c) for c in mcfg.get(
                    "encoder_channels",
                    ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)))),
                encoder_paddings=tuple(
                    tuple(p) if isinstance(p, (list, tuple)) else p
                    for p in mcfg.get("encoder_paddings",
                                      ((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                                       (0, 0)))),
                capacities=tuple(mcfg.get("capacities",
                                          (120000, 90000, 60000, 40000))),
                table_dtype=mcfg.get("table_dtype", "bf16"),
                dtype=self.compute_dtype, name="pts_middle_encoder")

        if self.use_radar and self.radar_middle_encoder is not None:
            from unibev_tpu.models.radar import (PillarFeatureNet,
                                                 PointPillarsScatter)
            rv = dict(self.radar_voxel_layer or {})
            self.radar_voxel_size = tuple(rv.get("voxel_size", (0.8, 0.8, 8.0)))
            self.radar_pc_range = tuple(rv.get("point_cloud_range",
                                               (-54, -54, -5, 54, 54, 3)))
            rmv = rv.get("max_voxels", (30000, 40000))
            self.radar_max_voxels = rmv[1] if isinstance(rmv, (tuple, list)) else rmv
            self.radar_max_points = rv.get("max_num_points", 20)
            rgx = int(round((self.radar_pc_range[3] - self.radar_pc_range[0])
                            / self.radar_voxel_size[0]))
            rgy = int(round((self.radar_pc_range[4] - self.radar_pc_range[1])
                            / self.radar_voxel_size[1]))
            self.radar_grid = (rgx, rgy, 1)
            ve = _clean(self.radar_voxel_encoder)
            self.radar_vfe = PillarFeatureNet(
                in_channels=ve.get("in_channels", 7),
                feat_channels=tuple(ve.get("feat_channels", (64,))),
                voxel_size=self.radar_voxel_size,
                point_cloud_range=self.radar_pc_range,
                dtype=self.compute_dtype, name="radar_voxel_encoder")
            me = _clean(self.radar_middle_encoder)
            self.radar_scatter = PointPillarsScatter(
                in_channels=me.get("in_channels", 64),
                output_shape=tuple(me.get("output_shape", (rgy, rgx))),
                name="radar_middle_encoder")

        hcfg = _clean(self.pts_bbox_head)
        train_cfg_pts = ((self.train_cfg or {}).get("pts") or {})
        self.head = UniBEVHead(
            num_classes=hcfg.get("num_classes", 10),
            in_channels=hcfg.get("in_channels", 256),
            num_query=hcfg.get("num_query", 900),
            bev_h=hcfg.get("bev_h", 200),
            bev_w=hcfg.get("bev_w", 200),
            sync_cls_avg_factor=hcfg.get("sync_cls_avg_factor", True),
            with_box_refine=hcfg.get("with_box_refine", True),
            as_two_stage=hcfg.get("as_two_stage", False),
            dual_queries=hcfg.get("dual_queries", False),
            transformer=hcfg.get("transformer"),
            bbox_coder=hcfg.get("bbox_coder"),
            positional_encoding=hcfg.get("positional_encoding"),
            loss_cls=hcfg.get("loss_cls"),
            loss_bbox=hcfg.get("loss_bbox"),
            train_cfg=train_cfg_pts,
            use_img=self.use_camera,
            use_pts=self.use_lidar or self.use_radar,
            query_chunk=hcfg.get("query_chunk", 0),
            dtype=self.compute_dtype, name="pts_bbox_head")

        vcfg = dict(self.pts_voxel_layer or {})
        self.voxel_size = tuple(vcfg.get("voxel_size", (0.075, 0.075, 0.2)))
        self.pc_range = tuple(vcfg.get("point_cloud_range",
                                       (-54, -54, -5, 54, 54, 3)))
        mv = vcfg.get("max_voxels", (90000, 120000))
        self.max_voxels = mv[1] if isinstance(mv, (tuple, list)) else mv
        self.max_points_per_voxel = vcfg.get("max_num_points", 10)
        gx = int(round((self.pc_range[3] - self.pc_range[0]) / self.voxel_size[0]))
        gy = int(round((self.pc_range[4] - self.pc_range[1]) / self.voxel_size[1]))
        gz = int(round((self.pc_range[5] - self.pc_range[2]) / self.voxel_size[2]))
        self.grid_size = (gx, gy, gz)

    # ---------------------------------------------------------------- feats

    def extract_img_feat(self, img, *, train: bool = False):
        """img: (B, N, H, W, 3) -> list of (B, N, h, w, C)."""
        B, N, H, W, _ = img.shape
        x = img.reshape(B * N, H, W, 3)
        if self.use_grid_mask and train:
            key = self.make_rng("gridmask")
            x = grid_mask(x, key)
        feats = self.backbone_img(x.astype(self.compute_dtype))
        feats = self.neck_img(feats)
        return [f.reshape(B, N, *f.shape[1:]) for f in feats]

    def extract_pts_feat(self, points, points_mask, *, train: bool = False):
        """points: (B, P, 5) -> list of (B, H, W, C) BEV maps."""
        B = points.shape[0]
        res = jax.vmap(
            lambda p, m: voxelize_and_encode(
                p, m, self.voxel_size, self.pc_range, self.grid_size,
                self.max_voxels, self.max_points_per_voxel))(points, points_mask)
        # Fold batch: (B, V, ...) -> (B*V, ...) with batch idx prepended.
        V = res.feats.shape[1]
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, V, 1))
        # res.coords rows are (z, y, x) already — prepend the batch index.
        coords = jnp.concatenate([batch_idx, res.coords], axis=-1)
        coords = coords.reshape(B * V, 4)
        feats = res.feats.reshape(B * V, -1)
        mask = res.mask.reshape(B * V)
        coords = jnp.where(mask[:, None], coords, -1)

        bev = self.middle_encoder(feats.astype(self.compute_dtype), coords, mask, B,
                                  train=train)
        outs = self.backbone_pts(bev, train=train)
        return [self.neck_pts(outs, train=train)]

    def extract_radar_feat(self, radar, radar_mask, *, train: bool = False):
        """radar: (B, R, F) radar points -> list of (B, H, W, C) BEV maps.

        Mirrors the reference path (unibev_detector.py:126-141): pillar
        voxelize -> radar VFE -> scatter to dense BEV -> SECOND -> FPN.
        """
        B = radar.shape[0]
        res = jax.vmap(
            lambda p, m: voxelize_and_encode(
                p, m, self.radar_voxel_size, self.radar_pc_range,
                self.radar_grid, self.radar_max_voxels,
                self.radar_max_points))(radar, radar_mask)
        V = res.feats.shape[1]
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, V, 1))
        coords = jnp.concatenate([batch_idx, res.coords], axis=-1)
        coords = coords.reshape(B * V, 4)
        feats = res.feats.reshape(B * V, -1)
        mask = res.mask.reshape(B * V)
        coords = jnp.where(mask[:, None], coords, -1)

        pillars = self.radar_vfe(feats, coords[:, 1:], mask, train=train)
        bev = self.radar_scatter(pillars, coords, mask, B, train=train)
        outs = self.backbone_pts(bev, train=train)
        return [self.neck_pts(outs, train=train)]

    # -------------------------------------------------------------- forward

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        img = batch.get("img") if self.use_camera else None
        points = batch.get("points") if self.use_lidar else None
        radar = batch.get("radar") if self.use_radar else None

        img_feats = None
        pts_feats = None
        if img is not None:
            img_feats = self.extract_img_feat(img, train=train)
        if points is not None:
            pts_feats = self.extract_pts_feat(
                points, batch.get("points_mask",
                                  jnp.ones(points.shape[:2], bool)),
                train=train)
        if radar is not None:
            # The reference forbids LiDAR+radar together
            # (unibev_detector.py:284-285); radar feeds the 'pts' slot.
            assert pts_feats is None, "lidar and radar are mutually exclusive"
            pts_feats = self.extract_radar_feat(
                radar, batch.get("radar_mask",
                                 jnp.ones(radar.shape[:2], bool)),
                train=train)

        # Modality-dropout flags: traced scalars; forced by absent inputs.
        drop_cfg = (dict(self.pts_bbox_head or {}).get("transformer") or {}).get(
            "drop_modality")
        if train and drop_cfg and img_feats is not None and pts_feats is not None:
            if isinstance(drop_cfg, dict):
                p_md = drop_cfg.get("dropout_prob", 0.5)
                p_l = drop_cfg.get("lidar_prob", 0.5)
            else:
                p_md, p_l = float(drop_cfg), 0.5
            l_flag, c_flag = sample_modality_flags(
                self.make_rng("modality"), p_md, p_l)
        else:
            l_flag = jnp.float32(1.0 if pts_feats is not None else 0.0)
            c_flag = jnp.float32(1.0 if img_feats is not None else 0.0)

        lidar2img = batch.get("lidar2img")
        preds = self.head(img_feats, pts_feats, lidar2img, self.img_shape,
                          l_flag, c_flag, deterministic=not train)
        return preds

    def loss(self, batch: Dict[str, jnp.ndarray], preds) -> Dict[str, jnp.ndarray]:
        return self.head.loss(preds, batch["gt_bboxes"], batch["gt_labels"],
                              batch["gt_valid"])

    def predict(self, batch: Dict[str, jnp.ndarray]):
        preds = self(batch, train=False)
        return self.head.get_bboxes(preds)
