"""UniBEVTransformer: per-modality BEV encoding, CNW/avg/cat fusion with
modality dropout, and the object decoder.

Behavioral contract from /root/reference/projects/UniBEV/unibev_plugin/models/
modules/transformer_fusion.py:
  * CNW (:316-384): learned per-channel weights for each modality, softmaxed
    ACROSS modalities when both are live; when one modality is dropped the
    softmax runs per-modality over a single row => weight exactly 1.0 for the
    survivor (intentional asymmetry).  Missing modality features are zeros.
  * fusion (:280-314): linear c*img + l*pts; avg flag-weighted mean; cat
    flag-scaled concat (ModalityProjection pseudo-feature variant for cat).
  * modality dropout (:463-489): train-time Bernoulli — with prob p_md drop
    one modality, choosing LiDAR-survives with prob lidar_prob; flags forced
    by absent inputs.  Flags here are TRACED scalars so a single jitted train
    step serves every combination.
  * decoder wiring (:572-582): object_query_embed splits into (query_pos,
    query); reference_points = Linear(query_pos) -> sigmoid.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.models.decoder import DetectionTransformerDecoder
from unibev_tpu.models.encoders import ImgEncoder, PtsEncoder
from unibev_tpu.models.layers import xavier_uniform
from unibev_tpu.registry import TRANSFORMERS


def sample_modality_flags(key, dropout_prob: float, lidar_prob: float):
    """Train-time modality-dropout flags (l_flag, c_flag) as float scalars."""
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1)
    r2 = jax.random.uniform(k2)
    drop = r1 < dropout_prob
    lidar_survives = r2 < lidar_prob
    l_flag = jnp.where(drop, jnp.where(lidar_survives, 1.0, 0.0), 1.0)
    c_flag = jnp.where(drop, jnp.where(lidar_survives, 0.0, 1.0), 1.0)
    return l_flag, c_flag


@TRANSFORMERS.register_module(name="UniBEVTransformer")
class UniBEVTransformer(nn.Module):
    embed_dims: int = 256
    num_cams: int = 6
    fusion_method: str = "linear"          # linear | avg | cat
    feature_norm: Optional[str] = None      # ChannelNormWeights | MLP_* | ModalityProjection
    spatial_norm: Optional[str] = None      # SpatialNormWeights
    use_modal_embeds: Optional[str] = None  # MLP | Fixed
    drop_modality: Any = None               # float p_md or dict(dropout_prob, lidar_prob)
    dual_queries: bool = False
    bev_h: int = 200
    bev_w: int = 200
    img_encoder: Optional[dict] = None
    pts_encoder: Optional[dict] = None
    decoder: Optional[dict] = None
    use_img: bool = True
    use_pts: bool = True
    query_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @property
    def dec_dims(self) -> int:
        return self.embed_dims * (2 if self.fusion_method == "cat" else 1)

    def _build_img_encoder(self):
        cfg = dict(self.img_encoder or {})
        layers = cfg.pop("transformerlayers", {}) or {}
        attn_cfgs = layers.get("attn_cfgs", [{}, {}])
        return ImgEncoder(
            num_layers=cfg.get("num_layers", 3),
            pc_range=tuple(cfg.get("pc_range", (-54, -54, -5, 54, 54, 3))),
            num_points_in_pillar=cfg.get("num_points_in_pillar", 4),
            embed_dims=self.embed_dims,
            ffn_dims=layers.get("feedforward_channels", self.embed_dims * 2),
            tsa_cfg=dict(attn_cfgs[0]) if attn_cfgs else None,
            sca_cfg={k: v for k, v in dict(attn_cfgs[1]).items()
                     if k not in ("type", "embed_dims")} if len(attn_cfgs) > 1 else None,
            query_chunk=self.query_chunk,
            dtype=self.dtype, name="img_encoder")

    def _build_pts_encoder(self):
        cfg = dict(self.pts_encoder or {})
        layers = cfg.pop("transformerlayers", {}) or {}
        attn_cfgs = layers.get("attn_cfgs", [{}, {}])
        return PtsEncoder(
            num_layers=cfg.get("num_layers", 3),
            pc_range=tuple(cfg.get("pc_range", (-54, -54, -5, 54, 54, 3))),
            num_points_in_pillar_lidar=cfg.get("num_points_in_pillar_lidar", 4),
            embed_dims=self.embed_dims,
            ffn_dims=layers.get("feedforward_channels", self.embed_dims * 2),
            tsa_cfg=dict(attn_cfgs[0]) if attn_cfgs else None,
            sca_cfg={k: v for k, v in dict(attn_cfgs[1]).items()
                     if k not in ("type", "embed_dims")} if len(attn_cfgs) > 1 else None,
            query_chunk=self.query_chunk,
            dtype=self.dtype, name="pts_encoder")

    def _build_decoder(self):
        cfg = dict(self.decoder or {})
        layers = cfg.get("transformerlayers", {}) or {}
        attn_cfgs = layers.get("attn_cfgs", [{}, {}])
        mha = dict(attn_cfgs[0]) if attn_cfgs else {}
        ca = dict(attn_cfgs[1]) if len(attn_cfgs) > 1 else {}
        return DetectionTransformerDecoder(
            num_layers=cfg.get("num_layers", 6),
            embed_dims=self.dec_dims,
            num_heads=mha.get("num_heads", 8),
            ffn_dims=layers.get("feedforward_channels", self.dec_dims * 2),
            dropout=mha.get("dropout", 0.1),
            cross_attn_cfg={k: v for k, v in ca.items() if k != "type"},
            dtype=self.dtype, name="decoder")

    def channel_feature_norm(self, img_bev, pts_bev, l_flag, c_flag,
                             cnw_weights: Optional[tuple] = None,
                             *, deterministic: bool = True):
        """CNW / MLP-CNW / ModalityProjection, with the one-sided-softmax rule.

        ``cnw_weights=(img_w, pts_w)`` bypasses param creation so the method
        is callable standalone (torch-twin goldens); the production path
        (called from the compact ``__call__``) creates them via self.param.
        """
        C = self.embed_dims
        both = (l_flag > 0.5) & (c_flag > 0.5)
        if self.feature_norm == "ChannelNormWeights":
            if cnw_weights is not None:
                img_w, pts_w = cnw_weights
            else:
                img_w = self.param("img_channel_weights",
                                   nn.initializers.normal(1.0), (C,))
                pts_w = self.param("pts_channel_weights",
                                   nn.initializers.normal(1.0), (C,))
            stacked = jnp.stack([img_w, pts_w])             # (2, C)
            joint = jax.nn.softmax(stacked, axis=0)
            # Per-modality softmax over a single row is identically 1.0.
            img_n = jnp.where(both, joint[0], 1.0)
            pts_n = jnp.where(both, joint[1], 1.0)
            # vis_output analog (reference transformer_fusion.py:530-570):
            # intermediates are sown instead of torch.save-dumped; request
            # mutable=['intermediates'] on apply to collect them.  (Guarded
            # so the method stays callable standalone/unbound in goldens.)
            if self.scope is not None:
                self.sow("intermediates", "cnw_feature_weights", stacked)
                self.sow("intermediates", "cnw_img_norm_weights", img_n)
                self.sow("intermediates", "cnw_pts_norm_weights", pts_n)
            img_bev = img_bev * img_n.astype(img_bev.dtype)
            pts_bev = pts_bev * pts_n.astype(pts_bev.dtype)
        elif self.feature_norm in ("MLP_ChannelNormWeights",
                                   "Leaky_ReLU_MLP_ChannelNormWeights",
                                   "ELU_MLP_ChannelNormWeights",
                                   "Sigmoid_MLP_ChannelNormWeights"):
            # Reference (transformer_fusion.py:136-151, forward :345-363):
            # channel_weights_proj = SINGLE Linear(2*H*W -> 2) followed by the
            # variant's activation, applied to (B, C, 2HW); softmax over the
            # 2 modal logits when both flags are on, else a one-element
            # softmax (identically 1.0) per side.
            x = jnp.concatenate([img_bev, pts_bev], axis=1)  # (B, 2HW, C)
            x = x.transpose(0, 2, 1)                          # (B, C, 2HW)
            act = {"Leaky_ReLU_MLP_ChannelNormWeights":
                       lambda t: nn.leaky_relu(t, negative_slope=0.01),
                   "ELU_MLP_ChannelNormWeights": nn.elu,
                   "Sigmoid_MLP_ChannelNormWeights": nn.sigmoid}.get(
                       self.feature_norm, nn.relu)
            logits = act(nn.Dense(2, dtype=self.dtype,
                                  name="channel_weights_proj")(x))  # (B, C, 2)
            joint = jax.nn.softmax(logits, axis=-1)
            img_n = jnp.where(both, joint[..., 0], 1.0)       # (B, C)
            pts_n = jnp.where(both, joint[..., 1], 1.0)
            img_bev = img_bev * img_n[:, None, :].astype(img_bev.dtype)
            pts_bev = pts_bev * pts_n[:, None, :].astype(pts_bev.dtype)
        elif self.feature_norm == "ModalityProjection":
            pseudo_pts = nn.Dense(C, dtype=self.dtype, name="l_modal_proj")(img_bev)
            pseudo_img = nn.Dense(C, dtype=self.dtype, name="c_modal_proj")(pts_bev)
            img_bev = jnp.concatenate([img_bev, pseudo_pts], axis=-1)
            pts_bev = jnp.concatenate([pseudo_img, pts_bev], axis=-1)
        return img_bev, pts_bev

    def spatial_feature_norm(self, img_bev, pts_bev, l_flag, c_flag):
        if self.spatial_norm != "SpatialNormWeights":
            return img_bev, pts_bev
        HW = self.bev_h * self.bev_w
        both = (l_flag > 0.5) & (c_flag > 0.5)
        img_w = self.param("img_spatial_weights", nn.initializers.normal(1.0), (HW,))
        pts_w = self.param("pts_spatial_weights", nn.initializers.normal(1.0), (HW,))
        joint = jax.nn.softmax(jnp.stack([img_w, pts_w]), axis=0)
        img_n = jnp.where(both, joint[0], 1.0)
        pts_n = jnp.where(both, joint[1], 1.0)
        return (img_bev * img_n[None, :, None].astype(img_bev.dtype),
                pts_bev * pts_n[None, :, None].astype(pts_bev.dtype))

    def multi_modal_fusion(self, img_bev, pts_bev, l_flag, c_flag):
        l = l_flag.astype(img_bev.dtype)
        c = c_flag.astype(img_bev.dtype)
        if self.fusion_method == "linear":
            fused = c * img_bev + l * pts_bev
        elif self.fusion_method == "avg":
            denom = jnp.maximum(c + l, 1e-6)
            fused = img_bev * c / denom + pts_bev * l / denom
        elif self.fusion_method == "cat":
            if self.feature_norm == "ModalityProjection":
                C = self.embed_dims
                img_flags = jnp.concatenate(
                    [jnp.full((C,), c), jnp.full((C,), 1 - l)])
                pts_flags = jnp.concatenate(
                    [jnp.full((C,), 1 - c), jnp.full((C,), l)])
                fused = img_bev * img_flags + pts_bev * pts_flags
            else:
                fused = jnp.concatenate([img_bev * c, pts_bev * l], axis=-1)
        else:
            raise NotImplementedError(self.fusion_method)

        if self.use_modal_embeds == "MLP":
            # Reference (:172-178): Linear(2 -> C/2) + ReLU + Linear(C/2 -> C)
            # + ReLU over the flat [c_flag, l_flag] status vector; the (C,)
            # embedding broadcast-adds over (B, HW, C).  C is embed_dims even
            # for cat fusion — faithful to the reference (which would also
            # shape-error there; no config combines cat with MLP embeds).
            status = jnp.stack([c, l]).astype(self.dtype)     # (2,)
            emb = nn.Dense(self.embed_dims // 2, dtype=self.dtype,
                           name="modal_embed_fc1")(status)
            emb = nn.relu(emb)
            emb = nn.Dense(self.embed_dims, dtype=self.dtype,
                           name="modal_embed_fc2")(emb)
            emb = nn.relu(emb)
            fused = fused + emb[None, None, :]
        elif self.use_modal_embeds == "Fixed":
            # Reference (:179-180): (embed_dims,) parameters, not dec_dims.
            emb_c = self.param("modal_embedding_C",
                               nn.initializers.normal(0.02), (self.embed_dims,))
            emb_l = self.param("modal_embedding_L",
                               nn.initializers.normal(0.02), (self.embed_dims,))
            fused = fused + (c * emb_c + l * emb_l)[None, None, :]
        return fused

    @nn.compact
    def __call__(self, img_feats, pts_feats, bev_queries, object_query_embed,
                 bev_pos, lidar2img, img_shape, l_flag, c_flag, reg_branches=None,
                 *, deterministic: bool = True):
        """Run both BEV encoders, fuse, decode.

        img_feats: list of (B, N, H, W, C) or None (modality absent).
        pts_feats: list of (B, H, W, C) or None.
        bev_queries: (HW, C) or (HW, 2C) when dual_queries.
        object_query_embed: (Nq, 2 * dec_dims).
        bev_pos: (B, HW, C).
        l_flag / c_flag: traced scalar floats in {0., 1.}.
        Returns (bev_embed, states (L,B,Nq,Cd), init_ref, refs (L,B,Nq,3)).
        """
        C = self.embed_dims
        HW = self.bev_h * self.bev_w
        if img_feats is not None:
            B = img_feats[0].shape[0]
        else:
            B = pts_feats[0].shape[0]

        if self.dual_queries:
            img_q, pts_q = bev_queries[:, :C], bev_queries[:, C:]
        else:
            img_q = pts_q = bev_queries
        img_q = jnp.broadcast_to(img_q[None], (B, HW, C))
        pts_q = jnp.broadcast_to(pts_q[None], (B, HW, C))

        img_bev = None
        if img_feats is not None and self.use_img:
            cams_embeds = self.param("cams_embeds",
                                     nn.initializers.normal(1.0),
                                     (self.num_cams, C))
            img_level_embeds = self.param("img_level_embeds",
                                          nn.initializers.normal(1.0),
                                          (len(img_feats), C))
            flat, shapes = [], []
            for lvl, feat in enumerate(img_feats):
                Bf, N, H, W, _ = feat.shape
                f = feat.reshape(Bf, N, H * W, C)
                f = f + cams_embeds[None, :, None, :].astype(f.dtype)
                f = f + img_level_embeds[None, None, None, lvl].astype(f.dtype)
                flat.append(f)
                shapes.append((H, W))
            value = jnp.concatenate(flat, axis=2)      # (B, N, sumHW, C)
            img_bev = self._build_img_encoder()(
                img_q, value, bev_pos, self.bev_h, self.bev_w, lidar2img,
                img_shape, tuple(shapes), deterministic=deterministic)

        pts_bev = None
        if pts_feats is not None and self.use_pts:
            pts_level_embeds = self.param("pts_level_embeds",
                                          nn.initializers.normal(1.0),
                                          (len(pts_feats), C))
            flat, shapes = [], []
            for lvl, feat in enumerate(pts_feats):
                Bf, H, W, _ = feat.shape
                f = feat.reshape(Bf, H * W, C)
                f = f + pts_level_embeds[None, None, lvl].astype(f.dtype)
                flat.append(f)
                shapes.append((H, W))
            value = jnp.concatenate(flat, axis=1)      # (B, sumHW, C)
            pts_bev = self._build_pts_encoder()(
                pts_q, value, bev_pos, self.bev_h, self.bev_w, tuple(shapes),
                deterministic=deterministic)

        # Missing modality -> zeros (reference channel_feature_norm :318-321).
        if img_bev is None:
            img_bev = jnp.zeros_like(pts_bev)
        if pts_bev is None:
            pts_bev = jnp.zeros_like(img_bev)

        img_bev, pts_bev = self.channel_feature_norm(
            img_bev, pts_bev, l_flag, c_flag, deterministic=deterministic)
        img_bev, pts_bev = self.spatial_feature_norm(img_bev, pts_bev,
                                                     l_flag, c_flag)
        self.sow("intermediates", "img_bev_embed", img_bev)
        self.sow("intermediates", "pts_bev_embed", pts_bev)
        fused = self.multi_modal_fusion(img_bev, pts_bev, l_flag, c_flag)

        Cd = self.dec_dims
        query_pos, query = (object_query_embed[:, :Cd],
                            object_query_embed[:, Cd:])
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        ref = nn.Dense(3, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="reference_points")(query_pos)
        reference_points = jax.nn.sigmoid(ref)

        states, refs = self._build_decoder()(
            query, fused, query_pos, reference_points,
            ((self.bev_h, self.bev_w),), reg_branches=reg_branches,
            deterministic=deterministic)
        return fused, states, reference_points, refs
