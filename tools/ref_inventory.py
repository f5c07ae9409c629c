"""Complete synthetic torch state_dict for the reference UniBEV model.

Enumerates, with exact names and shapes, every key of the flagship
``unibev_nus_LC_cnw_256_modality_dropout`` checkpoint, derived from the
reference module definitions (no torch needed — plain numpy):

  * ResNet101-caffe + DCNv2 stages 3-4   mmdet ResNet / config :225-236
  * FPN 1-level                          config :237-244
  * SparseEncoder basicblock             mmdet3d sparse_encoder, config :194-208
  * SECOND + SECONDFPN                   config :209-224
  * UniBEV_Head cls/reg branches + embeddings  unibev_head.py:91-136
  * UniBEVTransformer CNW/levels/cams/ref-points  transformer_fusion.py:130-182
  * Img/Pts encoders (TSA + SCA + FFN + norms)    encoder_unibev_detr_*.py,
    spatial_cross_attention_*.py:53-59,285-289
  * Decoder (MultiheadAttention + CustomMSDA)     decoder.py:131-338

Used by tests/test_convert_roundtrip.py: ``convert_state_dict`` over this
inventory must leave ZERO unmapped keys and land every leaf on an existing
model variable with an identical shape.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

RESNET101_BLOCKS = (3, 4, 23, 3)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.02


def _bn(sd, rng, prefix, c):
    sd[f"{prefix}.weight"] = _rand(rng, c) + 1.0
    sd[f"{prefix}.bias"] = _rand(rng, c)
    sd[f"{prefix}.running_mean"] = _rand(rng, c)
    sd[f"{prefix}.running_var"] = np.abs(_rand(rng, c)) + 1.0
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _linear(sd, rng, prefix, cin, cout, bias=True):
    sd[f"{prefix}.weight"] = _rand(rng, cout, cin)
    if bias:
        sd[f"{prefix}.bias"] = _rand(rng, cout)


def resnet101_keys(sd, rng, dcn_stages=(False, False, True, True)):
    sd["img_backbone.conv1.weight"] = _rand(rng, 64, 3, 7, 7)
    _bn(sd, rng, "img_backbone.bn1", 64)
    planes = 64
    inc = 64
    for s, n_blocks in enumerate(RESNET101_BLOCKS):
        for b in range(n_blocks):
            p = f"img_backbone.layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = _rand(rng, planes, inc, 1, 1)
            _bn(sd, rng, f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = _rand(rng, planes, planes, 3, 3)
            if dcn_stages[s]:
                # ModulatedDeformConv2dPack.conv_offset: 27 = 3*K (dy,dx,mask)
                sd[f"{p}.conv2.conv_offset.weight"] = _rand(rng, 27, planes, 3, 3)
                sd[f"{p}.conv2.conv_offset.bias"] = _rand(rng, 27)
            _bn(sd, rng, f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = _rand(rng, planes * 4, planes, 1, 1)
            _bn(sd, rng, f"{p}.bn3", planes * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = _rand(rng, planes * 4, inc, 1, 1)
                _bn(sd, rng, f"{p}.downsample.1", planes * 4)
            inc = planes * 4
        planes *= 2


def fpn_keys(sd, rng, cin=2048, cout=256):
    sd["img_neck.lateral_convs.0.conv.weight"] = _rand(rng, cout, cin, 1, 1)
    sd["img_neck.lateral_convs.0.conv.bias"] = _rand(rng, cout)
    sd["img_neck.fpn_convs.0.conv.weight"] = _rand(rng, cout, cout, 3, 3)
    sd["img_neck.fpn_convs.0.conv.bias"] = _rand(rng, cout)


def sparse_encoder_keys(sd, rng,
                        encoder_channels=((16, 16, 32), (32, 32, 64),
                                          (64, 64, 128), (128, 128)),
                        in_channels=5, out_channels=128):
    sd["pts_middle_encoder.conv_input.0.weight"] = _rand(
        rng, 3, 3, 3, in_channels, encoder_channels[0][0])
    _bn(sd, rng, "pts_middle_encoder.conv_input.1", encoder_channels[0][0])
    n_stages = len(encoder_channels)
    for i, blocks in enumerate(encoder_channels):
        stage = f"pts_middle_encoder.encoder_layers.encoder_layer{i + 1}"
        has_down = i != n_stages - 1
        n_basic = len(blocks) - 1 if has_down else len(blocks)
        for j in range(n_basic):
            c = blocks[j]
            # mmdet SparseBasicBlock inherits BasicBlock: norm attr name bn1/2
            for d in (1, 2):
                sd[f"{stage}.{j}.conv{d}.weight"] = _rand(rng, 3, 3, 3, c, c)
                _bn(sd, rng, f"{stage}.{j}.bn{d}", c)
        if has_down:
            cin, cout = blocks[-2], blocks[-1]
            sd[f"{stage}.{n_basic}.0.weight"] = _rand(rng, 3, 3, 3, cin, cout)
            _bn(sd, rng, f"{stage}.{n_basic}.1", cout)
    sd["pts_middle_encoder.conv_out.0.weight"] = _rand(
        rng, 3, 1, 1, encoder_channels[-1][-1], out_channels)
    _bn(sd, rng, "pts_middle_encoder.conv_out.1", out_channels)


def second_keys(sd, rng, cin=256, out=(128, 256), layer_nums=(5, 5)):
    for i, (c, n) in enumerate(zip(out, layer_nums)):
        inc = cin if i == 0 else out[i - 1]
        for j in range(n + 1):
            sd[f"pts_backbone.blocks.{i}.{j * 3}.weight"] = _rand(
                rng, c, inc if j == 0 else c, 3, 3)
            _bn(sd, rng, f"pts_backbone.blocks.{i}.{j * 3 + 1}", c)


def secondfpn_keys(sd, rng, cin=(128, 256), cout=(128, 128),
                   strides=(1, 2)):
    for i, (ci, co, s) in enumerate(zip(cin, cout, strides)):
        if s > 1:  # ConvTranspose2d (Cin, Cout, k, k)
            sd[f"pts_neck.deblocks.{i}.0.weight"] = _rand(rng, ci, co, s, s)
        else:      # 1x1 Conv2d (Cout, Cin, 1, 1)
            sd[f"pts_neck.deblocks.{i}.0.weight"] = _rand(rng, co, ci, 1, 1)
        _bn(sd, rng, f"pts_neck.deblocks.{i}.1", co)


def _msda_keys(sd, rng, prefix, C=256, heads=8, levels=1, points=4,
               output_proj=True):  # noqa: D103
    _linear(sd, rng, f"{prefix}.sampling_offsets", C, heads * levels * points * 2)
    _linear(sd, rng, f"{prefix}.attention_weights", C, heads * levels * points)
    _linear(sd, rng, f"{prefix}.value_proj", C, C)
    if output_proj:
        _linear(sd, rng, f"{prefix}.output_proj", C, C)


def _ffn_norm_keys(sd, rng, prefix, C=256, ffn=512):
    _linear(sd, rng, f"{prefix}.ffns.0.layers.0.0", C, ffn)
    _linear(sd, rng, f"{prefix}.ffns.0.layers.1", ffn, C)
    for n in range(3):
        sd[f"{prefix}.norms.{n}.weight"] = _rand(rng, C) + 1.0
        sd[f"{prefix}.norms.{n}.bias"] = _rand(rng, C)


def encoder_keys(sd, rng, which="img", n_layers=3, C=256, sca_points=8,
                 heads=8):
    for i in range(n_layers):
        p = (f"pts_bbox_head.transformer.{which}_bev_encoder.layers.{i}")
        _msda_keys(sd, rng, f"{p}.attentions.0", C=C, points=4, heads=heads,
                   output_proj=True)                       # TSA
        _msda_keys(sd, rng, f"{p}.attentions.1.deformable_attention", C=C,
                   points=sca_points, heads=heads,
                   output_proj=False)                      # inner SCA MSDA
        _linear(sd, rng, f"{p}.attentions.1.output_proj", C, C)
        _ffn_norm_keys(sd, rng, p, C=C, ffn=2 * C)


def decoder_keys(sd, rng, n_layers=6, C=256, heads=8):
    for i in range(n_layers):
        p = f"pts_bbox_head.transformer.decoder.layers.{i}"
        sd[f"{p}.attentions.0.attn.in_proj_weight"] = _rand(rng, 3 * C, C)
        sd[f"{p}.attentions.0.attn.in_proj_bias"] = _rand(rng, 3 * C)
        _linear(sd, rng, f"{p}.attentions.0.attn.out_proj", C, C)
        _msda_keys(sd, rng, f"{p}.attentions.1", C=C, points=4, heads=heads,
                   output_proj=True)
        _ffn_norm_keys(sd, rng, p, C=C, ffn=2 * C)


def head_keys(sd, rng, C=256, num_query=900, bev_hw=(200, 200),
              num_classes=10, code_size=10, num_pred=6, scale_factor=1,
              dual_queries=False):
    Cs = C * scale_factor
    if dual_queries:
        sd["pts_bbox_head.bev_embedding_img.weight"] = _rand(
            rng, bev_hw[0] * bev_hw[1], C)
        sd["pts_bbox_head.bev_embedding_pts.weight"] = _rand(
            rng, bev_hw[0] * bev_hw[1], C)
    else:
        sd["pts_bbox_head.bev_embedding.weight"] = _rand(
            rng, bev_hw[0] * bev_hw[1], C)
    sd["pts_bbox_head.query_embedding.weight"] = _rand(
        rng, num_query, C * 2 * scale_factor)
    sd["pts_bbox_head.positional_encoding.row_embed.weight"] = _rand(
        rng, bev_hw[0], C // 2)
    sd["pts_bbox_head.positional_encoding.col_embed.weight"] = _rand(
        rng, bev_hw[1], C // 2)
    for l in range(num_pred):
        # cls: [Linear, LN, ReLU] x2 + Linear
        _linear(sd, rng, f"pts_bbox_head.cls_branches.{l}.0", Cs, Cs)
        sd[f"pts_bbox_head.cls_branches.{l}.1.weight"] = _rand(rng, Cs) + 1.0
        sd[f"pts_bbox_head.cls_branches.{l}.1.bias"] = _rand(rng, Cs)
        _linear(sd, rng, f"pts_bbox_head.cls_branches.{l}.3", Cs, Cs)
        sd[f"pts_bbox_head.cls_branches.{l}.4.weight"] = _rand(rng, Cs) + 1.0
        sd[f"pts_bbox_head.cls_branches.{l}.4.bias"] = _rand(rng, Cs)
        _linear(sd, rng, f"pts_bbox_head.cls_branches.{l}.6", Cs, num_classes)
        # reg: [Linear, ReLU] x2 + Linear
        _linear(sd, rng, f"pts_bbox_head.reg_branches.{l}.0", Cs, Cs)
        _linear(sd, rng, f"pts_bbox_head.reg_branches.{l}.2", Cs, Cs)
        _linear(sd, rng, f"pts_bbox_head.reg_branches.{l}.4", Cs, code_size)


def transformer_top_keys(sd, rng, C=256, num_cams=6, levels=1,
                         feature_norm="ChannelNormWeights",
                         scale_factor=1, use_img=True, use_pts=True):
    t = "pts_bbox_head.transformer"
    if feature_norm == "ChannelNormWeights":
        sd[f"{t}.pts_channel_weights"] = _rand(rng, C)
        sd[f"{t}.img_channel_weights"] = _rand(rng, C)
    if use_img:
        sd[f"{t}.img_level_embeds"] = _rand(rng, levels, C)
        sd[f"{t}.cams_embeds"] = _rand(rng, num_cams, C)
    if use_pts:
        sd[f"{t}.pts_level_embeds"] = _rand(rng, levels, C)
    _linear(sd, rng, f"{t}.reference_points", C * scale_factor, 3)


def flagship_state_dict(seed=0) -> Dict[str, np.ndarray]:
    """The full key inventory of unibev_nus_LC_cnw_256_modality_dropout."""
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}
    resnet101_keys(sd, rng)
    fpn_keys(sd, rng)
    sparse_encoder_keys(sd, rng)
    second_keys(sd, rng)
    secondfpn_keys(sd, rng)
    transformer_top_keys(sd, rng)
    encoder_keys(sd, rng, "img")
    encoder_keys(sd, rng, "pts")
    decoder_keys(sd, rng)
    head_keys(sd, rng)
    return sd


if __name__ == "__main__":
    sd = flagship_state_dict()
    print(f"{len(sd)} keys")
    for k in sorted(sd)[:20]:
        print(f"  {k} {tuple(np.shape(sd[k]))}")
