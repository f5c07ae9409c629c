"""Weight converter: representative torch keys must land on real variable
paths of the model with the right transforms applied."""

import numpy as np
import jax
import pytest

from unibev_tpu.utils.convert_torch import convert_state_dict


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


@pytest.fixture(scope="module")
def model_var_paths():
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
    return {col: _paths(dict(variables[col])) for col in
            ("params", "constants", "batch_stats")}


REPRESENTATIVE = {
    # torch key -> (torch shape, expected collection, expected converted shape)
    "img_backbone.conv1.weight": ((64, 3, 7, 7), "params", (7, 7, 3, 64)),
    "img_backbone.bn1.running_mean": ((64,), "constants", (64,)),
    "img_backbone.layer1.0.conv1.weight": ((64, 64, 1, 1), "params", (1, 1, 64, 64)),
    "img_backbone.layer1.0.bn2.weight": ((64,), "constants", (64,)),
    "img_backbone.layer1.0.downsample.0.weight": ((256, 64, 1, 1), "params",
                                                  (1, 1, 64, 256)),
    "img_backbone.layer4.0.conv2.weight": ((512, 512, 3, 3), "params",
                                           (9 * 512, 512)),
    "img_backbone.layer4.0.conv2.conv_offset.weight": ((27, 512, 3, 3), "params",
                                                       (3, 3, 512, 27)),
    "img_neck.lateral_convs.0.conv.weight": ((32, 2048, 1, 1), "params",
                                             (1, 1, 2048, 32)),
    "img_neck.fpn_convs.0.conv.weight": ((32, 32, 3, 3), "params",
                                         (3, 3, 32, 32)),
    "pts_middle_encoder.conv_input.0.weight": ((3, 3, 3, 5, 8), "params",
                                               (27 * 5, 8)),
    "pts_middle_encoder.conv_input.1.running_var": ((8,), "batch_stats", (8,)),
    "pts_middle_encoder.encoder_layers.encoder_layer1.0.conv1.weight":
        ((3, 3, 3, 8, 8), "params", (27 * 8, 8)),
    "pts_middle_encoder.encoder_layers.encoder_layer1.2.0.weight":
        ((3, 3, 3, 8, 16), "params", (27 * 8, 16)),
    "pts_middle_encoder.conv_out.0.weight": ((3, 1, 1, 32, 32), "params",
                                             (3 * 32, 32)),
    "pts_backbone.blocks.0.0.weight": ((32, 32, 3, 3), "params", (3, 3, 32, 32)),
    "pts_backbone.blocks.0.1.running_mean": ((32,), "batch_stats", (32,)),
    "pts_neck.deblocks.1.0.weight": ((64, 16, 2, 2), "params", (2, 2, 64, 16)),
    "pts_neck.deblocks.0.0.weight": ((16, 32, 1, 1), "params", (1, 1, 32, 16)),
    "pts_bbox_head.query_embedding.weight": ((24, 64), "params", (24, 64)),
    "pts_bbox_head.bev_embedding.weight": ((64, 32), "params", (64, 32)),
    "pts_bbox_head.positional_encoding.row_embed.weight": ((8, 16), "params",
                                                           (8, 16)),
    "pts_bbox_head.cls_branches.0.0.weight": ((32, 32), "params", (32, 32)),
    "pts_bbox_head.cls_branches.0.1.weight": ((32,), "params", (32,)),
    "pts_bbox_head.reg_branches.1.4.weight": ((10, 32), "params", (32, 10)),
    "pts_bbox_head.transformer.img_channel_weights": ((32,), "params", (32,)),
    "pts_bbox_head.transformer.cams_embeds": ((2, 32), "params", (2, 32)),
    "pts_bbox_head.transformer.reference_points.weight": ((3, 32), "params",
                                                          (32, 3)),
    "pts_bbox_head.transformer.img_encoder.layers.0.attentions.0."
    "sampling_offsets.weight": ((64, 32), "params", (32, 64)),
    "pts_bbox_head.transformer.img_encoder.layers.0.attentions.1."
    "deformable_attention.value_proj.weight": ((32, 32), "params", (32, 32)),
    "pts_bbox_head.transformer.img_encoder.layers.0.attentions.1."
    "output_proj.weight": ((32, 32), "params", (32, 32)),
    "pts_bbox_head.transformer.img_encoder.layers.0.ffns.0.layers.0.0."
    "weight": ((64, 32), "params", (32, 64)),
    "pts_bbox_head.transformer.img_encoder.layers.0.norms.0.weight":
        ((32,), "params", (32,)),
    "pts_bbox_head.transformer.decoder.layers.0.attentions.1."
    "sampling_offsets.weight": ((64, 32), "params", (32, 64)),
}


def test_convert_representative_keys(model_var_paths):
    sd = {k: np.zeros(shape, np.float32)
          for k, (shape, _, _) in REPRESENTATIVE.items()}
    out = convert_state_dict(sd, dcn_stages=(False, False, False, True))
    assert out["unmapped"] == [], out["unmapped"]
    for key, (tshape, col, cshape) in REPRESENTATIVE.items():
        found = _paths(out[col])
        hits = [(p, s) for p, s in found.items() if s == cshape]
        assert hits, f"{key}: no converted entry with shape {cshape} in {col}"
    # every converted path must exist in the real model tree WITH the same
    # shape (catches head-count / branch-width mismatches)
    for col in ("params", "constants", "batch_stats"):
        conv_paths = _paths(out[col])
        model_paths = model_var_paths[col]
        for p, s in conv_paths.items():
            assert p in model_paths, f"{col} path {p} not in model tree"
            assert model_paths[p] == s, (p, model_paths[p], s)


def test_mha_inproj_split(model_var_paths):
    C, nh = 32, 4
    sd = {
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn."
        "in_proj_weight": np.random.randn(3 * C, C).astype(np.float32),
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn."
        "in_proj_bias": np.random.randn(3 * C).astype(np.float32),
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn."
        "out_proj.weight": np.random.randn(C, C).astype(np.float32),
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn."
        "out_proj.bias": np.random.randn(C).astype(np.float32),
    }
    out = convert_state_dict(sd, num_heads=nh)
    assert out["unmapped"] == []
    paths = _paths(out["params"])
    model_paths = model_var_paths["params"]
    for p, s in paths.items():
        assert p in model_paths, p
        assert model_paths[p] == s, (p, model_paths[p], s)
