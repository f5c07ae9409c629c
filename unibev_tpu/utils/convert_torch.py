"""torch -> unibev_tpu checkpoint conversion.

Maps an mmdet3d-style UniBEV ``state_dict`` (the released checkpoints,
reference README.md:40-47) onto this framework's flax variable tree, so
module-level goldens and full-val parity can be checked against the
reference's trained weights.

Layout conventions converted:
  * Conv2d (Cout, Cin, Kh, Kw)       -> kernel (Kh, Kw, Cin, Cout)
  * ConvTranspose2d (Cin, Cout, Kh, Kw) -> kernel (Kh, Kw, Cin, Cout)
  * Linear (Cout, Cin)               -> kernel (Cin, Cout)
  * BN (frozen, image backbone)      -> constants {gamma, beta, mean, var}
  * BN (trainable)                   -> params {scale, bias} + batch_stats
  * DCNv2 weight (Cout, Cin, 3, 3)   -> (9*Cin, Cout) tap-major
  * spconv SubM/SparseConv3d weight  -> (K*Cin, Cout) tap-major (dz,dy,dx)
    (spconv v1 stores (kz, ky, kx, Cin, Cout))
  * torch MultiheadAttention in_proj -> flax MHA query/key/value/out kernels
    with (C, heads, head_dim) shapes
  * middle-encoder dense z-stacking needs no permutation (channel = c*Dz + d
    on both sides, see SparseEncoder docstring).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv(w):      # (Cout, Cin, Kh, Kw) -> (Kh, Kw, Cin, Cout)
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w):    # (Cin, Cout, Kh, Kw) -> (Kh, Kw, Cin, Cout)
    return np.transpose(w, (2, 3, 0, 1))


def _linear(w):    # (Cout, Cin) -> (Cin, Cout)
    return np.transpose(w, (1, 0))


def _dcn(w):       # (Cout, Cin, Kh, Kw) -> (Kh*Kw*Cin, Cout) tap-major
    cout, cin, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * cin, cout)


def _spconv(w):    # (kz, ky, kx, Cin, Cout) -> (K*Cin, Cout)
    kz, ky, kx, cin, cout = w.shape
    return w.reshape(kz * ky * kx * cin, cout)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = np.asarray(value)


def _resnet_paths(key: str, dcn_stages):
    """img_backbone.* torch name -> list of (collection, path, transform)."""
    bn_map = {"weight": "gamma", "bias": "beta", "running_mean": "mean",
              "running_var": "var"}
    if key == "img_backbone.conv1.weight":
        return [("params", ("img_backbone", "conv1", "kernel"), _conv)]
    m = re.match(r"img_backbone\.bn1\.(\w+)", key)
    if m:
        name = bn_map.get(m.group(1))
        return [("constants", ("img_backbone", "bn1", name), None)] if name else []
    m = re.match(r"img_backbone\.layer(\d+)\.(\d+)\.(.*)", key)
    if not m:
        return None
    stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
    # our layers are 0-indexed by stage: torch layer1 -> layer1_{b} etc.
    base = ("img_backbone", f"layer{stage}_{block}")
    with_dcn = dcn_stages[stage - 1] if stage - 1 < len(dcn_stages) else False
    for i in (1, 2, 3):
        if rest == f"conv{i}.weight":
            if i == 2 and with_dcn:
                return [("params", base + ("conv2", "weight"), _dcn)]
            return [("params", base + (f"conv{i}", "kernel"), _conv)]
        if rest == f"conv{i}.conv_offset.weight":
            return [("params", base + ("conv2", "conv_offset", "kernel"), _conv)]
        if rest == f"conv{i}.conv_offset.bias":
            return [("params", base + ("conv2", "conv_offset", "bias"), None)]
        m2 = re.match(rf"bn{i}\.(\w+)", rest)
        if m2 and m2.group(1) in bn_map:
            return [("constants", base + (f"bn{i}", bn_map[m2.group(1)]), None)]
    if rest == "downsample.0.weight":
        return [("params", base + ("downsample_conv", "kernel"), _conv)]
    m2 = re.match(r"downsample\.1\.(\w+)", rest)
    if m2 and m2.group(1) in bn_map:
        return [("constants", base + ("downsample_bn", bn_map[m2.group(1)]), None)]
    return []


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       dcn_stages: Tuple[bool, ...] = (False, False, True, True),
                       num_dec_layers: int = 6,
                       num_heads: int = 8) -> Dict[str, Any]:
    """Convert a torch UniBEV state_dict to {params, constants, batch_stats}.

    Unknown keys are collected under the 'unmapped' list for inspection.
    """
    out: Dict[str, Any] = {"params": {}, "constants": {}, "batch_stats": {},
                           "unmapped": []}
    bn_pb = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}

    def put(col, path, val):
        _set(out[col], path, val)

    for key, w in state_dict.items():
        w = np.asarray(w)
        if key.endswith("num_batches_tracked"):
            continue

        # ---------------- image backbone
        if key.startswith("img_backbone."):
            r = _resnet_paths(key, dcn_stages)
            if r:
                for col, path, tf in r:
                    put(col, path, tf(w) if tf else w)
            elif r is None:
                out["unmapped"].append(key)
            continue

        # ---------------- image neck (single-level FPN)
        m = re.match(r"img_neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            put("params", ("img_neck", f"lateral{i}",
                           "kernel" if kind == "weight" else "bias"),
                _conv(w) if kind == "weight" else w)
            continue
        m = re.match(r"img_neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            put("params", ("img_neck", f"fpn{i}",
                           "kernel" if kind == "weight" else "bias"),
                _conv(w) if kind == "weight" else w)
            continue

        # ---------------- sparse middle encoder
        m = re.match(r"pts_middle_encoder\.conv_input\.0\.weight", key)
        if m:
            put("params", ("pts_middle_encoder", "conv_input", "weight"),
                _spconv(w))
            continue
        m = re.match(r"pts_middle_encoder\.conv_input\.1\.(\w+)", key)
        if m and m.group(1) in bn_pb:
            col, name = bn_pb[m.group(1)]
            put(col, ("pts_middle_encoder", "conv_input", "bn", name), w)
            continue
        m = re.match(
            r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d+)\.(\d+)\.(.*)",
            key)
        if m:
            stage = int(m.group(1)) - 1
            block = int(m.group(2))
            rest = m.group(3)
            nb = {0: 2, 1: 2, 2: 2, 3: 2}[stage]  # basic blocks per stage
            if block < nb:
                base = ("pts_middle_encoder", f"stage{stage}_block{block}")
                m2 = re.match(r"conv(\d)\.weight", rest)
                if m2:
                    put("params", base + (f"conv{m2.group(1)}", "weight"),
                        _spconv(w))
                    continue
                # mmdet SparseBasicBlock inherits BasicBlock whose norm attr
                # is 'bn1'/'bn2'; accept the 'norm' spelling too
                m2 = re.match(r"(?:norm|bn)(\d)\.(\w+)", rest)
                if m2 and m2.group(2) in bn_pb:
                    col, name = bn_pb[m2.group(2)]
                    put(col, base + (f"conv{m2.group(1)}", "bn", name), w)
                    continue
            else:  # downsample conv of the stage
                if rest == "0.weight" or rest == "weight":
                    put("params", ("pts_middle_encoder", f"down{stage}_weight"),
                        _spconv(w))
                    continue
                m2 = re.match(r"1\.(\w+)", rest)
                if m2 and m2.group(1) in bn_pb:
                    col, name = bn_pb[m2.group(1)]
                    put(col, ("pts_middle_encoder", f"down{stage}_bn", name), w)
                    continue
            out["unmapped"].append(key)
            continue
        m = re.match(r"pts_middle_encoder\.conv_out\.0\.weight", key)
        if m:
            put("params", ("pts_middle_encoder", "conv_out_weight"), _spconv(w))
            continue
        m = re.match(r"pts_middle_encoder\.conv_out\.1\.(\w+)", key)
        if m and m.group(1) in bn_pb:
            col, name = bn_pb[m.group(1)]
            put(col, ("pts_middle_encoder", "conv_out_bn", name), w)
            continue

        # ---------------- SECOND backbone + FPN neck
        m = re.match(r"pts_backbone\.blocks\.(\d+)\.(\d+)\.(\w+)", key)
        if m:
            stage, idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            # layer layout: [conv, bn, relu] triplets
            conv_i = idx // 3
            if idx % 3 == 0 and kind == "weight":
                put("params", ("pts_backbone", f"block{stage}_conv{conv_i}",
                               "kernel"), _conv(w))
            elif idx % 3 == 1 and kind in bn_pb:
                col, name = bn_pb[kind]
                put(col, ("pts_backbone", f"block{stage}_bn{conv_i}", name), w)
            else:
                out["unmapped"].append(key)
            continue
        m = re.match(r"pts_neck\.deblocks\.(\d+)\.(\d+)\.(\w+)", key)
        if m:
            i, idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            if idx == 0 and kind == "weight":
                tf = _deconv if w.shape[0] != w.shape[1] or True else _conv
                # upsample_strides[i] > 1 -> ConvTranspose (Cin, Cout, kh, kw);
                # stride 1 -> 1x1 Conv (Cout, Cin, 1, 1).  Distinguish by
                # kernel size: deconv kernels are (s, s) with s > 1.
                if w.shape[-1] > 1:
                    put("params", ("pts_neck", f"deblock{i}_conv", "kernel"),
                        _deconv(w))
                else:
                    put("params", ("pts_neck", f"deblock{i}_conv", "kernel"),
                        _conv(w))
            elif idx == 1 and kind in bn_pb:
                col, name = bn_pb[kind]
                put(col, ("pts_neck", f"deblock{i}_bn", name), w)
            else:
                out["unmapped"].append(key)
            continue

        # ---------------- head
        if key.startswith("pts_bbox_head."):
            k = key[len("pts_bbox_head."):]
            if _convert_head_key(k, w, put, out, num_heads):
                continue
            out["unmapped"].append(key)
            continue

        out["unmapped"].append(key)
    return out


def _convert_head_key(k: str, w, put, out, num_heads: int) -> bool:
    base = ("pts_bbox_head",)
    if k == "bev_embedding.weight":
        put("params", base + ("bev_embedding",), w)
        return True
    if k == "query_embedding.weight":
        put("params", base + ("query_embedding",), w)
        return True
    m = re.match(r"positional_encoding\.(row|col)_embed\.weight", k)
    if m:
        put("params", base + ("positional_encoding", f"{m.group(1)}_embed",
                              "embedding"), w)
        return True
    m = re.match(r"(cls|reg)_branches\.(\d+)\.(\d+)\.(weight|bias)", k)
    if m:
        kind, layer, idx, wb = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        # cls branch: [Linear, LN, ReLU] * n + Linear; reg: [Linear, ReLU] * n + Linear
        step = 3 if kind == "cls" else 2
        if idx % step == 0:
            fc = idx // step
            n_fcs = 2
            name = "out" if fc >= n_fcs else f"fc{fc}"
            put("params", base + (f"{kind}_branch{layer}", name,
                                  "kernel" if wb == "weight" else "bias"),
                _linear(w) if wb == "weight" else w)
            return True
        if kind == "cls" and idx % step == 1:
            ln = idx // step
            put("params", base + (f"cls_branch{layer}", f"ln{ln}",
                                  "scale" if wb == "weight" else "bias"), w)
            return True
        return False
    if k.startswith("transformer."):
        return _convert_transformer_key(k[len("transformer."):], w, put, out,
                                        num_heads)
    return False


def _convert_transformer_key(k: str, w, put, out, num_heads: int) -> bool:
    base = ("pts_bbox_head", "transformer")
    simple = {
        "img_channel_weights": ("img_channel_weights",),
        "pts_channel_weights": ("pts_channel_weights",),
        "img_spatial_weights": ("img_spatial_weights",),
        "pts_spatial_weights": ("pts_spatial_weights",),
        "modal_embbeding_C": ("modal_embedding_C",),   # [sic] reference typo
        "modal_embbeding_L": ("modal_embedding_L",),
        "cams_embeds": ("cams_embeds",),
        "level_embeds": ("img_level_embeds",),
        "img_level_embeds": ("img_level_embeds",),
        "pts_level_embeds": ("pts_level_embeds",),
    }
    if k in simple:
        put("params", base + simple[k], w)
        return True
    # MLP-CNW: Sequential(Linear(2HW->2), act) — index 0 is the Linear
    # (reference transformer_fusion.py:136-151)
    m = re.match(r"channel_weights_proj\.0\.(weight|bias)", k)
    if m:
        _put_linear(put, base + ("channel_weights_proj",), w, m.group(1))
        return True
    # modal-embed MLP: Sequential(Linear(2->C/2), ReLU, Linear(C/2->C), ReLU)
    # (reference :172-178); Sequential indices 0 and 2 are the Linears
    m = re.match(r"modal_embbeding_mlp\.(0|2)\.(weight|bias)", k)
    if m:
        name = "modal_embed_fc1" if m.group(1) == "0" else "modal_embed_fc2"
        _put_linear(put, base + (name,), w, m.group(2))
        return True
    m = re.match(r"reference_points\.(weight|bias)", k)
    if m:
        put("params", base + ("reference_points",
                              "kernel" if m.group(1) == "weight" else "bias"),
            _linear(w) if m.group(1) == "weight" else w)
        return True

    # real checkpoints name the encoders img_bev_encoder/pts_bev_encoder
    # (transformer_fusion.py:84-87); our modules are img_encoder/pts_encoder
    m = re.match(r"(img|pts)(?:_bev)?_encoder\.layers\.(\d+)\.(.*)", k)
    if m:
        enc, layer, rest = f"{m.group(1)}_encoder", int(m.group(2)), m.group(3)
        lbase = base + (enc, f"layer{layer}")
        return _convert_encoder_layer_key(rest, w, put, lbase)
    m = re.match(r"decoder\.layers\.(\d+)\.(.*)", k)
    if m:
        layer, rest = int(m.group(1)), m.group(2)
        lbase = base + ("decoder", f"layer{layer}")
        return _convert_decoder_layer_key(rest, w, put, lbase, num_heads)
    return False


def _put_linear(put, path, w, kind):
    put("params", path + ("kernel" if kind == "weight" else "bias",),
        _linear(w) if kind == "weight" else w)


def _convert_encoder_layer_key(rest: str, w, put, lbase) -> bool:
    # attentions.0.* = TSA (MSDAttention); attentions.1.* = SCA wrapper
    m = re.match(r"attentions\.0\.(sampling_offsets|attention_weights|"
                 r"value_proj|output_proj)\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("self_attn", m.group(1)), w, m.group(2))
        return True
    m = re.match(r"attentions\.1\.deformable_attention\.(sampling_offsets|"
                 r"attention_weights|value_proj)\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("cross_attn", "deformable_attention",
                                  m.group(1)), w, m.group(2))
        return True
    m = re.match(r"attentions\.1\.output_proj\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("cross_attn", "output_proj"), w, m.group(1))
        return True
    m = re.match(r"ffns\.0\.layers\.0\.0\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("ffn", "fc0"), w, m.group(1))
        return True
    m = re.match(r"ffns\.0\.layers\.1\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("ffn", "fc1"), w, m.group(1))
        return True
    m = re.match(r"norms\.(\d)\.(weight|bias)", rest)
    if m:
        put("params", lbase + (f"norm{int(m.group(1)) + 1}",
                               "scale" if m.group(2) == "weight" else "bias"), w)
        return True
    return False


def _convert_decoder_layer_key(rest: str, w, put, lbase, num_heads: int) -> bool:
    # attentions.0 = torch nn.MultiheadAttention; attentions.1 = Custom MSDA
    m = re.match(r"attentions\.0\.attn\.in_proj_(weight|bias)", rest)
    if m:
        C = w.shape[-1] if m.group(1) == "weight" else w.shape[0] // 3
        head_dim = C // num_heads
        parts = np.split(np.asarray(w), 3, axis=0)
        for name, p in zip(("query", "key", "value"), parts):
            if m.group(1) == "weight":
                put("params", lbase + ("self_attn", "attn", name, "kernel"),
                    _linear(p).reshape(C, num_heads, head_dim))
            else:
                put("params", lbase + ("self_attn", "attn", name, "bias"),
                    p.reshape(num_heads, head_dim))
        return True
    m = re.match(r"attentions\.0\.attn\.out_proj\.(weight|bias)", rest)
    if m:
        if m.group(1) == "weight":
            C = w.shape[0]
            head_dim = C // num_heads
            put("params", lbase + ("self_attn", "attn", "out", "kernel"),
                _linear(w).reshape(num_heads, head_dim, C))
        else:
            put("params", lbase + ("self_attn", "attn", "out", "bias"), w)
        return True
    m = re.match(r"attentions\.1\.(sampling_offsets|attention_weights|"
                 r"value_proj|output_proj)\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("cross_attn", m.group(1)), w, m.group(2))
        return True
    m = re.match(r"ffns\.0\.layers\.0\.0\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("ffn", "fc0"), w, m.group(1))
        return True
    m = re.match(r"ffns\.0\.layers\.1\.(weight|bias)", rest)
    if m:
        _put_linear(put, lbase + ("ffn", "fc1"), w, m.group(1))
        return True
    m = re.match(r"norms\.(\d)\.(weight|bias)", rest)
    if m:
        put("params", lbase + (f"norm{int(m.group(1)) + 1}",
                               "scale" if m.group(2) == "weight" else "bias"), w)
        return True
    return False
