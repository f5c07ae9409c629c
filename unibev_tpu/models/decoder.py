"""DETR3D-style object decoder with iterative box refinement.

Contract from the reference ``DetectionTransformerDecoder``
(/root/reference/projects/UniBEV/unibev_plugin/models/modules/decoder.py:51-126):
per layer — MHA self-attn over the 900 object queries, CustomMSDeformableAttention
cross-attn into the fused BEV map at the xy of the (3D, sigmoid-space)
reference points, FFN; then the layer's reg branch refines xy (dims 0:2) and
z (reg dim 4 -> ref dim 2) in inverse-sigmoid space, re-sigmoids and detaches.
Returns stacked per-layer states + per-layer reference points.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.models.attention.deformable import MSDAttention
from unibev_tpu.models.layers import FFN, MultiheadAttention, inverse_sigmoid
from unibev_tpu.registry import TRANSFORMER_LAYER_SEQUENCES


class DecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    ffn_dims: int = 512
    dropout: float = 0.1
    cross_attn_cfg: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points_2d,
                 value_shapes, *, deterministic: bool = True):
        query = MultiheadAttention(self.embed_dims, self.num_heads,
                                   self.dropout, dtype=self.dtype,
                                   name="self_attn")(
            query, query_pos=query_pos, key_pos=query_pos,
            deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)
        ca_cfg = {k: v for k, v in dict(self.cross_attn_cfg or {}).items()
                  if k != "type"}
        ca_cfg.setdefault("embed_dims", self.embed_dims)
        query = MSDAttention(dtype=self.dtype, name="cross_attn", **ca_cfg)(
            query, value, reference_points_2d, value_shapes,
            query_pos=query_pos, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)
        query = FFN(self.embed_dims, self.ffn_dims, dropout=self.dropout,
                    dtype=self.dtype, name="ffn")(query, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(query)


@TRANSFORMER_LAYER_SEQUENCES.register_module(name="DetectionTransformerDecoder")
class DetectionTransformerDecoder(nn.Module):
    num_layers: int = 6
    return_intermediate: bool = True
    embed_dims: int = 256
    num_heads: int = 8
    ffn_dims: int = 512
    dropout: float = 0.1
    cross_attn_cfg: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points, value_shapes,
                 reg_branches: Optional[Sequence[Callable]] = None,
                 *, deterministic: bool = True):
        """query: (B, Nq, C); value: (B, V, C); reference_points: (B, Nq, 3)
        in sigmoid space.  reg_branches[lid] maps (B, Nq, C) -> (B, Nq, 10).

        Returns (states (L, B, Nq, C), refs (L, B, Nq, 3)) where refs[l] is
        the reference used BY layer l (pre-refinement), matching the
        reference head's init_reference/inter_references indexing.
        """
        states, refs = [], []
        for lid in range(self.num_layers):
            refs.append(reference_points)
            ref_2d = reference_points[..., None, :2]  # (B, Nq, 1, 2)
            query = DecoderLayer(embed_dims=self.embed_dims,
                                 num_heads=self.num_heads,
                                 ffn_dims=self.ffn_dims,
                                 dropout=self.dropout,
                                 cross_attn_cfg=self.cross_attn_cfg,
                                 dtype=self.dtype,
                                 name=f"layer{lid}")(
                query, value, query_pos, ref_2d, value_shapes,
                deterministic=deterministic)
            states.append(query)
            if reg_branches is not None:
                tmp = reg_branches[lid](query)
                xy = tmp[..., 0:2] + inverse_sigmoid(reference_points[..., 0:2])
                z = tmp[..., 4:5] + inverse_sigmoid(reference_points[..., 2:3])
                new_ref = jnp.concatenate(
                    [jax.nn.sigmoid(xy), jax.nn.sigmoid(z)], axis=-1)
                reference_points = jax.lax.stop_gradient(new_ref)
        return jnp.stack(states), jnp.stack(refs)
