"""Common flax building blocks shared across the model zoo.

These replace the mmcv "bricks" the reference wires through configs
(FFN, MultiheadAttention, LearnedPositionalEncoding — named at
/root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:285-288,330-341,356-361).
All modules are NHWC / (B, tokens, C) layout and take an explicit
``deterministic`` flag for dropout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.registry import POSITIONAL_ENCODINGS

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros
default_bias = nn.initializers.zeros


class FFN(nn.Module):
    """Transformer feed-forward block with residual add."""

    embed_dims: int
    feedforward_channels: int
    num_fcs: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None, *, deterministic: bool = True):
        out = x
        for i in range(self.num_fcs - 1):
            out = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                           kernel_init=xavier_uniform, name=f"fc{i}")(out)
            out = nn.relu(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=xavier_uniform, name=f"fc{self.num_fcs - 1}")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if identity is None:
            identity = x
        return identity + out


class MultiheadAttention(nn.Module):
    """Standard MHA with residual + dropout, (B, N, C) layout.

    Used for decoder self-attention over the 900 object queries
    (config attn_cfgs 'MultiheadAttention' at :330-335).
    """

    embed_dims: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key=None, value=None, identity=None,
                 query_pos=None, key_pos=None, *, deterministic: bool = True):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dims,
            out_features=self.embed_dims,
            dropout_rate=0.0,
            dtype=self.dtype,
            name="attn")(query, key, value, deterministic=deterministic)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


@POSITIONAL_ENCODINGS.register_module()
class LearnedPositionalEncoding(nn.Module):
    """Learned row/col embeddings -> (B, H*W, 2*num_feats) BEV positional map."""

    num_feats: int
    row_num_embed: int = 50
    col_num_embed: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: int, h: int, w: int):
        row = nn.Embed(self.row_num_embed, self.num_feats, dtype=self.dtype,
                       name="row_embed")(jnp.arange(h))
        col = nn.Embed(self.col_num_embed, self.num_feats, dtype=self.dtype,
                       name="col_embed")(jnp.arange(w))
        pos = jnp.concatenate(
            [jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats)),
             jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats))],
            axis=-1)  # (h, w, 2*num_feats)
        pos = pos.reshape(1, h * w, -1)
        return jnp.broadcast_to(pos, (batch, h * w, pos.shape[-1]))


@POSITIONAL_ENCODINGS.register_module()
class RelPositionEmbedding(nn.Module):
    """sin/cos xy features -> Linear projection.

    Parity item for the reference's registered-but-unused utility
    (/root/reference/projects/UniBEV/unibev_plugin/models/utils/
    position_embedding.py:5-34).
    """

    num_pos_feats: int = 64
    out_dims: int = 256
    temperature: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xy: jnp.ndarray) -> jnp.ndarray:
        """xy: (..., 2) normalized positions -> (..., out_dims)."""
        half = self.num_pos_feats // 2
        dim_t = self.temperature ** (
            2 * (jnp.arange(half) // 2) / half)
        px = xy[..., 0:1] / dim_t
        py = xy[..., 1:2] / dim_t
        feats = jnp.concatenate(
            [jnp.sin(px), jnp.cos(px), jnp.sin(py), jnp.cos(py)], axis=-1)
        return nn.Dense(self.out_dims, dtype=self.dtype, name="proj")(feats)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
