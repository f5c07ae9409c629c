"""Pallas row scatter-accumulate: the training backward's hot primitive.

Every deformable-sampling backward (MSDA d_value, DCNv2 d_x — ops/msda.py,
ops/deform_conv.py) ends in ``zeros((TR, L)).at[idx].add(contrib)`` with
idx: (M,) int32 and contrib: (M, L).  XLA lowers this to the TPU scatter
engine at ~14-39 ns/row (measured, PERF.md) — ~10x the gather engine's row
rate and ~25% of the whole flagship train step.

This kernel keeps the WHOLE accumulator table resident in VMEM across a
grid over contribution chunks and performs the read-modify-write with VPU
dynamic-index adds (``table_ref[k, :] += row``), streaming contribution
chunks through the normal Pallas double-buffered pipeline.  The table must
fit VMEM (~16 MB/core): callers already group heads/cameras so each
scatter target is ~10-12 MB (the same grouping chosen for the gather fast
window), so the constraint is free.

The contract matches the XLA form exactly: bf16 row payloads accumulate in
bf16 (what plain autodiff of a bf16 forward produces), f32 in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(mc: int, idx_ref, contrib_ref, table_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        table_ref[:] = jnp.zeros_like(table_ref)

    base = i * mc

    def body(r, _):
        k = idx_ref[base + r]
        table_ref[k, :] += contrib_ref[r, :]
        return 0

    jax.lax.fori_loop(0, mc, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("tr", "mc"))
def scatter_add_rows(idx: jnp.ndarray, contrib: jnp.ndarray, tr: int,
                     mc: int = 2048) -> jnp.ndarray:
    """rows[idx[m]] += contrib[m] over a fresh (tr, L) table.

    idx: (M,) int32 in [0, tr); contrib: (M, L).  M must be a multiple of
    mc (pad with idx pointing at a scratch row... callers pad with zero
    contributions at row 0).  Returns (tr, L) of contrib.dtype.
    """
    m, lanes = contrib.shape
    assert m % mc == 0, (m, mc)
    grid = m // mc
    return pl.pallas_call(
        functools.partial(_scatter_kernel, mc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((mc, lanes), lambda i, idx: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, lanes), lambda i, idx: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((tr, lanes), contrib.dtype),
    )(idx, contrib)
