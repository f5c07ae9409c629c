"""Microbenchmarks for gather/op building blocks on the real TPU chip.

Times ops by looping them inside one jit (data-dependent chain) to amortize
the ~35 ms axon relay dispatch overhead, then dividing by the loop count.

Usage: python tools/microbench.py gather|dcn|subm|...
"""

from __future__ import annotations

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench(fn, *args, iters=10, name=""):
    """fn must return an array; times `iters` sequential applications."""

    # perturb the smallest arg every iteration (prevents hoisting the whole
    # fn out of the loop as loop-invariant) and reduce the FULL output into
    # the carry (prevents DCE narrowing the op to one element).
    sizes = [x.size * x.dtype.itemsize for x in args]
    pidx = int(np.argmin(sizes))

    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc, args_ = carry
            out = fn(*args_)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            la = list(args_)
            p = la[pidx]
            la[pidx] = p + (acc * 0).astype(p.dtype)
            return (acc, tuple(la))
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), args))[0]

    r = loop(*args)
    jax.device_get(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(*args)
        jax.device_get(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best * 1e3:.3f} ms")
    return best


def bench_gather():
    """Gather rate vs lane width at fixed row count."""
    rng = np.random.RandomState(0)
    n_rows = 1_000_000
    table_rows = 40_000
    idx = jnp.asarray(rng.randint(0, table_rows, n_rows), jnp.int32)
    for lanes in (1, 8, 16, 32, 64, 128, 256, 512, 1024):
        tab = jnp.asarray(rng.randn(table_rows, lanes), jnp.bfloat16)
        fn = lambda t, i: jnp.take(t, i, axis=0)
        dt = bench(fn, tab, idx, name=f"take rows={n_rows} lanes={lanes}")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row, "
              f"{n_rows * lanes * 2 / dt / 1e9:.1f} GB/s")
    # f32 index table variants (for neighbor tables)
    for lanes in (1, 8, 128, 256, 512):
        tab = jnp.asarray(rng.randint(0, 120000, (table_rows, lanes)), jnp.int32)
        fn = lambda t, i: jnp.take(t, i, axis=0)
        dt = bench(fn, tab, idx, name=f"take s32 rows={n_rows} lanes={lanes}")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row, "
              f"{n_rows * lanes * 4 / dt / 1e9:.1f} GB/s")
    # bf16 data gathered via s32 bitcast rows
    for lanes in (128, 512, 1024):
        tab = jnp.asarray(rng.randn(table_rows, lanes), jnp.bfloat16)
        def fn(t, i):
            t32 = jax.lax.bitcast_convert_type(
                t.reshape(table_rows, lanes // 2, 2), jnp.int32)
            out = jnp.take(t32, i, axis=0)
            return jax.lax.bitcast_convert_type(out, jnp.bfloat16)
        dt = bench(fn, tab, idx, name=f"bitcast-take bf16 rows={n_rows} lanes={lanes}")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row, "
              f"{n_rows * lanes * 2 / dt / 1e9:.1f} GB/s")
    # locality: sorted indices vs random, bf16 128 lanes
    tab = jnp.asarray(rng.randn(table_rows, 128), jnp.bfloat16)
    idx_sorted = jnp.sort(idx)
    fn = lambda t, i: jnp.take(t, i, axis=0)
    dt = bench(fn, tab, idx_sorted, name=f"take bf16 128-lane SORTED idx")
    print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")
    # f32 gathers
    for lanes in (128, 256):
        tab = jnp.asarray(rng.randn(table_rows, lanes), jnp.float32)
        dt = bench(fn, tab, idx, name=f"take f32 rows={n_rows} lanes={lanes}")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row, "
              f"{n_rows * lanes * 4 / dt / 1e9:.1f} GB/s")


def _dcn_inputs(B=6, H=58, W=100, Cin=256, Cout=256, K=9, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Cin), dtype)
    offset = jnp.asarray(rng.randn(B, H, W, 2 * K) * 2.0, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, K), dtype)
    weight = jnp.asarray(rng.randn(K * Cin, Cout) * 0.05, dtype)
    bias = jnp.asarray(rng.randn(Cout), dtype)
    return x, offset, mask, weight, bias


def bench_dcn():
    from unibev_tpu.ops.deform_conv import modulated_deform_conv2d
    x, offset, mask, weight, bias = _dcn_inputs()
    fn = lambda x, o, m, w, b: modulated_deform_conv2d(x, o, m, w, b)
    bench(fn, x, offset, mask, weight, bias, name="dcn current (stage3 shape)")
    # stage4 shape
    x4, o4, m4, w4, b4 = _dcn_inputs(B=6, H=29, W=50, Cin=512, Cout=512)
    bench(fn, x4, o4, m4, w4, b4, name="dcn current (stage4 shape)")




def _pack_pairs(a, b):
    """Pack two bf16 arrays into one s32: a in low 16 bits, b in high."""
    au = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    bu = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return (au | (bu << 16)).astype(jnp.int32)


def _unpack_lo_f32(v):
    """f32 value of the bf16 stored in the low 16 bits of s32 v."""
    return jax.lax.bitcast_convert_type(v << 16, jnp.float32)


def _unpack_hi_f32(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def dcn_v2_packed(x, offset, mask, weight, bias, kernel_size=(3, 3),
                  stride=1, padding=1, dilation=1):
    """s32 pair-packed corner gather + separable bilinear + fused mask."""
    B, H, W, Cin = x.shape
    Kh, Kw = kernel_size
    K = Kh * Kw
    Ho, Wo = offset.shape[1], offset.shape[2]

    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(Kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(Kw, dtype=jnp.float32) * dilation
    base_y = (oy[:, None, None, None] + ky[None, None, :, None])
    base_x = (ox[None, :, None, None] + kx[None, None, None, :])
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, Kh, Kw))
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, Kh, Kw))

    off = offset.reshape(B, Ho, Wo, K, 2).astype(jnp.float32)
    sy = base_y.reshape(1, Ho, Wo, K) + off[..., 0]
    sx = base_x.reshape(1, Ho, Wo, K) + off[..., 1]

    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    yp = sy + 1.0
    xp = sx + 1.0
    y0 = jnp.floor(yp)
    x0 = jnp.floor(xp)
    ly = yp - y0
    lx = xp - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)

    v = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # rows: (B*(H+1)*(W+1), 2*Cin) s32; [0:Cin] = y0 (x0,x1) pairs,
    # [Cin:] = y1 pairs
    row_y0 = _pack_pairs(v[:, :-1, :-1, :], v[:, :-1, 1:, :])
    row_y1 = _pack_pairs(v[:, 1:, :-1, :], v[:, 1:, 1:, :])
    tab = jnp.concatenate([row_y0, row_y1], axis=-1).reshape(
        B * (H + 1) * (W + 1), 2 * Cin)

    idx = ((jnp.arange(B, dtype=jnp.int32)[:, None] * (H + 1) * (W + 1)).reshape(B, 1)
           + (y0c * (W + 1) + x0c).reshape(B, -1)).reshape(-1)
    rows = tab.at[idx].get(mode="promise_in_bounds")      # (B*N*K, 2*Cin) s32

    vf = valid.reshape(-1).astype(jnp.float32)
    mf = mask.reshape(-1).astype(jnp.float32) * vf
    lyf = ly.reshape(-1)
    lxf = lx.reshape(-1)
    wx0 = ((1.0 - lxf) * mf)[:, None]
    wx1 = (lxf * mf)[:, None]
    wy0 = (1.0 - lyf)[:, None]
    wy1 = lyf[:, None]

    r0 = rows[:, :Cin]
    r1 = rows[:, Cin:]
    top = _unpack_lo_f32(r0) * wx0 + _unpack_hi_f32(r0) * wx1
    bot = _unpack_lo_f32(r1) * wx0 + _unpack_hi_f32(r1) * wx1
    sampled = (top * wy0 + bot * wy1).astype(jnp.bfloat16)

    sampled = sampled.reshape(B * Ho * Wo, K, Cin)
    out = jax.lax.dot_general(sampled,
                              weight.reshape(K, Cin, -1).astype(jnp.bfloat16),
                              (((1, 2), (0, 1)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out.reshape(B, Ho, Wo, -1).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def bench_dcn2():
    from unibev_tpu.ops.deform_conv import modulated_deform_conv2d
    x, offset, mask, weight, bias = _dcn_inputs()
    ref = modulated_deform_conv2d(x, offset, mask, weight, bias)
    new = jax.jit(dcn_v2_packed)(x, offset, mask, weight, bias)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
    rel = err / jnp.max(jnp.abs(ref).astype(jnp.float32))
    print(f"max abs err {err:.5f} rel {rel:.5f}")
    fn = lambda x, o, m, w, b: dcn_v2_packed(x, o, m, w, b)
    bench(fn, x, offset, mask, weight, bias, name="dcn v2 packed (stage3)")
    x4, o4, m4, w4, b4 = _dcn_inputs(B=6, H=29, W=50, Cin=512, Cout=512)
    bench(fn, x4, o4, m4, w4, b4, name="dcn v2 packed (stage4)")




def bench_msda():
    from unibev_tpu.ops.msda import _slab_level, _slab_level_fast
    rng = np.random.RandomState(0)
    BH, H, W, D, Q, P = 8, 200, 200, 32, 40000, 8
    value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)
    bench(lambda v, l, a: _slab_level(v, H, W, l, a), value, loc, attn,
          name="slab clean bf16 (ptsSCA shape)")
    bench(lambda v, l, a: _slab_level_fast(v, H, W, l, a), value, loc, attn,
          name="slab fast s32 (ptsSCA shape)")




def bench_lanes():
    """s32 gather rate at 32/64/96/128 lanes and bigger tables."""
    rng = np.random.RandomState(0)
    n_rows = 2_560_000
    for table_rows in (40_000, 323_208):
        for lanes in (32, 64, 128):
            tab = jnp.asarray(
                rng.randint(-2**30, 2**30, (table_rows, lanes)), jnp.int32)
            idx = jnp.asarray(rng.randint(0, table_rows, n_rows), jnp.int32)
            fn = lambda t, i: t.at[i].get(mode="promise_in_bounds")
            dt = bench(fn, tab, idx,
                       name=f"s32 take tab={table_rows} lanes={lanes}")
            print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")




def bench_idxfuse():
    rng = np.random.RandomState(0)
    n_rows = 2_560_000
    table_rows = 323_208
    tab = jnp.asarray(rng.randint(-2**30, 2**30, (table_rows, 64)), jnp.int32)
    raw = jnp.asarray(rng.rand(n_rows), jnp.float32)
    def fn_fused(t, r):
        i = jnp.clip((r * (table_rows - 1)).astype(jnp.int32), 0, table_rows - 1)
        return t.at[i].get(mode="promise_in_bounds")
    dt = bench(fn_fused, tab, raw, name="s32 take, idx computed inline")
    print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")
    def fn_barrier(t, r):
        i = jnp.clip((r * (table_rows - 1)).astype(jnp.int32), 0, table_rows - 1)
        i = jax.lax.optimization_barrier(i)
        return t.at[i].get(mode="promise_in_bounds")
    dt = bench(fn_barrier, tab, raw, name="s32 take, idx behind opt barrier")
    print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")




def bench_tabfuse():
    rng = np.random.RandomState(0)
    n_rows = 2_560_000
    table_rows = 323_208
    a = jnp.asarray(rng.randn(table_rows, 32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(table_rows, 32), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, table_rows, n_rows), jnp.int32)
    def pack(a, b):
        au = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
        bu = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
        return (au | (bu << 16)).astype(jnp.int32)
    def fn_inline(a, b, i):
        t = jnp.concatenate([pack(a, b), pack(b, a)], axis=-1)
        return t.at[i].get(mode="promise_in_bounds")
    dt = bench(fn_inline, a, b, idx, name="s32 take, tab packed inline")
    print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")
    def fn_barrier(a, b, i):
        t = jnp.concatenate([pack(a, b), pack(b, a)], axis=-1)
        t = jax.lax.optimization_barrier(t)
        return t.at[i].get(mode="promise_in_bounds")
    dt = bench(fn_barrier, a, b, idx, name="s32 take, tab behind barrier")
    print(f"   -> {dt / n_rows * 1e9:.2f} ns/row")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gather"
    globals()[f"bench_{which}"]()
