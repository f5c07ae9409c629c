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




def _subm_inputs(V, Cin, Cout, density=0.7, seed=0):
    """Random active set + realistic neighbor tables (density = P(neighbor
    active); stage0 nuScenes measures ~0.2-0.4 but perf only depends on
    index distribution, which is random either way)."""
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(V, Cin), jnp.bfloat16)
    # 27-tap neighbor indices: random, with (1-density) pointing at V (empty)
    nidx = rng.randint(0, V, (V, 27)).astype(np.int32)
    empty = rng.rand(V, 27) > density
    nidx[empty] = V
    nidx[:, 13] = np.arange(V)          # center tap = self
    return feats, jnp.asarray(nidx)


def bench_subm27():
    """Current formulation at every stage config."""
    from unibev_tpu.ops.sparse_conv import gather_conv
    for (V, Cin, Cout, n_convs) in ((120000, 16, 16, 5), (90000, 32, 32, 4),
                                    (60000, 64, 64, 4), (40000, 128, 128, 4)):
        feats, nidx = _subm_inputs(V, Cin, Cout)
        w = jnp.asarray(np.random.RandomState(1).randn(27 * Cin, Cout) * .05,
                        jnp.bfloat16)
        mask = jnp.ones((V,), bool)
        dt = bench(gather_conv, feats, nidx, w, mask,
                   name=f"subm27 V={V} C={Cin}")
        print(f"   stage total ~{dt * n_convs * 1e3:.1f} ms ({n_convs} convs)")


def _quad_pack4(f0, f1, f2, f3):
    lo = _pack_pairs(f0, f1)
    hi = _pack_pairs(f2, f3)
    return jnp.concatenate([lo, hi], axis=-1)   # (V, 2*Cin) s32


def subm_quad(feats, anchors, case, x_chain, weight):
    """x-quad formulation: 9 wide rows per voxel instead of 27 narrow.

    feats: (V, Cin) bf16; anchors: (V, 9) row of quad table per (dz,dy);
    case: (V, 9) in {0: center-active, 1: left-anchor, 2: right-anchor};
    x_chain: (V, 3) indices of x-1, x+1, x+2 rows (V = empty).
    """
    V, Cin = feats.shape
    fpad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
    fm1 = fpad.at[x_chain[:, 0]].get(mode="promise_in_bounds")
    fp1 = fpad.at[x_chain[:, 1]].get(mode="promise_in_bounds")
    fp2 = fpad.at[x_chain[:, 2]].get(mode="promise_in_bounds")
    tab = _quad_pack4(fm1, feats, fp1, fp2)      # (V, 2Cin) s32
    tab = jnp.concatenate([tab, jnp.zeros((1, 2 * Cin), jnp.int32)], axis=0)
    rows = tab.at[anchors.reshape(-1)].get(mode="promise_in_bounds")
    rows = rows.reshape(V, 9, 2 * Cin)
    l0 = _unpack_lo_f32(rows[..., :Cin]).astype(jnp.bfloat16)
    l1 = _unpack_hi_f32(rows[..., :Cin]).astype(jnp.bfloat16)
    l2 = _unpack_lo_f32(rows[..., Cin:]).astype(jnp.bfloat16)
    l3 = _unpack_hi_f32(rows[..., Cin:]).astype(jnp.bfloat16)
    c = case[..., None]
    zero = jnp.zeros_like(l0)
    tm1 = jnp.where(c == 0, l0, jnp.where(c == 1, l1, zero))
    t0 = jnp.where(c == 0, l1, jnp.where(c == 1, l2, l0))
    tp1 = jnp.where(c == 0, l2, jnp.where(c == 1, l3, l1))
    cols = jnp.stack([tm1, t0, tp1], axis=2).reshape(V, 27 * Cin)
    return jnp.dot(cols, weight.astype(feats.dtype),
                   preferred_element_type=jnp.float32).astype(feats.dtype)


def bench_subm9():
    rng = np.random.RandomState(0)
    for (V, Cin, Cout, n_convs) in ((120000, 16, 16, 5), (90000, 32, 32, 4),
                                    (60000, 64, 64, 4), (40000, 128, 128, 4)):
        feats = jnp.asarray(rng.randn(V, Cin), jnp.bfloat16)
        anchors = jnp.asarray(rng.randint(0, V, (V, 9)), jnp.int32)
        case = jnp.asarray(rng.randint(0, 3, (V, 9)), jnp.int32)
        x_chain = jnp.asarray(rng.randint(0, V, (V, 3)), jnp.int32)
        w = jnp.asarray(rng.randn(27 * Cin, Cout) * .05, jnp.bfloat16)
        dt = bench(subm_quad, feats, anchors, case, x_chain, w,
                   name=f"subm9 V={V} C={Cin}")
        print(f"   stage total ~{dt * n_convs * 1e3:.1f} ms ({n_convs} convs)")


def bench_dense3d():
    """Dense conv3d alternative for the late stages (grid small enough)."""
    rng = np.random.RandomState(0)
    for (D, H, W, C, V, n_convs) in ((11, 360, 360, 64, 60000, 4),
                                     (5, 180, 180, 128, 40000, 4)):
        dense = jnp.asarray(rng.randn(1, D, H, W, C), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, C, C) * .05, jnp.bfloat16)
        def fn(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
        dt = bench(fn, dense, w, name=f"dense3d {D}x{H}x{W}x{C}")
        print(f"   stage total ~{dt * n_convs * 1e3:.1f} ms ({n_convs} convs)")
        # scatter in / gather out cost
        coords = jnp.asarray(rng.randint(0, D * H * W, (V,)), jnp.int32)
        feats = jnp.asarray(rng.randn(V, C), jnp.bfloat16)
        def scatter(f, c):
            return jnp.zeros((D * H * W, C), f.dtype).at[c].set(f)
        bench(scatter, feats, coords, name=f"  scatter V={V} C={C}")
        def gather(x, c):
            return x.reshape(D * H * W, C).at[c].get(mode="promise_in_bounds")
        bench(gather, dense, coords, name=f"  gather V={V} C={C}")


def bench_dcn3():
    """DCN gather: one big 73MB table vs per-camera 12MB tables."""
    rng = np.random.RandomState(0)
    B, H, W, Cin, K = 6, 58, 100, 256, 9
    N = H * W * K
    tab = jnp.asarray(rng.randint(-2**30, 2**30,
                                  (B * (H + 1) * (W + 1), 2 * Cin)), jnp.int32)
    idx = jnp.asarray(rng.randint(0, (H + 1) * (W + 1), (B, N)), jnp.int32)

    def big(t, i):
        off = (jnp.arange(B, dtype=jnp.int32) * (H + 1) * (W + 1))[:, None]
        return t.at[(i + off).reshape(-1)].get(mode="promise_in_bounds")

    def per_cam(t, i):
        t = t.reshape(B, (H + 1) * (W + 1), 2 * Cin)
        outs = [t[b].at[i[b]].get(mode="promise_in_bounds") for b in range(B)]
        return jnp.concatenate(outs, axis=0)

    dt = bench(big, tab, idx, name="dcn gather one 73MB table")
    print(f"   -> {dt / (B * N) * 1e9:.2f} ns/row")
    dt = bench(per_cam, tab, idx, name="dcn gather per-camera 12MB tables")
    print(f"   -> {dt / (B * N) * 1e9:.2f} ns/row")



def subm_pair(feats, anchorA, anchorB, case, xp1, weight):
    """x-pair formulation: 18 rows per voxel, table = 2x feats bytes.

    pack2[c] = (f[c], f[x+1 of c]); per x-triple (cl, cm, cr):
      case0 (cl active):            A=pack2[cl] -> (t_l, t_m) = (A.lo, A.hi); t_r = B.lo
      case1 (cl empty, cm active):  A=pack2[cm] -> (t_l, t_m, t_r) = (0, A.lo, A.hi)
      case2 (cl, cm empty):         (0, 0, B.lo)
    with B = pack2[cr] always.
    """
    V, Cin = feats.shape
    fpad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
    fp1 = fpad.at[xp1].get(mode="promise_in_bounds")
    tab = _pack_pairs(feats, fp1)
    tab = jnp.concatenate([tab, jnp.zeros((1, Cin), jnp.int32)], axis=0)
    A = tab.at[anchorA.reshape(-1)].get(mode="promise_in_bounds").reshape(
        V, 9, Cin)
    B = tab.at[anchorB.reshape(-1)].get(mode="promise_in_bounds").reshape(
        V, 9, Cin)
    alo = _unpack_lo_f32(A).astype(jnp.bfloat16)
    ahi = _unpack_hi_f32(A).astype(jnp.bfloat16)
    blo = _unpack_lo_f32(B).astype(jnp.bfloat16)
    c = case[..., None]
    zero = jnp.zeros_like(alo)
    tl = jnp.where(c == 0, alo, zero)
    tm = jnp.where(c == 0, ahi, jnp.where(c == 1, alo, zero))
    tr = jnp.where(c == 0, blo, jnp.where(c == 1, ahi, blo))
    cols = jnp.stack([tl, tm, tr], axis=2).reshape(V, 27 * Cin)
    return jnp.dot(cols, weight.astype(feats.dtype),
                   preferred_element_type=jnp.float32).astype(feats.dtype)


def bench_subm18():
    from unibev_tpu.ops.sparse_conv import XPairPlan, xpair_cols, xpair_weight
    import jax.numpy as jnp

    def subm_pair_real(feats, aA, aB, case, xp1, w):
        plan = XPairPlan(aA, aB, case, xp1)
        cols = xpair_cols(feats, plan)
        wx = xpair_weight(w, 9, feats.shape[1])
        return jnp.dot(cols, wx.astype(feats.dtype),
                       preferred_element_type=jnp.float32).astype(feats.dtype)

    rng = np.random.RandomState(0)
    for (V, Cin, Cout, n_convs) in ((120000, 16, 16, 5), (90000, 32, 32, 4),
                                    (60000, 64, 64, 4), (40000, 128, 128, 4)):
        feats = jnp.asarray(rng.randn(V, Cin), jnp.bfloat16)
        aA = jnp.asarray(rng.randint(0, V, (V, 9)), jnp.int32)
        aB = jnp.asarray(rng.randint(0, V, (V, 9)), jnp.int32)
        case = jnp.asarray(rng.randint(0, 3, (V, 9)), jnp.int32)
        xp1 = jnp.asarray(rng.randint(0, V, (V,)), jnp.int32)
        w = jnp.asarray(rng.randn(27 * Cin, Cout) * .05, jnp.bfloat16)
        dt = bench(subm_pair_real, feats, aA, aB, case, xp1, w,
                   name=f"subm18 V={V} C={Cin}")
        print(f"   stage total ~{dt * n_convs * 1e3:.1f} ms ({n_convs} convs)")


def bench_subm18split():
    """stage3 pair scheme with channels split into two half-width tables
    (each under the fast window) — tests whether the ~20MB cliff is about
    per-table size or total working set."""
    rng = np.random.RandomState(0)
    V, Cin, Cout = 40000, 128, 128
    feats = jnp.asarray(rng.randn(V, Cin), jnp.bfloat16)
    aA = jnp.asarray(rng.randint(0, V, (V, 9)), jnp.int32)
    aB = jnp.asarray(rng.randint(0, V, (V, 9)), jnp.int32)
    case = jnp.asarray(rng.randint(0, 3, (V, 9)), jnp.int32)
    xp1 = jnp.asarray(rng.randint(0, V, (V,)), jnp.int32)
    w = jnp.asarray(rng.randn(27 * Cin, Cout) * .05, jnp.bfloat16)

    def split(feats, aA, aB, case, xp1, w):
        h = Cin // 2
        w3 = w.reshape(27, Cin, Cout)
        outs = 0
        for lo, hi in ((0, h), (h, Cin)):
            cols = subm_pair_cols(feats[:, lo:hi], aA, aB, case, xp1)
            wk = w3[:, lo:hi, :].reshape(27 * h, Cout)
            outs = outs + jnp.dot(cols, wk,
                                  preferred_element_type=jnp.float32)
        return outs.astype(feats.dtype)

    bench(split, feats, aA, aB, case, xp1, w, name="subm18split V=40000 C=128")


def subm_pair_cols(feats, anchorA, anchorB, case, xp1):
    V, Cin = feats.shape
    fpad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
    fp1 = fpad.at[xp1].get(mode="promise_in_bounds")
    tab = _pack_pairs(feats, fp1)
    tab = jnp.concatenate([tab, jnp.zeros((1, Cin), jnp.int32)], axis=0)
    A = tab.at[anchorA.reshape(-1)].get(mode="promise_in_bounds").reshape(
        V, 9, Cin)
    B = tab.at[anchorB.reshape(-1)].get(mode="promise_in_bounds").reshape(
        V, 9, Cin)
    alo = _unpack_lo_f32(A).astype(jnp.bfloat16)
    ahi = _unpack_hi_f32(A).astype(jnp.bfloat16)
    blo = _unpack_lo_f32(B).astype(jnp.bfloat16)
    c = case[..., None]
    zero = jnp.zeros_like(alo)
    tl = jnp.where(c == 0, alo, zero)
    tm = jnp.where(c == 0, ahi, jnp.where(c == 1, alo, zero))
    tr = jnp.where(c == 0, blo, jnp.where(c == 1, ahi, blo))
    return jnp.stack([tl, tm, tr], axis=2).reshape(V, 27 * Cin)


def bench_scaimg():
    """SCA-img MSDA shape: BH=48, value 29x50, K=12800 queries, P=8."""
    from unibev_tpu.ops.msda import _slab_level_fast, _slab_level
    rng = np.random.RandomState(0)
    BH, H, W, D, Q, P = 48, 29, 50, 32, 12800, 8
    value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)
    bench(lambda v, l, a: _slab_level_fast(v, H, W, l, a), value, loc, attn,
          name="scaimg slab_fast (48 heads grouped)")
    bench(lambda v, l, a: _slab_level(v, H, W, l, a), value, loc, attn,
          name="scaimg slab clean (one batched gather)")

    # variant: one-hot MXU — value map is only 1450 tokens; the sampling
    # matrix (Q, 4P=32 nnz of 1450) applied as matmul could beat gathers
    from unibev_tpu.ops.msda import _onehot_level
    bench(lambda v, l, a: _onehot_level(v, H, W, l, a, 4096), value, loc, attn,
          name="scaimg onehot MXU (chunk 4096)")
    bench(lambda v, l, a: _onehot_level(v, H, W, l, a, 12800), value, loc,
          attn, name="scaimg onehot MXU (chunk 12800)")


def bench_tsa():
    """TSA shape: BH=8, value 200x200, Q=40000, P=4."""
    from unibev_tpu.ops.msda import _slab_level_fast
    rng = np.random.RandomState(0)
    BH, H, W, D, Q, P = 8, 200, 200, 32, 40000, 4
    value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)
    bench(lambda v, l, a: _slab_level_fast(v, H, W, l, a), value, loc, attn,
          name="tsa slab_fast (G grouping)")


def bench_msdabwd():
    """MSDA backward variants at the three hot shapes: custom sorted-scatter
    vs custom unsorted vs onehot-autodiff (SCA-img only)."""
    import unibev_tpu.ops.msda as M

    def run(BH, H, W, Q, P, label):
        rng = np.random.RandomState(0)
        D = 32
        value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
        loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
        attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)

        def g_custom(v, l, a):
            return (M._slab_level_op(H, W, v, l, a).astype(jnp.float32)
                    ** 2).sum()

        def g_onehot(v, l, a):
            return (M._onehot_level(v, H, W, l, a, 4096).astype(jnp.float32)
                    ** 2).sum()

        for sort in (True, False):
            M.SORT_SCATTER = sort
            fn = lambda v, l, a: jax.grad(g_custom, argnums=(0, 1, 2))(
                v, l, a)[0]
            bench(fn, value, loc, attn,
                  name=f"{label} custom bwd sort={sort}")
        if H * W <= 2048:
            fn = lambda v, l, a: jax.grad(g_onehot, argnums=(0, 1, 2))(
                v, l, a)[0]
            bench(fn, value, loc, attn, name=f"{label} onehot autodiff bwd")

    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "scaimg"):
        run(48, 29, 50, 12800, 8, "scaimg")
    if which in ("all", "tsa"):
        run(8, 200, 200, 40000, 4, "tsa")
    if which in ("all", "ptssca"):
        run(8, 200, 200, 40000, 8, "ptssca")



def bench_s16table():
    """VERDICT r4 #3c: would s16-packing the window3 index tables (2 entries
    per s32 lane — capacities 90k/60k/40k fit u16) speed the slow-window
    lookups?  Compares 128-lane row gathers from an N-entry s32 table vs an
    N/2-lane packed table + unpack, at the stage-0/1 grid sizes."""
    rng = np.random.RandomState(0)
    n_rows = 1_000_000
    for n_entries, label in ((41 * 1440 * 1440, "stage0 85M"),
                             (21 * 720 * 720, "stage1 10.9M"),
                             (11 * 360 * 360, "stage2 1.4M")):
        nrow32 = n_entries // 128
        tab32 = jnp.asarray(
            rng.randint(0, 90000, (nrow32, 128)), jnp.int32)
        idx32 = jnp.asarray(rng.randint(0, nrow32, n_rows), jnp.int32)
        fn32 = lambda t, i: jnp.take(t, i, axis=0)
        dt = bench(fn32, tab32, idx32, name=f"{label} s32 row gather")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row "
              f"(table {nrow32 * 128 * 4 / 1e6:.0f} MB)")

        nrow16 = n_entries // 256          # 2 entries per lane
        tab16 = jnp.asarray(
            rng.randint(0, 2**31 - 1, (nrow16, 128)), jnp.int32)
        idx16 = jnp.asarray(rng.randint(0, nrow16, n_rows), jnp.int32)

        def fn16(t, i):
            rows = jnp.take(t, i, axis=0)
            lo = rows & jnp.int32(0xFFFF)
            hi = (rows >> 16) & jnp.int32(0xFFFF)
            return lo + hi
        dt = bench(fn16, tab16, idx16, name=f"{label} s16-packed gather+unpack")
        print(f"   -> {dt / n_rows * 1e9:.2f} ns/row "
              f"(table {nrow16 * 128 * 4 / 1e6:.0f} MB)")


def bench_msdadm():
    """D-major corner packing for the slab MSDA forward: rows laid out
    (d*4 + corner) so the corner lerp is ONE dense-lane mul (weights tiled
    from 1D per-corner arrays) and the P-sum + corner-sum are dense-lane
    reduces — vs the current corner-major slices producing (., D=32)
    4x-padded intermediates (trace: ~7 ms of post-gather elementwise per
    TSA call at the 2 ms dense-traffic floor).  Also probes whether the
    earlier MXU-reduction failure (PERF.md: 13.3 vs 6.7 ms — XLA
    materialized broadcast corner-weight planes) was the corner-MAJOR
    layout's fault."""
    import unibev_tpu.ops.msda as M

    def run(BH, H, W, Q, P, label):
        D = 32
        rng = np.random.RandomState(0)
        value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
        loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
        attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)

        bench(lambda v, l, a: M._slab_level_fast(v, H, W, l, a),
              value, loc, attn, name=f"{label} corner-major (current)")

        def dm(value, loc, attn):
            TR = (H + 1) * (W + 1)
            v = value.reshape(BH, H, W, D)
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            v4 = jnp.stack([v[:, :-1, :-1], v[:, :-1, 1:],
                            v[:, 1:, :-1], v[:, 1:, 1:]],
                           axis=-1)                    # (BH, H+1, W+1, D, 4)
            v4 = v4.reshape(BH, TR, 4 * D)

            x = loc[..., 0] * W - 0.5
            y = loc[..., 1] * H - 0.5
            valid = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
            xp = x + 1.0
            yp = y + 1.0
            x0 = jnp.floor(xp)
            y0 = jnp.floor(yp)
            lx = (xp - x0).astype(value.dtype)
            ly = (yp - y0).astype(value.dtype)
            x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
            y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
            idx = (y0c * (W + 1) + x0c).reshape(BH, Q * P)

            w = (attn * valid.astype(attn.dtype)).astype(value.dtype) \
                .reshape(BH, Q * P)
            lyf = ly.reshape(BH, Q * P) * w
            lxf = lx.reshape(BH, Q * P)
            w00 = (w - lyf) * (1 - lxf)
            w01 = (w - lyf) * lxf
            w10 = lyf * (1 - lxf)
            w11 = lyf * lxf
            w4 = jnp.stack([w00, w01, w10, w11], axis=-1)  # (BH, QP, 4)

            bytes_per_head = TR * 4 * D * value.dtype.itemsize
            G = max(1, min(BH, int(20e6 // max(bytes_per_head, 1))))
            while BH % G:
                G -= 1
            offs = (jnp.arange(G, dtype=jnp.int32) * TR)[:, None]
            outs = []
            for g in range(0, BH, G):
                tab = v4[g:g + G].reshape(G * TR, 4 * D)
                fidx = (idx[g:g + G] + offs).reshape(-1)
                rows = tab.at[fidx].get(mode="promise_in_bounds")
                rows = rows.reshape(G, Q * P, D, 4)
                wrows = rows * w4[g:g + G, :, None, :]
                s1 = wrows.reshape(G, Q, P, 4 * D).sum(axis=2)   # dense lanes
                outs.append(s1.reshape(G, Q, D, 4).sum(-1))      # (G, Q, D)
            return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

        out_ref = M._slab_level_fast(value, H, W, loc, attn)
        out_dm = dm(value, loc, attn)
        err = float(jnp.max(jnp.abs(out_ref.astype(jnp.float32)
                                    - out_dm.astype(jnp.float32))))
        print(f"{label} dm-vs-ref max|d| = {err:.5f}")
        bench(dm, value, loc, attn, name=f"{label} D-major")

    run(8, 200, 200, 40000, 4, "tsa")
    run(8, 200, 200, 40000, 8, "ptssca")




def bench_msdagroup():
    """Head-group size vs gather-window cliff for the slab MSDA forward:
    per-head tables are 10.3 MB (TSA/ptsSCA), so the 20 MB window forces
    G=1 (8 separate gather+lerp fusions).  Measures G in {1,2,4,8} — if the
    cliff is soft above 20 MB, bigger groups amortize the per-group fusion
    overhead seen in-model (11.3 ms vs 5.8 standalone per TSA call)."""
    import unibev_tpu.ops.msda as M

    def run(BH, H, W, Q, P, label):
        D = 32
        rng = np.random.RandomState(0)
        value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
        loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
        attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)

        def fast_g(value, loc, attn, G):
            TR = (H + 1) * (W + 1)
            v = value.reshape(BH, H, W, D)
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            v4 = jnp.concatenate(
                [v[:, :-1, :-1], v[:, :-1, 1:], v[:, 1:, :-1], v[:, 1:, 1:]],
                axis=-1).reshape(BH, TR, 4 * D)
            x = loc[..., 0] * W - 0.5
            y = loc[..., 1] * H - 0.5
            valid = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
            xp = x + 1.0
            yp = y + 1.0
            x0 = jnp.floor(xp)
            y0 = jnp.floor(yp)
            lx = (xp - x0).astype(value.dtype)
            ly = (yp - y0).astype(value.dtype)
            x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
            y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
            idx = (y0c * (W + 1) + x0c).reshape(BH, Q * P)
            w = (attn * valid.astype(attn.dtype)).astype(value.dtype).reshape(
                BH, Q * P, 1)
            lyf = ly.reshape(BH, Q * P, 1) * w
            lxf = lx.reshape(BH, Q * P, 1)
            w00 = (w - lyf) * (1 - lxf)
            w01 = (w - lyf) * lxf
            w10 = lyf * (1 - lxf)
            w11 = lyf * lxf
            offs = (jnp.arange(G, dtype=jnp.int32) * TR)[:, None]
            outs = []
            for g in range(0, BH, G):
                tab = v4[g:g + G].reshape(G * TR, 4 * D)
                fidx = (idx[g:g + G] + offs).reshape(-1)
                rows = tab.at[fidx].get(mode="promise_in_bounds")
                rows = rows.reshape(G, Q * P, 4 * D)
                samp = (rows[..., 0 * D:1 * D] * w00[g:g + G]
                        + rows[..., 1 * D:2 * D] * w01[g:g + G]
                        + rows[..., 2 * D:3 * D] * w10[g:g + G]
                        + rows[..., 3 * D:4 * D] * w11[g:g + G])
                outs.append(samp.reshape(G, Q, P, D).sum(axis=2))
            return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

        for G in (1, 2, 4, 8):
            bench(lambda v, l, a, G=G: fast_g(v, l, a, G),
                  value, loc, attn,
                  name=f"{label} G={G} (table {G * 10.3:.0f} MB)")

    run(8, 200, 200, 40000, 4, "tsa")
    run(8, 200, 200, 40000, 8, "ptssca")




def bench_msdageom():
    """Cost of the MSDA geometry chain in the NARROW (BH, Q, P[, 2]) layout
    (every pass reads/writes 16-64x lane-padded tiles) vs the same math on
    pre-split WIDE (BH, Q*P) loc_x/loc_y arrays.  The narrow chain is what
    runs in-model today (loc built as (..., P, 2) in deformable.py); the
    wide form is what an xy-blocked sampling_offsets layout would enable."""
    def geom_narrow(loc, attn):
        BH, Q, P, _ = loc.shape
        W = H = 200
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        valid = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
        xp = x + 1.0
        yp = y + 1.0
        x0 = jnp.floor(xp)
        y0 = jnp.floor(yp)
        lx = (xp - x0).astype(jnp.bfloat16)
        ly = (yp - y0).astype(jnp.bfloat16)
        x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
        y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
        idx = (y0c * (W + 1) + x0c).reshape(BH, Q * P)
        w = (attn * valid.astype(attn.dtype)).astype(jnp.bfloat16).reshape(
            BH, Q * P, 1)
        lyf = ly.reshape(BH, Q * P, 1) * w
        lxf = lx.reshape(BH, Q * P, 1)
        w00 = (w - lyf) * (1 - lxf)
        w11 = lyf * lxf
        return idx.astype(jnp.float32).sum(-1)[:, None] + (
            w00 + w11).astype(jnp.float32).sum(1)

    def geom_wide(loc_x, loc_y, attn2):
        BH, QP = loc_x.shape
        W = H = 200
        x = loc_x * W - 0.5
        y = loc_y * H - 0.5
        valid = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
        xp = x + 1.0
        yp = y + 1.0
        x0 = jnp.floor(xp)
        y0 = jnp.floor(yp)
        lx = (xp - x0).astype(jnp.bfloat16)
        ly = (yp - y0).astype(jnp.bfloat16)
        x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
        y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
        idx = y0c * (W + 1) + x0c
        w = (attn2 * valid.astype(attn2.dtype)).astype(jnp.bfloat16)
        lyf = ly * w
        lxf = lx
        w00 = (w - lyf) * (1 - lxf)
        w11 = lyf * lxf
        return idx.astype(jnp.float32).sum(-1)[:, None] + (
            w00 + w11).astype(jnp.float32).sum(-1)[:, None]

    rng = np.random.RandomState(0)
    for P, label in ((4, "tsa"), (8, "ptssca")):
        BH, Q = 8, 40000
        # loc in bf16 / attn in f32 so the harness perturbs LOC --
        # otherwise the whole geometry chain hoists out of the timing loop
        loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.bfloat16)
        attn = jnp.asarray(rng.rand(BH, Q, P), jnp.float32)
        bench(geom_narrow, loc, attn, name=f"{label} geom narrow (B,Q,P,2)")
        loc_x = jnp.asarray(rng.rand(BH, Q * P), jnp.bfloat16)
        loc_y = jnp.asarray(rng.rand(BH, Q * P), jnp.float32)
        attn2 = jnp.asarray(rng.rand(BH, Q * P), jnp.float32)
        bench(geom_wide, loc_x, loc_y, attn2, name=f"{label} geom wide (BH,QP)")




def bench_scatter():
    """XLA scatter-add vs the Pallas VMEM-resident RMW kernel at the train
    backward's two hot shapes (MSDA TSA 256B rows, DCN stage-3 2KB rows)."""
    from unibev_tpu.ops.scatter_pallas import scatter_add_rows
    rng = np.random.RandomState(0)
    shapes = [
        # (name, M rows, TR table rows, lanes)
        ("tsa-head (Gs=1)", 160000, 40602, 128),
        ("tsa-2head", 320000, 2 * 40602, 128),
        ("dcn-cam", 52224, 6059, 1024),
        ("ptssca-head", 320000, 33306, 128),
    ]
    for name, M, TR, L in shapes:
        # near-raster keys like the real backward (query-raster order +-
        # small deviation)
        base = np.linspace(0, TR - 8, M).astype(np.int32)
        k = np.clip(base + rng.randint(-400, 400, M), 0, TR - 1).astype(np.int32)
        c = jnp.asarray(rng.randn(M, L).astype(np.float32), jnp.bfloat16)
        ki = jnp.asarray(k)

        def xla(c_, k_):
            return jnp.zeros((TR, L), c_.dtype).at[k_].add(c_)

        bench(xla, c, ki, name=f"xla-scatter {name} M={M} L={L}")
        for mc in (1024, 4096):
            if M % mc:
                continue
            def pal(c_, k_, mc=mc):
                return scatter_add_rows(k_, c_, TR, mc=mc)
            bench(pal, c, ki, name=f"pallas-rmw mc={mc} {name}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gather"
    globals()[f"bench_{which}"]()
