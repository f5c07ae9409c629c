"""Sparse conv primitives vs a dense torch conv3d oracle.

A submanifold conv equals the dense conv evaluated at the active input sites
(zeros elsewhere); a strided sparse conv equals the dense strided conv
evaluated at spconv's active output sites.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from unibev_tpu.ops.sparse_conv import (SparseGrid, build_table,
                                        subm_neighbor_idx, gather_conv,
                                        downsample_active_set,
                                        strided_neighbor_idx, to_dense)


def make_sparse(rng, B, D, H, W, C, n_active, capacity):
    coords = set()
    while len(coords) < n_active:
        coords.add((rng.randint(B), rng.randint(D), rng.randint(H), rng.randint(W)))
    coords = np.array(sorted(coords), np.int32)
    V = capacity
    pad = V - len(coords)
    mask = np.array([True] * len(coords) + [False] * pad)
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats = rng.randn(V, C).astype(np.float32) * mask[:, None]
    return feats, coords, mask


def dense_of(feats, coords, mask, B, D, H, W, C):
    dense = np.zeros((B, D, H, W, C), np.float32)
    for f, c, m in zip(feats, coords, mask):
        if m:
            dense[c[0], c[1], c[2], c[3]] = f
    return dense


def torch_conv3d(dense_bdhwc, w_kcico, stride, padding):
    # w: (27*Cin, Cout) tap-major (dz,dy,dx row-major) -> torch (Cout,Cin,kz,ky,kx)
    B, D, H, W, Cin = dense_bdhwc.shape
    Cout = w_kcico.shape[1]
    w = w_kcico.reshape(3, 3, 3, Cin, Cout).transpose(4, 3, 0, 1, 2)
    x = torch.from_numpy(dense_bdhwc.transpose(0, 4, 1, 2, 3).copy())
    out = F.conv3d(x, torch.from_numpy(w.copy()), stride=stride, padding=padding)
    return out.numpy().transpose(0, 2, 3, 4, 1)


def test_subm_conv_matches_dense():
    rng = np.random.RandomState(0)
    B, D, H, W, Cin, Cout = 2, 6, 10, 10, 4, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 150, 256)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    w = (rng.randn(27 * Cin, Cout) * 0.1).astype(np.float32)
    out = np.array(gather_conv(jnp.array(feats), nidx, jnp.array(w), grid.mask))

    dense = dense_of(feats, coords, mask, B, D, H, W, Cin)
    ref = torch_conv3d(dense, w, 1, 1)
    for i in range(256):
        if mask[i]:
            b, z, y, x = coords[i]
            np.testing.assert_allclose(out[i], ref[b, z, y, x], atol=1e-4, rtol=1e-4)
        else:
            assert np.allclose(out[i], 0)


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    B, D, H, W, Cin, Cout = 1, 9, 12, 12, 3, 5
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 80, 128)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    stride, padding = (2, 2, 2), (1, 1, 1)
    Do, Ho, Wo = [(s + 2 * p - 3) // st + 1 for s, p, st in
                  zip((D, H, W), padding, stride)]
    co, mo, overflow = downsample_active_set(
        jnp.array(coords), jnp.array(mask), (3, 3, 3), stride, padding,
        (Do, Ho, Wo), 512, B)
    assert int(overflow) == 0
    nidx = strided_neighbor_idx(grid, table, co, mo, (3, 3, 3), stride, padding)
    w = (rng.randn(27 * Cin, Cout) * 0.1).astype(np.float32)
    out = np.array(gather_conv(jnp.array(feats), nidx, jnp.array(w), mo))

    dense = dense_of(feats, coords, mask, B, D, H, W, Cin)
    ref = torch_conv3d(dense, w, 2, 1)

    co_np, mo_np = np.array(co), np.array(mo)
    # 1) value parity at active output sites
    for i in range(512):
        if mo_np[i]:
            b, z, y, x = co_np[i]
            np.testing.assert_allclose(out[i], ref[b, z, y, x], atol=1e-4, rtol=1e-4)
    # 2) active-site-set parity: dense-nonzero sites == our active sites
    #    (active means kernel window covers an input site; random features are
    #    nonzero a.s.)
    ours = {tuple(c) for c, m in zip(co_np, mo_np) if m}
    theirs = set()
    dense_in_mask = dense_of(np.ones_like(feats), coords, mask, B, D, H, W, Cin)
    cover = torch_conv3d(dense_in_mask, np.ones((27 * Cin, 1), np.float32), 2, 1)
    for b in range(B):
        for z in range(Do):
            for y in range(Ho):
                for x in range(Wo):
                    if cover[b, z, y, x, 0] > 0:
                        theirs.add((b, z, y, x))
    assert ours == theirs


def test_to_dense_roundtrip():
    rng = np.random.RandomState(2)
    B, D, H, W, C = 2, 3, 5, 5, 4
    feats, coords, mask = make_sparse(rng, B, D, H, W, C, 40, 64)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    dense = np.array(to_dense(jnp.array(feats), grid))
    ref = dense_of(feats, coords, mask, B, D, H, W, C)
    np.testing.assert_allclose(dense, ref)


def test_downsample_with_table_matches_sort_variant():
    from unibev_tpu.ops.sparse_conv import downsample_with_table
    rng = np.random.RandomState(3)
    B, D, H, W, Cin = 2, 9, 14, 14, 3
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 120, 200)
    stride, padding = (2, 2, 2), (1, 1, 1)
    Do, Ho, Wo = [(s + 2 * p - 3) // st + 1 for s, p, st in
                  zip((D, H, W), padding, stride)]
    cap = 512
    co1, mo1, ov1 = downsample_active_set(
        jnp.array(coords), jnp.array(mask), (3, 3, 3), stride, padding,
        (Do, Ho, Wo), cap, B)
    co2, mo2, table2, ov2 = downsample_with_table(
        jnp.array(coords), jnp.array(mask), (3, 3, 3), stride, padding,
        (Do, Ho, Wo), cap, B, in_shape=(D, H, W))
    assert int(ov1) == int(ov2) == 0
    np.testing.assert_array_equal(np.array(mo1), np.array(mo2))
    np.testing.assert_array_equal(np.array(co1), np.array(co2))
    # returned table must equal build_table of the new grid
    from unibev_tpu.ops.sparse_conv import table_entries
    g = SparseGrid(co2, mo2, (Do, Ho, Wo), B)
    ref_table = build_table(g)
    np.testing.assert_array_equal(np.array(table_entries(table2)),
                                  np.array(table_entries(ref_table)))
    # table_in (occupancy derived from the input table, scatter-free) must
    # give the identical result
    co3, mo3, table3, ov3 = downsample_with_table(
        jnp.array(coords), jnp.array(mask), (3, 3, 3), stride, padding,
        (Do, Ho, Wo), cap, B, in_shape=(D, H, W),
        table_in=build_table(SparseGrid(jnp.array(coords), jnp.array(mask),
                                        (D, H, W), B)))
    assert int(ov3) == 0
    np.testing.assert_array_equal(np.array(co1), np.array(co3))
    np.testing.assert_array_equal(np.array(table_entries(table3)),
                                  np.array(table_entries(ref_table)))


def test_subm_gather_conv_grad_matches_default_ad():
    import jax
    from unibev_tpu.ops.sparse_conv import subm_gather_conv
    rng = np.random.RandomState(5)
    B, D, H, W, Cin, Cout = 1, 5, 8, 8, 4, 6
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 60, 100)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    w = (rng.randn(27 * Cin, Cout) * 0.1).astype(np.float32)
    g_out = rng.randn(100, Cout).astype(np.float32)

    def f_custom(f, w_):
        return (subm_gather_conv(f, nidx, w_, grid.mask) * g_out).sum()

    def f_default(f, w_):
        return (gather_conv(f, nidx, w_, grid.mask) * g_out).sum()

    gf1, gw1 = jax.grad(f_custom, argnums=(0, 1))(jnp.array(feats), jnp.array(w))
    gf2, gw2 = jax.grad(f_default, argnums=(0, 1))(jnp.array(feats), jnp.array(w))
    np.testing.assert_allclose(np.array(gf1), np.array(gf2), atol=1e-4)
    np.testing.assert_allclose(np.array(gw1), np.array(gw2), atol=1e-4)


def test_xpair_cols_match_plain_gather_subm():
    """x-pair packed im2col == the 27-narrow-row gather, bitwise (bf16)."""
    import jax
    from unibev_tpu.ops.sparse_conv import (make_xpair_plan, xpair_cols,
                                            subm_xpair_conv, subm_gather_conv)
    rng = np.random.RandomState(3)
    B, D, H, W, Cin, Cout = 2, 6, 12, 12, 8, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 220, 256)
    feats = feats.astype(np.float32)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    plan = make_xpair_plan(nidx, nidx[:, 14], nidx.shape[0])

    fb = jnp.asarray(feats, jnp.bfloat16)
    cols_fast = np.asarray(xpair_cols(fb, plan), np.float32)
    fpad = jnp.concatenate([fb, jnp.zeros((1, Cin), jnp.bfloat16)], 0)
    cols_ref = np.asarray(jnp.take(fpad, nidx.reshape(-1), axis=0).reshape(
        256, 27 * Cin), np.float32)
    # xpair_cols is x-position major (dx, plane, cin); permute the tap-major
    # reference to compare bitwise
    cols_ref_x = cols_ref.reshape(256, 9, 3, Cin).transpose(
        0, 2, 1, 3).reshape(256, 27 * Cin)
    np.testing.assert_array_equal(cols_fast, cols_ref_x)

    w = jnp.asarray(rng.randn(27 * Cin, Cout) * 0.1, jnp.bfloat16)
    out_fast = np.asarray(subm_xpair_conv(fb, nidx, plan, w, grid.mask),
                          np.float32)
    out_ref = np.asarray(subm_gather_conv(fb, nidx, w, grid.mask), np.float32)
    np.testing.assert_allclose(out_fast, out_ref, atol=1e-2, rtol=1e-2)

    # gradients: custom bwd == plain path bwd
    def loss_fast(f, w_):
        return (subm_xpair_conv(f, nidx, plan, w_, grid.mask) ** 2).sum()

    def loss_ref(f, w_):
        return (subm_gather_conv(f, nidx, w_, grid.mask) ** 2).sum()

    gf = jax.grad(loss_fast, argnums=(0, 1))(fb, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(fb, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_xpair_cols_match_plain_gather_strided():
    from unibev_tpu.ops.sparse_conv import (downsample_with_table,
                                            make_xpair_plan,
                                            strided_xpair_conv)
    rng = np.random.RandomState(4)
    B, D, H, W, Cin, Cout = 1, 7, 14, 14, 8, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 200, 256)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    out_shape = ((D + 2 * 1 - 3) // 2 + 1, (H - 1) // 2 + 1, (W - 1) // 2 + 1)
    co, mo, _, _ = downsample_with_table(
        grid.coords, grid.mask, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape,
        128, B, in_shape=(D, H, W))
    sidx = strided_neighbor_idx(grid, table, co, mo, (3, 3, 3), (2, 2, 2),
                                (1, 1, 1))
    splan = make_xpair_plan(sidx, nidx[:, 14], 256)

    fb = jnp.asarray(feats, jnp.bfloat16)
    w = jnp.asarray(rng.randn(27 * Cin, Cout) * 0.1, jnp.bfloat16)
    out_fast = np.asarray(strided_xpair_conv(fb, sidx, splan, None, w, mo),
                          np.float32)
    out_ref = np.asarray(gather_conv(fb, sidx, w, mo), np.float32)
    np.testing.assert_allclose(out_fast, out_ref, atol=1e-2, rtol=1e-2)


def test_strided_inverse_backward_matches_autodiff():
    """d_feats via the inverse-output-table gather == autodiff scatter of
    the clean formulation (and d_weight through the x-pair cols)."""
    import jax
    from unibev_tpu.ops.sparse_conv import (downsample_with_table,
                                            inverse_strided_idx,
                                            make_xpair_plan,
                                            strided_xpair_conv)
    rng = np.random.RandomState(5)
    B, D, H, W, Cin, Cout = 1, 7, 14, 14, 8, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 200, 256)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    out_shape = ((D + 2 - 3) // 2 + 1, (H - 1) // 2 + 1, (W - 1) // 2 + 1)
    co, mo, out_table, _ = downsample_with_table(
        grid.coords, grid.mask, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape,
        128, B, in_shape=(D, H, W))
    sidx = strided_neighbor_idx(grid, table, co, mo, (3, 3, 3), (2, 2, 2),
                                (1, 1, 1))
    splan = make_xpair_plan(sidx, nidx[:, 14], 256)
    sinv = inverse_strided_idx(grid.coords, grid.mask, out_table,
                               (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape, 128)

    fb = jnp.asarray(feats, jnp.bfloat16)
    w = jnp.asarray(rng.randn(27 * Cin, Cout) * 0.1, jnp.bfloat16)

    def loss_fast(f, w_):
        return (strided_xpair_conv(f, sidx, splan, sinv, w_, mo).astype(
            jnp.float32) ** 2).sum()

    def loss_ref(f, w_):
        return (gather_conv(f, sidx, w_, mo).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_fast, argnums=(0, 1))(fb, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(fb, w)
    for name, a, b in zip(("d_feats", "d_weight"), gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=5e-2, err_msg=name)


def test_xquad_cols_match_quantized_gather():
    """fp8 x-quad im2col == quantize(feats)-then-27-row-gather, bitwise."""
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.sparse_conv import (make_xpair_plan, make_xquad_plan,
                                            xquad_cols, subm_xquad_conv,
                                            subm_xpair_conv)
    rng = np.random.RandomState(7)
    B, D, H, W, Cin, Cout = 2, 6, 12, 12, 8, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 220, 256)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    qplan = make_xquad_plan(nidx, grid, table)

    fb = jnp.asarray(feats, jnp.bfloat16)
    fq = fb.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)  # value quantizer
    cols_fast = np.asarray(xquad_cols(fb, qplan), np.float32)
    fpad = jnp.concatenate([fq, jnp.zeros((1, Cin), jnp.bfloat16)], 0)
    cols_ref = np.asarray(jnp.take(fpad, nidx.reshape(-1), axis=0).reshape(
        256, 27 * Cin), np.float32)
    cols_ref_x = cols_ref.reshape(256, 9, 3, Cin).transpose(
        0, 2, 1, 3).reshape(256, 27 * Cin)
    np.testing.assert_array_equal(cols_fast, cols_ref_x)

    # gradients: STE backward == the exact pair-path backward
    pplan = make_xpair_plan(nidx, nidx[:, 14], nidx.shape[0])
    w = jnp.asarray(rng.randn(27 * Cin, Cout) * 0.1, jnp.bfloat16)

    def loss_quad(f, w_):
        return (subm_xquad_conv(f, nidx, qplan, pplan, w_, grid.mask)
                .astype(jnp.float32) ** 2).sum()

    gf, gw = jax.grad(loss_quad, argnums=(0, 1))(fb, w)
    assert np.isfinite(np.asarray(gf, np.float32)).all()
    assert np.isfinite(np.asarray(gw, np.float32)).all()


def test_xquad16_cols_match_plain_gather_bitwise():
    """bf16 x-quad im2col == the 27-narrow-row gather, BITWISE (no value
    quantization, unlike the fp8 quad), and the conv + grads match the
    pair path it shares a backward with."""
    import jax
    from unibev_tpu.ops.sparse_conv import (make_xpair_plan, make_xquad_plan,
                                            xquad16_cols, subm_xquad16_conv,
                                            subm_gather_conv)
    rng = np.random.RandomState(5)
    B, D, H, W, Cin, Cout = 2, 6, 12, 12, 8, 8
    feats, coords, mask = make_sparse(rng, B, D, H, W, Cin, 220, 256)
    grid = SparseGrid(jnp.array(coords), jnp.array(mask), (D, H, W), B)
    table = build_table(grid)
    nidx = subm_neighbor_idx(grid, table)
    pplan = make_xpair_plan(nidx, nidx[:, 14], nidx.shape[0])
    qplan = make_xquad_plan(nidx, grid, table)

    fb = jnp.asarray(feats, jnp.bfloat16)
    cols_fast = np.asarray(xquad16_cols(fb, qplan), np.float32)
    fpad = jnp.concatenate([fb, jnp.zeros((1, Cin), jnp.bfloat16)], 0)
    cols_ref = np.asarray(jnp.take(fpad, nidx.reshape(-1), axis=0).reshape(
        256, 27 * Cin), np.float32)
    # xquad16_cols block order: [per plane (tl, tr)] ++ [per plane (tm, 0)]
    t = cols_ref.reshape(256, 9, 3, Cin)
    blk_a = t[:, :, (0, 2), :].reshape(256, 18 * Cin)
    blk_b = np.concatenate(
        [t[:, :, 1:2, :], np.zeros((256, 9, 1, Cin), np.float32)],
        axis=2).reshape(256, 18 * Cin)
    cols_ref_q = np.concatenate([blk_a, blk_b], axis=-1)
    np.testing.assert_array_equal(cols_fast, cols_ref_q)

    w = jnp.asarray(rng.randn(27 * Cin, Cout) * 0.1, jnp.bfloat16)
    out_fast = np.asarray(
        subm_xquad16_conv(fb, nidx, qplan, pplan, w, grid.mask), np.float32)
    out_ref = np.asarray(subm_gather_conv(fb, nidx, w, grid.mask), np.float32)
    np.testing.assert_allclose(out_fast, out_ref, atol=1e-2, rtol=1e-2)

    def loss_fast(f, w_):
        return (subm_xquad16_conv(f, nidx, qplan, pplan, w_,
                                  grid.mask) ** 2).sum()

    def loss_ref(f, w_):
        return (subm_gather_conv(f, nidx, w_, grid.mask) ** 2).sum()

    gf = jax.grad(loss_fast, argnums=(0, 1))(fb, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(fb, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)
