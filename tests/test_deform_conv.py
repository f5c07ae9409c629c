"""DCNv2 op tests.

No torchvision in the image, so the oracle is: (a) zero offsets + unit mask
must equal a plain convolution (torch conv2d oracle), and (b) integer offsets
must equal the plain conv of a shifted input.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from unibev_tpu.ops.deform_conv import modulated_deform_conv2d


def _plain_conv_oracle(x_nhwc, w_kkcico, stride, padding):
    """torch conv2d with weight laid out (Cout, Cin, Kh, Kw) from our (K*Cin, Cout)."""
    B, H, W, Cin = x_nhwc.shape
    KKC, Cout = w_kkcico.shape
    K = KKC // Cin
    k = int(np.sqrt(K))
    w = w_kkcico.reshape(k, k, Cin, Cout).transpose(3, 2, 0, 1)  # Cout,Cin,Kh,Kw
    xt = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy())
    out = F.conv2d(xt, torch.from_numpy(w.copy()), stride=stride, padding=padding)
    return out.numpy().transpose(0, 2, 3, 1)


def test_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout = 2, 13, 17, 6, 8
    for stride, padding in [(1, 1), (2, 1)]:
        Ho = (H + 2 * padding - 3) // stride + 1
        Wo = (W + 2 * padding - 3) // stride + 1
        x = rng.randn(B, H, W, Cin).astype(np.float32)
        w = rng.randn(9 * Cin, Cout).astype(np.float32) * 0.1
        offset = np.zeros((B, Ho, Wo, 18), np.float32)
        mask = np.ones((B, Ho, Wo, 9), np.float32)
        ours = np.array(modulated_deform_conv2d(
            jnp.array(x), jnp.array(offset), jnp.array(mask), jnp.array(w),
            stride=stride, padding=padding))
        ref = _plain_conv_oracle(x, w, stride, padding)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_integer_offset_shifts_sampling():
    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout = 1, 12, 12, 4, 5
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = rng.randn(9 * Cin, Cout).astype(np.float32) * 0.1
    # shift all taps by (dy=0, dx=1) -> equals conv of x shifted left by 1
    offset = np.zeros((B, H, W, 18), np.float32)
    offset[..., 1::2] = 1.0
    mask = np.ones((B, H, W, 9), np.float32)
    ours = np.array(modulated_deform_conv2d(
        jnp.array(x), jnp.array(offset), jnp.array(mask), jnp.array(w),
        stride=1, padding=1))
    x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])], axis=2)
    ref = _plain_conv_oracle(x_shift, w, 1, 1)
    # Interior only (border differs: zero-pad vs shifted zeros interact)
    np.testing.assert_allclose(ours[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2],
                               atol=1e-4, rtol=1e-4)


def test_mask_modulates():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(27, 4).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    half = np.full((1, 8, 8, 9), 0.5, np.float32)
    ones = np.ones((1, 8, 8, 9), np.float32)
    a = np.array(modulated_deform_conv2d(jnp.array(x), jnp.array(offset),
                                         jnp.array(half), jnp.array(w)))
    b = np.array(modulated_deform_conv2d(jnp.array(x), jnp.array(offset),
                                         jnp.array(ones), jnp.array(w)))
    np.testing.assert_allclose(a, 0.5 * b, atol=1e-5)


def test_fast_bf16_path_matches_clean_and_grads():
    """The s32 pair-packed fast path must match the clean formulation in
    bf16 and carry gradients (via the clean-formulation VJP)."""
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.deform_conv import (_mdcn_clean, modulated_deform_conv2d)

    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout, K = 2, 9, 11, 8, 16, 9
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.bfloat16)
    offset = jnp.asarray(rng.randn(B, H, W, 2 * K) * 2.0, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, K), jnp.bfloat16)
    weight = jnp.asarray(rng.randn(K * Cin, Cout) * 0.1, jnp.bfloat16)

    fast = modulated_deform_conv2d(x, offset, mask, weight)
    clean = _mdcn_clean(x, offset, mask, weight, (3, 3), 1, 1, 1)
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(clean, np.float32),
                               atol=0.15, rtol=0.1)

    def loss(x, offset, mask, weight):
        return jnp.sum(modulated_deform_conv2d(x, offset, mask, weight)
                       .astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()
        assert float(jnp.max(jnp.abs(g.astype(jnp.float32)))) > 0


def test_mdcn_sorted_bwd_matches_autodiff():
    """The hand-written sorted-scatter backward must equal autodiff of the
    clean formulation for all four inputs."""
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.deform_conv import (_mdcn_clean, _mdcn_fast)

    rng = np.random.RandomState(7)
    B, H, W, Cin, Cout = 2, 6, 7, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.bfloat16)
    offset = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    weight = jnp.asarray(rng.randn(9 * Cin, Cout) * 0.1, jnp.float32)

    def f_fast(a, o, m, w):
        return (_mdcn_fast(a, o, m, w, (3, 3), 1, 1, 1).astype(
            jnp.float32) ** 2).sum()

    def f_clean(a, o, m, w):
        return (_mdcn_clean(a.astype(jnp.float32), o, m, w, (3, 3), 1, 1,
                            1) ** 2).sum()

    gf = jax.grad(f_fast, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    gc = jax.grad(f_clean, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for name, a_, b_ in zip(("d_x", "d_offset", "d_mask", "d_weight"),
                            gf, gc):
        np.testing.assert_allclose(np.asarray(a_, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-2, rtol=5e-2, err_msg=name)


def test_fp8_quad_path_matches_quantized_clean_and_grads():
    """table_dtype='fp8' == the clean formulation run on e4m3-quantized
    values (quantization is the ONLY numerics change), and gradients flow
    via the straight-through bf16 backward."""
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.deform_conv import (_mdcn_clean,
                                            modulated_deform_conv2d)

    rng = np.random.RandomState(4)
    B, H, W, Cin, Cout, K = 2, 9, 11, 8, 16, 9
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.bfloat16)
    offset = jnp.asarray(rng.randn(B, H, W, 2 * K) * 2.0, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, K), jnp.bfloat16)
    weight = jnp.asarray(rng.randn(K * Cin, Cout) * 0.1, jnp.bfloat16)

    got = modulated_deform_conv2d(x, offset, mask, weight, table_dtype="fp8")
    xq = x.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    want = _mdcn_clean(xq, offset.astype(jnp.float32),
                       mask.astype(jnp.float32),
                       weight.astype(jnp.float32), (3, 3), 1, 1, 1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.15, rtol=0.1)

    def loss(x, offset, mask, weight):
        return jnp.sum(modulated_deform_conv2d(
            x, offset, mask, weight, table_dtype="fp8")
            .astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()
        assert float(jnp.max(jnp.abs(g.astype(jnp.float32)))) > 0
