"""Fused dequant-GEMV kernel tests, run in Pallas interpret mode on CPU.

Mirrors the reference's kernel test strategy (tests/tinygemm/):
- ``test_identity_mul``: W = I must reproduce the input exactly
  (test_tinygemm_any4.py:117-139);
- ``test_general_k``: k sweep exercising block-remainder/padding paths
  (test_tinygemm_any4.py:141-163);
- ``test_general_mul``: random weights, checked against the pure-jnp
  dequantize reference (the "fake backend");
- any4 tests negate the LUT to prove the LUT path is actually exercised
  (test_tinygemm_any4.py:24-26).

Set ANY4_TPU_TEST_PLATFORM=tpu to run compiled on hardware.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from any4_tpu.ops import linear as lin
from any4_tpu.ops import packing, quant
from any4_tpu.ops.pallas import gemv

INTERPRET = os.environ.get("ANY4_TPU_TEST_PLATFORM", "cpu") == "cpu"
FMTS = ["int4", "any4", "nf4", "fp4", "mx4", "int8"]


def _mm(x, qt, out_dtype=jnp.float32, **kw):
    if qt.fmt in lin._GROUPED_FMTS or qt.fmt in lin._ROWSCALE_FMTS:
        # XLA-dot formats have no Pallas kernel: the production dispatch
        # IS the op under test
        return lin.linear(jnp.asarray(x), qt).astype(out_dtype)
    return gemv.quantized_matmul(
        x, qt.packed, qt.scales, qt.zeros, qt.lut,
        fmt=lin._kernel_fmt(qt.fmt, qt.lut), group_size=qt.group_size,
        n=qt.shape[0], interpret=INTERPRET, out_dtype=out_dtype, **kw)


def _ref(x, qt):
    wd = lin.dequantize_tensor(qt, dtype=jnp.float32)
    return np.asarray(x, np.float32) @ np.asarray(wd).T


def _assert_close(y, ref, tol=2e-2):
    """Error bounded relative to the output magnitude (the kernel computes
    in bf16 like the reference's tensor-core path, so per-element rtol is
    meaningless for near-zero outputs; reference tests use absolute bounds,
    e.g. test_tinygemm_any4.py avg-error 1e-1)."""
    y = np.asarray(y, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(y / scale, ref / scale, atol=tol, rtol=0)


class TestIdentityMul:
    @pytest.mark.parametrize("fmt", ["int4", "int8"])
    def test_identity(self, fmt):
        k = 1024
        w = jnp.eye(k, dtype=jnp.float32)
        # layout="row" pins the planar fused-table kernel, whose dequant
        # table rounds lut*s+z to bf16 exactly like the reference's
        # dequantize-to-bf16-then-mma, so identity is EXACT in the bf16
        # domain (reference test_identity_mul uses torch.equal). The
        # routed DEFAULT for int4 is now the pair-packed magic kernel,
        # which is near-exact (1 bf16 ulp) -- covered by
        # TestInt4Pair.test_identity_near_exact.
        qt = lin.quantize_tensor(w, fmt, group_size=128, layout="row")
        x = jax.random.normal(jax.random.PRNGKey(0), (4, k),
                              jnp.float32).astype(jnp.bfloat16)
        y = _mm(x, qt, out_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(y.astype(jnp.float32)),
            np.asarray(x.astype(jnp.float32)))

    def test_identity_any4(self):
        # any4 runs the post-dot-affine kernel (gemv._q4post_kernel): the
        # codebook is rounded to bf16 pre-dot and the group affine runs in
        # f32 post-dot, so identity holds to bf16 rounding of the affine
        # reconstruction rather than bit-exactly (the reference's
        # torch.equal claim applies to its per-element bf16(lut*s+z)
        # dequant, which is what our g<128 fused-table path still does)
        k = 1024
        w = jnp.eye(k, dtype=jnp.float32)
        qt = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=25)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, k),
                              jnp.float32).astype(jnp.bfloat16)
        y = _mm(x, qt, out_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(y.astype(jnp.float32)),
            np.asarray(x.astype(jnp.float32)), rtol=2e-2, atol=2e-2)


class TestGeneralK:
    @pytest.mark.parametrize("k", [1024, 2048, 1536, 2560])
    def test_k_sweep_int4(self, k):
        w = jax.random.normal(jax.random.PRNGKey(1), (128, k))
        # non-multiples of the 1024 pack block exercise the padding path
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, k))
        y = _mm(x, qt)
        _assert_close(y, _ref(x, qt))

    @pytest.mark.parametrize("m", [1, 3, 16, 33, 64, 130])
    def test_m_sweep(self, m):
        k, n = 1024, 256
        w = jax.random.normal(jax.random.PRNGKey(3), (n, k))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(4), (m, k))
        y = _mm(x, qt)
        assert y.shape == (m, n)
        _assert_close(y, _ref(x, qt))

    @pytest.mark.parametrize("n", [128, 384, 1000])
    def test_n_padding(self, n):
        k = 1024
        w = jax.random.normal(jax.random.PRNGKey(5), (n, k))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(6), (2, k))
        y = _mm(x, qt)
        assert y.shape == (2, n)
        _assert_close(y, _ref(x, qt))


class TestGeneralMul:
    @pytest.mark.parametrize("fmt", FMTS)
    @pytest.mark.parametrize("g", [64, 128, 256])
    def test_matches_dequant_reference(self, fmt, g):
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(7), (n, k))
        kw = dict(kmeans_iters=10) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=g, **kw)
        x = jax.random.normal(jax.random.PRNGKey(8), (4, k))
        y = _mm(x, qt)
        ref = _ref(x, qt)
        _assert_close(y, ref)

    @pytest.mark.parametrize("fmt", ["int4", "mx4"])
    @pytest.mark.parametrize("g", [32, 64])
    def test_small_groups(self, fmt, g):
        # g=32 is mx4's DEFAULT group size (quant_methods["mx4"]), so the
        # kernel must be exercised there, not only at g=64
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(9), (n, k))
        qt = lin.quantize_tensor(w, fmt, group_size=g)
        x = jax.random.normal(jax.random.PRNGKey(10), (2, k))
        y = _mm(x, qt)
        _assert_close(y, _ref(x, qt))

    @pytest.mark.parametrize("fmt", ["int4", "any4", "nf4"])
    def test_select_variant_matches_gather(self, fmt):
        # use_gather=False runs the select-16 one-hot LUT contraction
        # (measurement alternative to the production path, PERF_NOTES.md).
        # int4 still runs the fused-table gather, which computes
        # bf16(lut*s+z) per element exactly like the select variant ->
        # bit-equal; any4/nf4 run the post-dot-affine kernel
        # (_q4post_kernel), whose bf16 rounding point differs -> compare
        # at the shared kernel tolerance instead.
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(21), (n, k))
        kw = dict(kmeans_iters=6) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=128, **kw)
        x = jax.random.normal(jax.random.PRNGKey(22), (2, k))
        yg = lin.linear(x, qt, interpret=True, use_gather=True)
        ys = lin.linear(x, qt, interpret=True, use_gather=False)
        if fmt == "int4":
            np.testing.assert_array_equal(np.asarray(yg), np.asarray(ys))
        else:
            _assert_close(yg, ys, tol=5e-3)

    def test_binary_weights_exact(self):
        # W in {0,1}: int4 grouping is exact, so the kernel must match the
        # f32 matmul to float tolerance (reference test_general_mul)
        n, k = 256, 2048
        w = jax.random.bernoulli(jax.random.PRNGKey(11), 0.5,
                                 (n, k)).astype(jnp.float32)
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(12), (4, k))
        y = _mm(x, qt)
        # products with {0,1} weights are exact; compare at the kernel's
        # bf16 input rounding
        xb = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
        ref = xb @ np.asarray(w).T
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-3)


class TestAny4LutIsUsed:
    def test_negated_lut_negates_output(self):
        """Negating LUT and zeros must negate the result -- proving the LUT
        path is used, not the uniform int4 fast path (reference
        test_tinygemm_any4.py:24-26,50-52)."""
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(13), (n, k))
        qt = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=10)
        x = jax.random.normal(jax.random.PRNGKey(14), (2, k))
        y = _mm(x, qt)
        from dataclasses import replace
        qt2 = replace(qt, lut=-qt.lut, zeros=-qt.zeros)
        y2 = _mm(x, qt2)
        np.testing.assert_allclose(np.asarray(y2), -np.asarray(y),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("per_row", [False, True])
    def test_per_row_variants_fused_matches_dequant(self, per_row):
        """Fused-kernel vs dequant parity for BOTH LUT layouts -- the
        reference treats global-LUT any4 as a first-class variant
        (test_tinygemm_any4.py:194-220, per_row in {False, True};
        `Any4_Global_Grouped` dispatch, TinyGemm_int4.cu:622-746)."""
        n, k = 128, 2048
        w = jax.random.normal(jax.random.PRNGKey(40), (n, k))
        qt = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=10,
                                 per_row=per_row)
        # any4 defaults to the transposed packing at g%128==0: LUT is
        # stored [16, n] (per-row) / [16, 1] (global)
        assert qt.fmt == "any4t"
        assert qt.lut.shape == ((16, n) if per_row else (16, 1))
        x = jax.random.normal(jax.random.PRNGKey(41), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        ref = _ref(x, qt)
        assert np.isfinite(np.asarray(y, np.float32)).all()
        _assert_close(np.asarray(y, np.float32), ref)

    def test_per_row_luts_differ(self):
        # two rows with identical codes/scales but different LUTs must give
        # different outputs
        n, k, g = 128, 1024, 128
        codes = jax.random.randint(jax.random.PRNGKey(15), (n, k), 0, 16)
        packed = packing.pack_int4(codes.astype(jnp.uint8))
        scales = jnp.ones((k // g, n))   # transposed [k/g, n] layout
        zeros = jnp.zeros((k // g, n))
        lut_a = jnp.tile(jnp.linspace(-1, 1, 16)[None], (n, 1))
        lut_b = lut_a * jnp.arange(1, n + 1, dtype=jnp.float32)[:, None]
        x = jax.random.normal(jax.random.PRNGKey(16), (1, k))
        ya = gemv.quantized_matmul(x, packed, scales, zeros, lut_a,
                                   fmt="any4", group_size=g, n=n,
                                   interpret=INTERPRET,
                                   out_dtype=jnp.float32)
        yb = gemv.quantized_matmul(x, packed, scales, zeros, lut_b,
                                   fmt="any4", group_size=g, n=n,
                                   interpret=INTERPRET,
                                   out_dtype=jnp.float32)
        # bf16 rounding of LUT values inside the kernel: ~0.4% relative,
        # compared at the common (divided-out) magnitude
        _assert_close(np.asarray(yb)[0] / np.arange(1, n + 1),
                      np.asarray(ya)[0], tol=1e-2)


class TestInt4Pair:
    """Pair-packed magic-number int4 (fmt='int4p'): same numbers as int4,
    gather-free kernel (PERF_NOTES magic2 design)."""

    def test_pack_roundtrip(self):
        codes = jax.random.randint(jax.random.PRNGKey(60), (32, 1536),
                                   0, 16).astype(jnp.uint8)
        packed = packing.pack_int4_pair(codes)
        assert packed.shape == (16, 2048 // 4)
        out = packing.unpack_int4_pair(packed, 1536)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_pack_roundtrip_sharded(self):
        codes = jax.random.randint(jax.random.PRNGKey(61), (8, 1024),
                                   0, 16).astype(jnp.uint8)
        packed = packing.pack_int4_pair(codes, shards=2)
        out = packing.unpack_int4_pair(packed, 1024, shards=2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_dequant_matches_int4(self):
        w = jax.random.normal(jax.random.PRNGKey(62), (64, 2048))
        qa = lin.quantize_tensor(w, "int4", group_size=128)
        qb = lin.quantize_tensor(w, "int4p", group_size=128)
        np.testing.assert_array_equal(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qb, dtype=jnp.float32)))

    @pytest.mark.parametrize("g", [128, 256])
    def test_fused_matches_dequant(self, g):
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(63), (n, k))
        qt = lin.quantize_tensor(w, "int4p", group_size=g)
        x = jax.random.normal(jax.random.PRNGKey(64), (2, k))
        y = _mm(x, qt)
        _assert_close(y, _ref(x, qt))

    def test_identity_near_exact(self):
        """int4p applies scales to f32 partial dots AFTER the MXU, so the
        128*sum(x)*s term cancels in f32 with ~1e-5 relative residue --
        identity is exact to 1 bf16 ulp, not bit-exact like the
        fused-table kernel (whose dequant rounds to bf16 pre-dot). This is
        the documented accuracy/speed trade of the pair-packed path."""
        k = 1024
        w = jnp.eye(k, dtype=jnp.float32)
        qt = lin.quantize_tensor(w, "int4p", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(65), (4, k),
                              jnp.float32).astype(jnp.bfloat16)
        y = _mm(x, qt, out_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(y.astype(jnp.float32)),
            np.asarray(x.astype(jnp.float32)), rtol=4e-3, atol=1e-5)

    def test_n_k_padding(self):
        n, k = 130, 1408
        w = jax.random.normal(jax.random.PRNGKey(66), (n, k))
        qt = lin.quantize_tensor(w, "int4p", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(67), (1, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        assert y.shape == (1, n)
        _assert_close(np.asarray(y, np.float32), _ref(x, qt)[:, :n])


class TestInt8Pair:
    """Split-byte magic-number int8 (fmt='int8p'): same numbers as int8,
    two nibble planes with scales (s, 16s) on the pair-packed kernel."""

    def test_dequant_matches_int8(self):
        w = jax.random.normal(jax.random.PRNGKey(70), (32, 1024))
        qa = lin.quantize_tensor(w, "int8", group_size=128)
        qb = lin.quantize_tensor(w, "int8p", group_size=128)
        np.testing.assert_allclose(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qb, dtype=jnp.float32)),
            rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("g", [128, 256])
    def test_fused_matches_dequant(self, g):
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(71), (n, k))
        qt = lin.quantize_tensor(w, "int8p", group_size=g)
        x = jax.random.normal(jax.random.PRNGKey(72), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        wd = lin.dequantize_tensor(qt, dtype=jnp.float32)
        ref = np.asarray(x, np.float32) @ np.asarray(wd).T
        _assert_close(np.asarray(y, np.float32), ref, tol=5e-3)

    def test_same_bytes_as_int8(self):
        w = jax.random.normal(jax.random.PRNGKey(73), (64, 2048))
        qa = lin.quantize_tensor(w, "int8", group_size=128, layout="row")
        qb = lin.quantize_tensor(w, "int8p", group_size=128)
        assert qb.packed.size * 4 == qa.packed.size  # int32 words vs int8


class TestW4A8:
    """Quad-packed int4 weights x int8 activations on the int8 MXU
    (fmt='w4a8'): same weight numbers as int4; activations per-row
    absmax-int8. No reference analog (tinygemm is weight-only); the
    integer dot inside the kernel is exact, so the kernel must match a
    float64 emulation of the same integer math to f32-accumulation
    tolerance."""

    def test_pack_roundtrip(self):
        codes = jax.random.randint(jax.random.PRNGKey(80), (32, 1536),
                                   0, 16).astype(jnp.uint8)
        packed = packing.pack_int4_quad(codes)
        assert packed.shape == (8, 2048 // 2)
        out = packing.unpack_int4_quad(packed, 1536)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_pack_roundtrip_sharded(self):
        codes = jax.random.randint(jax.random.PRNGKey(81), (8, 1024),
                                   0, 16).astype(jnp.uint8)
        packed = packing.pack_int4_quad(codes, shards=2)
        out = packing.unpack_int4_quad(packed, 1024, shards=2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_dequant_matches_int4(self):
        w = jax.random.normal(jax.random.PRNGKey(82), (64, 2048))
        qa = lin.quantize_tensor(w, "int4", group_size=128)
        qb = lin.quantize_tensor(w, "w4a8", group_size=128)
        np.testing.assert_array_equal(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qb, dtype=jnp.float32)))

    @pytest.mark.parametrize("g", [128, 256])
    def test_fused_matches_integer_emulation(self, g):
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(83), (n, k))
        qt = lin.quantize_tensor(w, "w4a8", group_size=g)
        x = jax.random.normal(jax.random.PRNGKey(84), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        # float64 emulation of the kernel's exact integer dot + per-group
        # f32 affine: y = sx * sum_g [P_g s_g + sum(xq_g) (z_g - 8 s_g)]
        xq, sx = lin.quantize_activations(x)
        xq = np.asarray(xq, np.int64)
        codes = np.asarray(packing.unpack_int4_quad(qt.packed, k),
                           np.int64)
        # stored scales are [kp/g, n]; expand to 128-granularity rows
        # like the kernel does (_expand_plane_scales)
        s = np.repeat(np.asarray(qt.scales, np.float64).T, g // 128,
                      axis=1)[:, :k // 128]                    # [n, k/128]
        z = np.repeat(np.asarray(qt.zeros, np.float64).T, g // 128,
                      axis=1)[:, :k // 128]
        ref = np.zeros((2, n))
        for gi in range(k // 128):
            sl = slice(gi * 128, (gi + 1) * 128)
            P = xq[:, sl] @ codes[:, sl].T
            xs = xq[:, sl].sum(axis=1, keepdims=True)
            ref += P * s[None, :, gi] + xs * (z - 8.0 * s)[None, :, gi]
        ref = ref * np.asarray(sx, np.float64)
        _assert_close(np.asarray(y, np.float32), ref, tol=1e-4)

    def test_linear_matches_fakequant(self):
        # end-to-end tolerance vs dequantized weights + fake-quantized
        # activations (the semantics the format promises)
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(85), (n, k))
        qt = lin.quantize_tensor(w, "w4a8", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(86), (3, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        xq, sx = lin.quantize_activations(x)
        xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
        wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
        _assert_close(np.asarray(y, np.float32), xd @ wd.T, tol=1e-3)

    def test_prefill_chunked_matches_fakequant(self):
        # prefill (m > _INT8_M_TILE) runs the SAME fused int8 kernel
        # chunked over m -- no dequant fallback -- so it must match the
        # fake-quant reference at every chunk boundary
        n, k, m = 128, 1024, lin._INT8_M_TILE + 40
        w = jax.random.normal(jax.random.PRNGKey(87), (n, k))
        qt = lin.quantize_tensor(w, "w4a8", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(88), (m, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        xq, sx = lin.quantize_activations(x)
        xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
        wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
        _assert_close(np.asarray(y, np.float32), xd @ wd.T, tol=1e-3)

    def test_prefill_3d_batch_shape(self):
        # lead dims flatten and restore around the chunked kernel path
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(96), (n, k))
        qt = lin.quantize_tensor(w, "w4a8", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(97), (2, 160, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        assert y.shape == (2, 160, n)
        xq, sx = lin.quantize_activations(x)
        xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
        wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
        _assert_close(np.asarray(y, np.float32),
                      np.einsum("btk,nk->btn", xd, wd), tol=1e-3)

    def test_row_sharded(self):
        n, k = 64, 2048
        w = jax.random.normal(jax.random.PRNGKey(89), (n, k))
        qt = lin.quantize_tensor(w, "w4a8", group_size=128, row_shards=2)
        x = jax.random.normal(jax.random.PRNGKey(90), (1, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        q0 = lin.quantize_tensor(w, "w4a8", group_size=128)
        y0 = lin.linear(x, q0, interpret=INTERPRET)
        _assert_close(np.asarray(y, np.float32),
                      np.asarray(y0, np.float32), tol=1e-3)

    @pytest.mark.parametrize("fmt", ["w4a8", "w8a8"])
    def test_fused_act_quant_matches_external(self, fmt):
        # decode-shaped m fuses the per-row absmax int8 quantize and the
        # y*sx post-scale into the kernel (gemv._w4a8f_kernel); the math
        # (full-row absmax, f32 round/clip, f32 scale point) is identical
        # to the external quantize_activations path, so outputs must agree
        # to f32 accumulation-order tolerance at every k-chunk count
        from any4_tpu.ops.pallas import gemv
        n, k = 128, 4096
        w = jax.random.normal(jax.random.PRNGKey(98), (n, k))
        # pin the PALLAS kernel layout (w8a8 default-routes to the
        # grouped XLA path, which has no fused-act kernel variant)
        qt = lin.quantize_tensor(w, "w8a8q" if fmt == "w8a8" else fmt,
                                 group_size=128)
        fmt = qt.fmt
        for m in (1, 16, gemv.FUSED_ACT_M_MAX):
            x = jax.random.normal(jax.random.PRNGKey(99 + m), (m, k))
            y_fused = gemv.quantized_matmul(
                x, qt.packed, qt.scales, qt.zeros, None, fmt=fmt,
                group_size=128, n=n, out_dtype=jnp.float32,
                interpret=INTERPRET)
            xq, sx = lin.quantize_activations(x)
            y_ext = gemv.quantized_matmul(
                xq, qt.packed, qt.scales, qt.zeros, None, fmt=fmt,
                group_size=128, n=n, out_dtype=jnp.float32,
                interpret=INTERPRET) * sx
            _assert_close(np.asarray(y_fused), np.asarray(y_ext), tol=1e-5)


class TestW8A8:
    """int8 weights x int8 activations (fmt='w8a8'): the packed array IS
    the centered int8 code matrix; one int8 MXU dot per 128-group."""

    def test_dequant_matches_int8(self):
        w = jax.random.normal(jax.random.PRNGKey(91), (32, 1024))
        qa = lin.quantize_tensor(w, "int8", group_size=128)
        qb = lin.quantize_tensor(w, "w8a8", group_size=128)
        np.testing.assert_array_equal(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qb, dtype=jnp.float32)))

    @pytest.mark.parametrize("g", [128, 256])
    def test_linear_matches_fakequant(self, g):
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(92), (n, k))
        qt = lin.quantize_tensor(w, "w8a8", group_size=g)
        x = jax.random.normal(jax.random.PRNGKey(93), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        xq, sx = lin.quantize_activations(x)
        xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
        wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
        _assert_close(np.asarray(y, np.float32), xd @ wd.T, tol=1e-3)

    def test_n_k_padding(self):
        n, k = 130, 1408
        w = jax.random.normal(jax.random.PRNGKey(94), (n, k))
        qt = lin.quantize_tensor(w, "w8a8", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(95), (1, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        assert y.shape == (1, n)
        xq, sx = lin.quantize_activations(x)
        xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
        wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
        _assert_close(np.asarray(y, np.float32), xd @ wd.T, tol=1e-3)


class TestMx4Nan:
    """MX4 e8m0 NaN semantics (reference test_tinygemm_mx4.py:450
    test_nan + quantize_mx4 NaN exponent storage, utils.py:137-191)."""

    def test_nan_input_poisons_group(self):
        from any4_tpu.ops import quant
        w = np.zeros((8, 64), np.float32)
        w[0, 3] = np.nan
        codes, exps = quant.mx4_quantize(jnp.asarray(w), 32)
        exps = np.asarray(exps)
        assert exps[0, 0] == 255           # e8m0 NaN byte
        assert (exps[1:] != 255).all()
        deq = np.asarray(quant.mx4_dequantize(codes, jnp.asarray(exps), 32))
        assert np.isnan(deq[0, :32]).all()  # whole group poisoned
        assert np.isfinite(deq[1:]).all()

    def test_e8m0_nan_byte_decodes_nan(self):
        from any4_tpu.ops import quant
        s = np.asarray(quant.mx4_scales(jnp.asarray([[255]], jnp.uint8)))
        assert np.isnan(s).all()
        s254 = np.asarray(quant.mx4_scales(jnp.asarray([[254]], jnp.uint8)))
        assert np.isfinite(s254).all()      # right below NaN stays finite

    def test_kernel_propagates_nan_scale(self):
        """Poison one group's e8m0 exponent post-quantization (the
        reference pokes w_e[0][0]=255) -- the fused kernel output must go
        NaN, and stay finite at 254."""
        from dataclasses import replace
        from any4_tpu.ops import quant
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(50), (n, k))
        qt = lin.quantize_tensor(w, "mx4", group_size=32)
        x = jnp.ones((1, k), jnp.float32)
        y0 = np.asarray(_mm(x, qt), np.float32)
        assert np.isfinite(y0).all()
        poisoned = replace(qt, scales=qt.scales.at[0, 0].set(jnp.nan))
        y1 = np.asarray(_mm(x, poisoned), np.float32)
        assert np.isnan(y1[0, 0])
        assert np.isfinite(y1[0, 1:]).all()


class TestLinearDispatch:
    def test_linear_fused_vs_dequant_consistent(self):
        n, k = 256, 1024
        w = jax.random.normal(jax.random.PRNGKey(17), (n, k))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(18), (2, k))
        y_fused = lin.linear(x, qt, interpret=INTERPRET)
        y_deq = lin.linear(x, qt, fused_m_max=0)
        _assert_close(np.asarray(y_fused, np.float32),
                      np.asarray(y_deq, np.float32))

    def test_bias_and_batch_dims(self):
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(19), (n, k))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        bias = jax.random.normal(jax.random.PRNGKey(20), (n,))
        x = jax.random.normal(jax.random.PRNGKey(21), (2, 3, k))
        y = lin.linear(x, qt, bias=bias, interpret=INTERPRET)
        assert y.shape == (2, 3, n)
        ref = _ref(x.reshape(-1, k), qt).reshape(2, 3, n) + np.asarray(bias)
        _assert_close(np.asarray(y, np.float32), ref)

    def test_dense_weight_passthrough(self):
        w = jax.random.normal(jax.random.PRNGKey(22), (64, 128))
        x = jax.random.normal(jax.random.PRNGKey(23), (2, 128))
        y = lin.linear(x, w)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(x) @ np.asarray(w).T,
                                   rtol=1e-4, atol=1e-5)


class TestQuantizedTensor:
    def test_pytree_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(24), (64, 1024))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        leaves, treedef = jax.tree_util.tree_flatten(qt)
        qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
        # int4 routes to the pair-packed default (TestDefaultRouting)
        assert qt2.fmt == "int4p" and qt2.shape == (64, 1024)
        np.testing.assert_array_equal(np.asarray(qt2.packed),
                                      np.asarray(qt.packed))

    @pytest.mark.parametrize("fmt", FMTS)
    def test_compression_ratio(self, fmt):
        n, k = 256, 4096
        w = jax.random.normal(jax.random.PRNGKey(25), (n, k))
        kw = dict(kmeans_iters=2) if fmt == "any4" else {}
        g = 32 if fmt == "mx4" else 128
        qt = lin.quantize_tensor(w, fmt, group_size=g, **kw)
        dense_bytes = n * k * 2
        assert qt.nbytes < dense_bytes * (0.45 if "8" not in fmt else 0.85)

    def test_dequantize_matches_pure_math(self):
        w = jax.random.normal(jax.random.PRNGKey(26), (64, 2048))
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        codes, scales, zeros = quant.group_quantize(w, 4, 128)
        expect = quant.group_dequantize(codes, scales, zeros, 4, 128)
        got = lin.dequantize_tensor(qt, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)


class TestTransposedLUT:
    """Transposed-layout LUT kernels (fmt='any4t'/'lut4t'): codes packed
    k-on-sublanes (packing.pack_int4_transposed) so the 16-entry codebook
    gathers along the sublane dimension (tpu.dynamic_gather dim 0) instead
    of the lane gather of the row-major kernels. Numerics must match the
    row-major q4post path (same bf16 codebook rounding, f32 post-dot
    affine)."""

    def _transposed_inputs(self, qt):
        codes = packing.unpack_int4(qt.packed, qt.shape[1])
        pt = packing.pack_int4_transposed(codes)
        lut_t = (qt.lut.T if qt.lut.shape[0] == qt.shape[0]
                 else qt.lut.reshape(1, 16).T)
        return pt, lut_t

    def test_pack_transposed_roundtrip(self):
        codes = jax.random.randint(jax.random.PRNGKey(90), (32, 1536),
                                   0, 16, dtype=jnp.int32).astype(jnp.uint8)
        pt = packing.pack_int4_transposed(codes)
        assert pt.shape == (packing.padded_k(1536) // 8, 32)
        back = packing.unpack_int4_transposed(pt, 1536)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    def test_pack_transposed_roundtrip_sharded(self):
        codes = jax.random.randint(jax.random.PRNGKey(91), (16, 2048),
                                   0, 16, dtype=jnp.int32).astype(jnp.uint8)
        pt = packing.pack_int4_transposed(codes, shards=2)
        back = packing.unpack_int4_transposed(pt, 2048, shards=2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    @pytest.mark.parametrize("m", [1, 4])
    def test_any4t_matches_any4(self, m):
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(92), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=4,
                                 layout="row")
        x = jax.random.normal(jax.random.PRNGKey(93), (m, k))
        y_ref = _mm(x, qt)
        pt, lut_t = self._transposed_inputs(qt)
        y_t = gemv.quantized_matmul(
            x, pt, qt.scales, qt.zeros, lut_t, fmt="any4t",
            group_size=128, n=n, interpret=INTERPRET,
            out_dtype=jnp.float32)
        _assert_close(y_t, np.asarray(y_ref), tol=5e-3)

    @pytest.mark.parametrize("fmt", ["nf4", "fp4"])
    def test_lut4t_matches_lut4(self, fmt):
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(94), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, fmt, group_size=128, layout="row")
        x = jax.random.normal(jax.random.PRNGKey(95), (1, k))
        y_ref = _mm(x, qt)
        pt, lut_t = self._transposed_inputs(qt)
        y_t = gemv.quantized_matmul(
            x, pt, qt.scales, qt.zeros, lut_t, fmt="lut4t",
            group_size=128, n=n, interpret=INTERPRET,
            out_dtype=jnp.float32)
        _assert_close(y_t, np.asarray(y_ref), tol=5e-3)

    def test_any4t_n_k_padding(self):
        # n not a lane multiple + k with a partial pack block (TP shard)
        n, k = 200, 1024
        w = jax.random.normal(jax.random.PRNGKey(96), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=4,
                                 layout="row")
        x = jax.random.normal(jax.random.PRNGKey(97), (1, k))
        pt, lut_t = self._transposed_inputs(qt)
        y_t = gemv.quantized_matmul(
            x, pt, qt.scales, qt.zeros, lut_t, fmt="any4t",
            group_size=128, n=n, interpret=INTERPRET,
            out_dtype=jnp.float32)
        ref = _ref(x, qt)
        assert y_t.shape == (1, n)
        _assert_close(y_t, ref, tol=5e-3)

    def test_quantize_tensor_any4t_matches_any4(self):
        # the production-format entry: same numbers as any4, transposed
        # packing + [16, n] LUT, dispatched through linear()
        n, k = 128, 2048
        w = jax.random.normal(jax.random.PRNGKey(98), (n, k)) * 0.05
        qa = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=4,
                                 seed=0, layout="row")
        qb = lin.quantize_tensor(w, "any4t", group_size=128, kmeans_iters=4,
                                 seed=0)
        np.testing.assert_allclose(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qb, dtype=jnp.float32)),
            rtol=1e-5, atol=1e-6)
        x = jax.random.normal(jax.random.PRNGKey(99), (1, k))
        ya = lin.linear(x, qa, interpret=INTERPRET)
        yb = lin.linear(x, qb, interpret=INTERPRET)
        _assert_close(np.asarray(yb, np.float32), np.asarray(ya, np.float32),
                      tol=5e-3)
        assert qb.lut.shape == (16, n)
        assert qb.packed.shape == (packing.padded_k(k) // 8, n)

    def test_any4t_row_shards_dequant(self):
        n, k = 64, 2048
        w = jax.random.normal(jax.random.PRNGKey(100), (n, k)) * 0.05
        qa = lin.quantize_tensor(w, "any4t", group_size=128, kmeans_iters=4,
                                 seed=0)
        qs = lin.quantize_tensor(w, "any4t", group_size=128, kmeans_iters=4,
                                 seed=0, row_shards=2)
        np.testing.assert_allclose(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qs, dtype=jnp.float32)),
            rtol=1e-5, atol=1e-6)


class TestTransposedInt8:
    """Transposed int8 kernels (fmt='w8a8t'/'int8t', the production int8
    defaults; packing.pack_int8_transposed): codes [kp, n] dot in the
    MXU's natural orientation -- the row-major int8 dot implied an int8
    operand transpose measured at 62 vs ~37 us/layer structural floor
    (benchmarks/lab_any4_r3.json a8_floor; VERDICT r3 weak #3)."""

    def test_pack_int8_transposed_roundtrip(self):
        q = jax.random.randint(jax.random.PRNGKey(50), (32, 1536),
                               -128, 128, dtype=jnp.int32).astype(jnp.int8)
        pt = packing.pack_int8_transposed(q)
        assert pt.shape == (packing.padded_k(1536), 32)
        back = packing.unpack_int8_transposed(pt, 1536)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
        ps = packing.pack_int8_transposed(q[:, :1024].reshape(32, 1024), 2)
        back2 = packing.unpack_int8_transposed(ps, 1024, 2)
        np.testing.assert_array_equal(np.asarray(back2),
                                      np.asarray(q[:, :1024]))

    def test_int8_routing_is_k_dependent(self):
        # round 5: int8-weight formats route by k -- small blocks sit at
        # their HBM floor on the quad Pallas kernel, large blocks escape
        # the Mosaic staging wall on the grouped XLA dot (PERF_NOTES
        # round 5). All layouts reconstruct identically.
        w = jax.random.normal(jax.random.PRNGKey(51), (64, 1024))
        wl = jax.random.normal(jax.random.PRNGKey(52), (64, 4096)) * 0.1
        for fmt in ("int8", "w8a8"):
            qt = lin.quantize_tensor(w, fmt, group_size=128)
            assert qt.fmt == fmt + "q" and qt.packed.dtype == jnp.int32
            qg = lin.quantize_tensor(wl, fmt, group_size=128)
            assert qg.fmt == fmt + "g" \
                and qg.packed.shape == (32, 64, 128) \
                and qg.packed.dtype == jnp.int8
            qr = lin.quantize_tensor(w, fmt, group_size=128, layout="row")
            assert qr.fmt == fmt
            # same numbers in every layout
            np.testing.assert_allclose(
                np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32)),
                np.asarray(lin.dequantize_tensor(qr, dtype=jnp.float32)),
                rtol=0, atol=0)
            qgq = lin.quantize_tensor(wl, fmt + "q", group_size=128)
            np.testing.assert_allclose(
                np.asarray(lin.dequantize_tensor(qg, dtype=jnp.float32)),
                np.asarray(lin.dequantize_tensor(qgq, dtype=jnp.float32)),
                rtol=0, atol=0)
        # odd n cannot quad-pack: grouped at any k
        w3 = jax.random.normal(jax.random.PRNGKey(53), (63, 1024))
        assert lin.quantize_tensor(w3, "int8", group_size=128).fmt \
            == "int8g"
        # g < 128 keeps the row-major fused-table path
        q32 = lin.quantize_tensor(w, "int8", group_size=64)
        assert q32.fmt == "int8"

    @pytest.mark.parametrize("fmt", ["int8t", "w8a8t"])
    def test_transposed_variants_match_dequant(self, fmt):
        # kept addressable for measurement (lab_int8_r4); not the default
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(58), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, fmt, group_size=128)
        assert qt.fmt == fmt and qt.packed.shape == (1024, n)
        x = jax.random.normal(jax.random.PRNGKey(59), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        _assert_close(y, _ref(x, qt), tol=2e-2)

    @pytest.mark.parametrize("fmt", ["int8", "w8a8"])
    @pytest.mark.parametrize("m", [1, 4, 80, 200])
    def test_matches_dequant_reference(self, fmt, m):
        # k=2048 routes to the quad Pallas kernel (k-dependent routing)
        n, k = 256, 2048
        w = jax.random.normal(jax.random.PRNGKey(52), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, fmt, group_size=128)
        assert qt.fmt.endswith("q")
        x = jax.random.normal(jax.random.PRNGKey(53), (m, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        ref = _ref(x, qt)
        # w8a8 adds per-row int8 activation quantization (~1/127 rel)
        _assert_close(y, ref, tol=2e-2 if fmt == "w8a8" else 5e-3)

    @pytest.mark.parametrize("fmt", ["int8", "w8a8"])
    @pytest.mark.parametrize("m", [1, 80, 200])
    def test_grouped_matches_dequant_reference(self, fmt, m):
        # k=4096 routes to the grouped XLA path; m=200 >
        # _XLA_GROUPED_M_MAX exercises its dequantize fallback
        n, k = 64, 4096
        w = jax.random.normal(jax.random.PRNGKey(54), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, fmt, group_size=128)
        assert qt.fmt.endswith("g")
        x = jax.random.normal(jax.random.PRNGKey(55), (m, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        ref = _ref(x, qt)
        _assert_close(y, ref, tol=2e-2 if fmt == "w8a8" else 5e-3)

    def test_w8a8t_external_act_quant_matches_fused(self):
        # prefill (int8 x, external quantize) and decode (float x, fused
        # act quant) must agree: same absmax, same round, same scale point
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(54), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "w8a8q", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(55), (2, k))
        y_fused = gemv.quantized_matmul(
            x, qt.packed, qt.scales, qt.zeros, None, fmt="w8a8q",
            group_size=128, n=n, interpret=INTERPRET,
            out_dtype=jnp.float32)
        xq, sx = lin.quantize_activations(x)
        y_ext = gemv.quantized_matmul(
            xq, qt.packed, qt.scales, qt.zeros, None, fmt="w8a8q",
            group_size=128, n=n, interpret=INTERPRET,
            out_dtype=jnp.float32) * sx
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ext),
                                   rtol=1e-5, atol=1e-5)

    def test_row_shards_dequant_and_linear(self):
        n, k = 64, 2048
        w = jax.random.normal(jax.random.PRNGKey(56), (n, k)) * 0.05
        qa = lin.quantize_tensor(w, "int8", group_size=128)
        qs = lin.quantize_tensor(w, "int8", group_size=128, row_shards=2)
        np.testing.assert_allclose(
            np.asarray(lin.dequantize_tensor(qa, dtype=jnp.float32)),
            np.asarray(lin.dequantize_tensor(qs, dtype=jnp.float32)),
            rtol=1e-5, atol=1e-6)
        x = jax.random.normal(jax.random.PRNGKey(57), (1, k))
        ya = lin.linear(x, qa, interpret=INTERPRET)
        ys = lin.linear(x, qs, interpret=INTERPRET)
        _assert_close(np.asarray(ys, np.float32), np.asarray(ya, np.float32),
                      tol=5e-3)


class TestAny4Q8:
    """any4q8: the learned per-row LUT snapped to an int8 grid with codes
    MATERIALIZED int8 at pack time -- any4-class accuracy riding the
    transposed int8-MXU kernel (VERDICT r3 'any4-q8' design; 8
    bits/weight)."""

    def test_wmse_matches_any4(self):
        n, k = 128, 2048
        w = jax.random.normal(jax.random.PRNGKey(60), (n, k)) * 0.05
        qa = lin.quantize_tensor(w, "any4", group_size=128,
                                 kmeans_iters=8, seed=0)
        q8 = lin.quantize_tensor(w, "any4q8", group_size=128,
                                 kmeans_iters=8, seed=0)
        w0 = np.asarray(w)
        mse_a = float(np.mean((np.asarray(
            lin.dequantize_tensor(qa, dtype=jnp.float32)) - w0) ** 2))
        mse_8 = float(np.mean((np.asarray(
            lin.dequantize_tensor(q8, dtype=jnp.float32)) - w0) ** 2))
        # int8 LUT snapping adds <= (|lut|max/254)^2 of row-scale error
        assert mse_8 <= mse_a * 1.02, (mse_8, mse_a)

    def test_linear_matches_dequant(self):
        n, k = 128, 1024
        w = jax.random.normal(jax.random.PRNGKey(61), (n, k)) * 0.05
        # k < 4096 keeps the quad Pallas kernel (k-dependent routing)
        qt = lin.quantize_tensor(w, "any4q8", group_size=128,
                                 kmeans_iters=6)
        assert qt.fmt == "any4q8" and qt.lut is None
        assert qt.packed.dtype == jnp.int32
        assert qt.packed.shape == (n // 4, k)
        x = jax.random.normal(jax.random.PRNGKey(62), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        _assert_close(y, _ref(x, qt), tol=2e-2)

    def test_grouped_at_large_k(self):
        # k >= 4096 routes to the grouped XLA layout (round 5)
        n, k = 64, 4096
        w = jax.random.normal(jax.random.PRNGKey(69), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "any4q8", group_size=128,
                                 kmeans_iters=4)
        assert qt.fmt == "any4q8g" and qt.lut is None
        assert qt.packed.dtype == jnp.int8
        assert qt.packed.shape == (k // 128, n, 128)
        x = jax.random.normal(jax.random.PRNGKey(70), (2, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        _assert_close(y, _ref(x, qt), tol=2e-2)

    def test_any4q8r_rowscale(self):
        # per-row-scale variant: plain [n, k] int8 + rank-1 affine
        n, k = 64, 1024
        w = jax.random.normal(jax.random.PRNGKey(65), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "any4q8r", kmeans_iters=8)
        assert qt.fmt == "any4q8r" and qt.packed.shape == (k, n)
        assert qt.packed.dtype == jnp.int8 and qt.scales.shape == (1, n)
        # whole-row any4 is coarser than g=128 but must stay sane: the
        # LUT-snapped reconstruction tracks the weight
        wd = np.asarray(lin.dequantize_tensor(qt, jnp.float32))
        w0 = np.asarray(w)
        assert np.mean((wd - w0) ** 2) < np.mean(w0 ** 2) * 0.05
        for m in (1, 3, 200):
            x = jax.random.normal(jax.random.PRNGKey(66), (m, k))
            y = lin.linear(x, qt)
            _assert_close(y, np.asarray(x, np.float32) @ wd.T, tol=2e-2)

    def test_w8a8r_rowscale_matches_dequant(self):
        n, k = 64, 1024
        w = jax.random.normal(jax.random.PRNGKey(67), (n, k)) * 0.05
        for fmt in ("w8a8r", "int8r"):
            qt = lin.quantize_tensor(w, fmt)
            assert qt.packed.shape == (k, n) and qt.scales.shape == (1, n)
            wd = np.asarray(lin.dequantize_tensor(qt, jnp.float32))
            x = jax.random.normal(jax.random.PRNGKey(68), (2, k))
            y = lin.linear(x, qt)
            _assert_close(y, np.asarray(x, np.float32) @ wd.T, tol=2e-2)

    def test_global_lut_variant(self):
        n, k = 64, 1024
        w = jax.random.normal(jax.random.PRNGKey(63), (n, k)) * 0.05
        qt = lin.quantize_tensor(w, "any4q8", group_size=128,
                                 kmeans_iters=6, per_row=False)
        x = jax.random.normal(jax.random.PRNGKey(64), (1, k))
        y = lin.linear(x, qt, interpret=INTERPRET)
        _assert_close(y, _ref(x, qt), tol=2e-2)


class TestDefaultRouting:
    """Round-5 format routing (VERDICT r4 #8): uniform int4 defaults to
    the pair-packed magic-number layout wherever it applies, exactly as
    any4 defaults to any4t; layout="row" (embeddings) opts out."""

    def test_int4_defaults_to_pair_packing(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 256), jnp.float32)
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        assert qt.fmt == "int4p"
        qrow = lin.quantize_tensor(w, "int4", group_size=128, layout="row")
        assert qrow.fmt == "int4"
        # identical numbers in either packing
        np.testing.assert_array_equal(
            np.asarray(lin.dequantize_tensor(qt, jnp.float32)),
            np.asarray(lin.dequantize_tensor(qrow, jnp.float32)))

    def test_int4_row_fallbacks(self):
        # odd n and sub-128 groups keep the planar packing
        w = jax.random.normal(jax.random.PRNGKey(2), (63, 256), jnp.float32)
        assert lin.quantize_tensor(w, "int4", group_size=128).fmt == "int4"
        w2 = jax.random.normal(jax.random.PRNGKey(3), (64, 256), jnp.float32)
        assert lin.quantize_tensor(w2, "int4", group_size=64).fmt == "int4"


class TestChunkedPrefill:
    """Large-m linear for the bf16-dot formats chunks through the fused
    kernel instead of dequantizing (VERDICT r4 #3: the int8 path's
    _INT8_M_TILE treatment applied to 4-bit formats, killing the
    long-prompt prefill collapse)."""

    @pytest.mark.parametrize("fmt", ["int4", "any4", "nf4"])
    def test_chunked_matches_dequant_path(self, fmt):
        k, n, m = 256, 64, 40
        w = jax.random.normal(jax.random.PRNGKey(4), (n, k), jnp.float32)
        qt = lin.quantize_tensor(w, fmt, group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(5), (m, k), jnp.float32)
        # fused_m_max=16 forces the chunk loop (3 tiles incl. a ragged
        # one); fused_m_max=0 keeps the dequantize-then-matmul reference
        # addressable
        y = lin.linear(x, qt, fused_m_max=16, interpret=INTERPRET)
        ref = lin.linear(x, qt, fused_m_max=0)
        assert y.shape == (m, n)
        _assert_close(y, ref)

    def test_chunked_3d_batch_shape(self):
        k, n = 256, 32
        w = jax.random.normal(jax.random.PRNGKey(6), (n, k), jnp.float32)
        qt = lin.quantize_tensor(w, "int4", group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 20, k), jnp.float32)
        y = lin.linear(x, qt, fused_m_max=16, interpret=INTERPRET)
        ref = lin.linear(x, qt, fused_m_max=0)
        assert y.shape == (2, 20, n)
        _assert_close(y, ref)
