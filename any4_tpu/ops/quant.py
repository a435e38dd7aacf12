"""Group quantization math (pure jnp, CPU-testable reference semantics).

Re-derives the reference's canonical quantizers as functional JAX ops:

- :func:`group_quantize` / :func:`group_dequantize` match the semantics of the
  reference's ``group_quantize_tensor`` (tinygemm_lib/utils.py:27-67) and
  ``group_q``/``degroup_q`` (quantize.py:106-174): per-group asymmetric min/max
  scaling with ``scales = (max - min).clip(1e-6) / (2^n - 1)`` and
  ``zeros = min + scales * 2^(n-1)``; reconstruction is
  ``(code - 2^(n-1)) * scale + zero``.
- :func:`lut_quantize` / :func:`lut_dequantize` implement fixed-codebook
  (nf4/fp4) absmax-scaled group quantization, the bitsandbytes path the
  reference delegates to (quantize.py:907-937).
- :func:`mx4_quantize` / :func:`mx4_dequantize` implement MX4: fp4_e2m1
  element codes with a shared per-group e8m0 exponent (reference:
  tinygemm_lib/utils.py:85-232).

Arrays are weight matrices of shape ``[n, k]`` quantized along ``k`` (the
reduction dimension), matching the reference. Scales/zeros are returned in the
natural ``[n, k/g]`` layout; :func:`pack_scales_and_zeros` converts to the
reference's ``[k/g, n, 2]`` API layout for parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .formats import E8M0_BIAS, FP4_E2M1_MAX, FP4_E2M1_EMAX, FP4_E2M1_TABLE, get_table

SCALE_EPS = 1e-6  # reference clamps (max-min) to 1e-6 (utils.py:40)


def _group_view(w: jax.Array, group_size: int) -> jax.Array:
    n, k = w.shape
    if group_size <= 0:
        group_size = k
    assert k % group_size == 0, f"k={k} not divisible by group_size={group_size}"
    return w.reshape(n, k // group_size, group_size)


def group_quantize(w: jax.Array, n_bit: int = 4, group_size: int = 128,
                   symmetric: bool = False, int_zeros: bool = False):
    """Per-group uniform quantization, asymmetric by default.

    Returns ``(codes, scales, zeros)`` with ``codes`` uint8 in ``[0, 2^n-1]``
    of shape ``[n, k]`` and ``scales``/``zeros`` float32 ``[n, k/g]``.
    Reconstruction: ``(codes - 2^(n-1)) * scales + zeros``.

    ``symmetric=True`` is the reference's ``scale_only``/``assymetric=False``
    branch (quantize.py:133-141): ``scales = absmax / (2^(n-1)-1)``,
    ``zeros = 0`` (wastes the code ``0`` slot, same as the reference).

    ``int_zeros=True`` is the reference's ``new_grouping`` / ``group_q1``
    variant (quantize.py:267-314): the zero-point is a *rounded integer*
    ``zq = clip(round(-min/scale), 0, 2^n-1)`` and elements quantize as
    ``clip(round(w/scale) + zq)`` with reconstruction ``(code - zq) * scale``
    -- returned here folded into the standard convention as
    ``zeros = (2^(n-1) - zq) * scale`` so the same kernels/dequantizers
    apply unchanged.
    """
    wg = _group_view(w.astype(jnp.float32), group_size)
    half = 2 ** (n_bit - 1)
    if symmetric:
        absmax = jnp.abs(wg).max(axis=-1, keepdims=True)
        scales = jnp.maximum(absmax, SCALE_EPS) / (half - 1)
        zeros = jnp.zeros_like(scales)
        codes = jnp.clip(jnp.round(wg / scales) + half, 0, 2 ** n_bit - 1)
    elif int_zeros:
        max_val = wg.max(axis=-1, keepdims=True)
        min_val = wg.min(axis=-1, keepdims=True)
        max_int = 2**n_bit - 1
        scales = jnp.maximum(max_val - min_val, SCALE_EPS) / max_int
        zq = jnp.clip(jnp.round(-min_val / scales), 0, max_int)
        codes = jnp.clip(jnp.round(wg / scales) + zq, 0, max_int)
        zeros = (half - zq) * scales
    else:
        max_val = wg.max(axis=-1, keepdims=True)
        min_val = wg.min(axis=-1, keepdims=True)
        max_int = 2**n_bit - 1
        scales = jnp.maximum(max_val - min_val, SCALE_EPS) / max_int
        zeros = min_val + scales * half
        codes = jnp.clip(jnp.round((wg - min_val) / scales), 0, max_int)
    codes = codes.astype(jnp.uint8).reshape(w.shape)
    return codes, scales[..., 0], zeros[..., 0]


def group_dequantize(codes: jax.Array, scales: jax.Array, zeros: jax.Array,
                     n_bit: int = 4, group_size: int = 128) -> jax.Array:
    """Inverse of :func:`group_quantize` (float32 output)."""
    cg = _group_view(codes.astype(jnp.float32), group_size)
    w = (cg - 2 ** (n_bit - 1)) * scales[..., None] + zeros[..., None]
    return w.reshape(codes.shape)


def group_codes_float(w: jax.Array, n_bit: int = 4, group_size: int = 128,
                      symmetric: bool = False):
    """Un-rounded group normalization: ``(w - min) / scale`` in ``[0, 2^n-1]``.

    This is the reference's ``group_q`` output before rounding
    (quantize.py:130), the domain in which any4 k-means clusters rows.
    ``symmetric=True`` is the reference's ``scale_only`` grouping before
    anyq clustering (quantize.py:542-545 ``assymetric=not scale_only``):
    ``scales = absmax/(2^(n-1)-1)``, ``zeros = 0``, codes ``w/s + 2^(n-1)``.
    Returns ``(wg_float, scales, zeros)``.
    """
    wg = _group_view(w.astype(jnp.float32), group_size)
    half = 2 ** (n_bit - 1)
    if symmetric:
        absmax = jnp.abs(wg).max(axis=-1, keepdims=True)
        scales = jnp.maximum(absmax, SCALE_EPS) / (half - 1)
        zeros = jnp.zeros_like(scales)
        wq = wg / scales + half
    else:
        max_val = wg.max(axis=-1, keepdims=True)
        min_val = wg.min(axis=-1, keepdims=True)
        max_int = 2**n_bit - 1
        scales = jnp.maximum(max_val - min_val, SCALE_EPS) / max_int
        zeros = min_val + scales * half
        wq = (wg - min_val) / scales
    return wq.reshape(w.shape), scales[..., 0], zeros[..., 0]


def pack_scales_and_zeros(scales: jax.Array, zeros: jax.Array) -> jax.Array:
    """``[n, k/g]`` scales/zeros -> reference layout ``[k/g, n, 2]``
    (tinygemm_lib/utils.py:53-65)."""
    return jnp.stack([scales, zeros], axis=-1).transpose(1, 0, 2)


def unpack_scales_and_zeros(scales_and_zeros: jax.Array):
    """Inverse of :func:`pack_scales_and_zeros` -> ``(scales, zeros)``."""
    sz = scales_and_zeros.transpose(1, 0, 2)
    return sz[..., 0], sz[..., 1]


# ---------------------------------------------------------------------------
# Fixed-codebook (nf4 / fp4) absmax group quantization
# ---------------------------------------------------------------------------

def lut_assign(w: jax.Array, table: jax.Array) -> jax.Array:
    """Nearest-entry assignment of each element of ``w`` to a codebook value.

    Ties resolve to the lower code index. Returns uint8 codes, shape of ``w``.
    """
    d = jnp.abs(w[..., None] - table.astype(w.dtype))
    return jnp.argmin(d, axis=-1).astype(jnp.uint8)


def lut_quantize(w: jax.Array, fmt: str = "nf4", group_size: int = 128):
    """Absmax-scaled fixed-codebook quantization (bnb nf4/fp4 semantics).

    Each group is scaled by its absmax so values land in the table's [-1, 1]
    domain, then assigned to the nearest table entry.
    Returns ``(codes, scales)``; reconstruction is ``table[code] * scale``.
    """
    table = jnp.asarray(get_table(fmt))
    wg = _group_view(w.astype(jnp.float32), group_size)
    absmax = jnp.maximum(jnp.abs(wg).max(axis=-1, keepdims=True), SCALE_EPS)
    codes = lut_assign(wg / absmax, table).reshape(w.shape)
    return codes, absmax[..., 0]


def lut_dequantize(codes: jax.Array, scales: jax.Array, fmt: str = "nf4",
                   group_size: int = 128) -> jax.Array:
    table = jnp.asarray(get_table(fmt))
    cg = _group_view(table[codes.astype(jnp.int32)], group_size)
    return (cg * scales[..., None]).reshape(codes.shape)


def anyq_dequantize(codes: jax.Array, lut: jax.Array, scales: jax.Array,
                    zeros: jax.Array, n_bit: int = 4,
                    group_size: int = 128, centered: bool = False) -> jax.Array:
    """any4 dequantization: per-row LUT gather + group de-normalization.

    ``lut`` is ``[n, 16]`` (per-row) or ``[16]`` (global). When
    ``centered=False`` the LUT holds values in the group-normalized domain
    ``[0, 15]`` and reconstruction subtracts ``2^(n-1)`` (reference
    ``anyq_dequantize_tensor`` with ``centering=True``, quantize.py:612-637);
    when ``centered=True`` the LUT is pre-centered (module storage convention,
    ``lut - 8``, quantize.py:893) and no subtraction happens.
    """
    idx = codes.astype(jnp.int32)
    if lut.ndim == 2:
        vals = jnp.take_along_axis(lut.astype(jnp.float32), idx, axis=1)
    else:
        vals = lut.astype(jnp.float32)[idx]
    if not centered:
        vals = vals - 2 ** (n_bit - 1)
    vg = _group_view(vals, group_size)
    w = vg * scales[..., None] + zeros[..., None]
    return w.reshape(codes.shape)


# ---------------------------------------------------------------------------
# MX4: fp4_e2m1 elements with shared e8m0 group exponent
# ---------------------------------------------------------------------------

E8M0_NAN = 255  # e8m0 0xFF encodes NaN (MX spec; reference stores it for
                # overflow/NaN groups and the kernel must propagate it --
                # tinygemm_lib/utils.py:108-110, test_tinygemm_mx4.py:450)


def mx4_quantize(w: jax.Array, group_size: int = 32):
    """MX4 quantization (reference tinygemm_lib/utils.py:85-191).

    The shared exponent per group is ``floor(log2(max |x|)) - emax`` (emax=2
    for e2m1), clamped below to the e8m0 range; elements are divided by
    ``2^e`` and rounded to the nearest fp4_e2m1 value (sign preserved,
    saturating at +-6.0). A group whose shared exponent overflows e8m0, or
    that contains NaN, stores the e8m0 NaN byte 0xFF so dequantization (and
    the fused kernel) yields NaN. Returns
    ``(codes uint8 [n,k], exponents uint8 [n, k/g])`` with the exponent
    stored biased by 127.
    """
    wg = _group_view(w.astype(jnp.float32), group_size)
    absmax = jnp.abs(wg).max(axis=-1, keepdims=True)
    has_nan = jnp.isnan(wg).any(axis=-1, keepdims=True)
    # floor(log2(absmax)); guard absmax==0 -> exponent -emax_scale
    scale_emax = 2 ** (8 - 1) - 1  # 127
    e = jnp.floor(jnp.log2(jnp.where(absmax > 0, absmax, 1.0)))
    # flush groups whose shared exponent would be subnormal in fp32
    flush = e <= -E8M0_BIAS
    wg = jnp.where(flush, 0.0, wg)
    e = e - FP4_E2M1_EMAX
    overflow = e > scale_emax  # -> e8m0 NaN, like the reference's
    e = jnp.clip(e, -scale_emax, scale_emax)
    y = wg / jnp.exp2(e)
    y = jnp.clip(y, -FP4_E2M1_MAX, FP4_E2M1_MAX)
    # nearest fp4_e2m1 magnitude, sign-magnitude code: code = sign<<3 | mag
    mags = jnp.asarray(FP4_E2M1_TABLE[:8])
    mag = jnp.argmin(jnp.abs(jnp.abs(y)[..., None] - mags), axis=-1)
    sign = (jnp.signbit(y)).astype(jnp.int32)
    codes = (sign << 3) | mag
    codes = jnp.where(jnp.isnan(y), 0, codes)
    e_int = (e[..., 0] + E8M0_BIAS).astype(jnp.uint8)
    e_int = jnp.where((overflow | has_nan)[..., 0],
                      jnp.uint8(E8M0_NAN), e_int)
    return codes.astype(jnp.uint8).reshape(w.shape), e_int


def mx4_dequantize(codes: jax.Array, exponents: jax.Array,
                   group_size: int = 32) -> jax.Array:
    table = jnp.asarray(FP4_E2M1_TABLE)
    vals = _group_view(table[codes.astype(jnp.int32)], group_size)
    scale = mx4_scales(exponents)
    return (vals * scale[..., None]).reshape(codes.shape)


def mx4_scales(exponents: jax.Array) -> jax.Array:
    """Decode e8m0 exponents into float group scales (for the fused kernel).

    Exponent byte 0xFF decodes to NaN (MX e8m0 NaN), so a poisoned group
    propagates NaN through dequantization and the fused dot -- matching the
    reference kernel's e8m0 handling (test_tinygemm_mx4.py:450 test_nan).
    """
    e = exponents.astype(jnp.float32)
    return jnp.where(exponents == E8M0_NAN, jnp.nan, jnp.exp2(e - E8M0_BIAS))


# ---------------------------------------------------------------------------
# int8 (grouped, same scheme as int4 with n_bit=8)
# ---------------------------------------------------------------------------

def int8_quantize(w: jax.Array, group_size: int = 128,
                  symmetric: bool = False, int_zeros: bool = False):
    codes, scales, zeros = group_quantize(w, n_bit=8, group_size=group_size,
                                          symmetric=symmetric,
                                          int_zeros=int_zeros)
    # store centered codes in int8 (code - 128 in [-128, 127])
    return (codes.astype(jnp.int32) - 128).astype(jnp.int8), scales, zeros


def int8_dequantize(q: jax.Array, scales: jax.Array, zeros: jax.Array,
                    group_size: int = 128) -> jax.Array:
    qg = _group_view(q.astype(jnp.float32), group_size)
    return (qg * scales[..., None] + zeros[..., None]).reshape(q.shape)
