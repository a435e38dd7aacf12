"""General MX (microscaling) element quantization library.

The reference vendors Microsoft's mx library (tinygemm_lib/mx/: formats.py
:69-133 element-format parameter table, elemwise_ops.py:48-200 mantissa
rounding + element quantization, mx_ops.py:52-305 shared-exponent block
quantization). Round 2 carried only the fp4_e2m1/e8m0 subset needed for
the mx4 kernel format; this module is the full element library in JAX --
int2..int8, fp4, fp6_e2m3/e3m2, fp8_e4m3/e5m2, fp16, bf16 element formats,
floor/nearest/even rounding, denorm control, and the shared-exponent MX
block quantizer -- parity-tested against the importable reference
implementation (tests/test_reference_parity.py::TestMXParity).

Functions are pure jnp and jit-safe; `quantize_mx` is the block API the
mx4 kernel format's pipeline is a special case of.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

FP32_EXPONENT_BIAS = 127
FP32_MIN_NORMAL = 2.0 ** -126

# elem_format -> (ebits, mbits, emax, max_norm, min_norm); mbits includes
# the sign and implicit-one bits, matching the reference's convention
# (tinygemm_lib/mx/formats.py:69-133)


def _min_norm(ebits: int) -> float:
    if ebits == 0:
        return 0.0
    emin = 2 - (2 ** (ebits - 1))
    return 0.0 if ebits == 0 else 2.0 ** emin


@functools.lru_cache(maxsize=None)
def format_params(fmt: str) -> Tuple[int, int, int, float, float]:
    fmt = fmt.lower()
    table = {
        "int8": (0, 8, 0),
        "int4": (0, 4, 0),
        "int2": (0, 2, 0),
        "fp8_e5m2": (5, 4, 2 ** 4 - 1),
        "fp8_e4m3": (4, 5, 2 ** 3),
        "fp6_e3m2": (3, 4, 2 ** 2),
        "fp6_e2m3": (2, 5, 2 ** 1),
        "fp4": (2, 3, 2 ** 1),
        "fp4_e2m1": (2, 3, 2 ** 1),
        "float16": (5, 12, 2 ** 4 - 1),
        "fp16": (5, 12, 2 ** 4 - 1),
        "bfloat16": (8, 9, 2 ** 7 - 1),
        "bf16": (8, 9, 2 ** 7 - 1),
    }
    if fmt not in table:
        raise ValueError(f"unknown mx element format {fmt!r}; "
                         f"have {sorted(table)}")
    ebits, mbits, emax = table[fmt]
    if fmt == "fp8_e4m3":
        max_norm = 2.0 ** emax * 1.75      # custom: top mantissa is NaN
    else:
        max_norm = 2.0 ** emax * float(2 ** (mbits - 1) - 1) \
            / 2 ** (mbits - 2)
    return ebits, mbits, emax, max_norm, _min_norm(ebits)


def round_mantissa(a: jax.Array, bits: int, round: str = "nearest",
                   clamp: bool = False) -> jax.Array:
    """Reference `_round_mantissa` (elemwise_ops.py:48-80): round a
    pre-scaled mantissa to integer by mode floor/nearest/even."""
    if round == "floor":
        out = jnp.sign(a) * jnp.floor(jnp.abs(a))
    elif round == "nearest":
        out = jnp.sign(a) * jnp.floor(jnp.abs(a) + 0.5)
    elif round == "even":
        absa = jnp.abs(a)
        # round-half-to-even: a tie whose truncation is already even must
        # round toward zero; those are exactly the values where |a| - 0.5
        # is an even integer, so subtract the +0.5 rounding for them
        mask = ((absa - 0.5) % 2 == 0).astype(a.dtype)
        out = jnp.sign(a) * (jnp.floor(absa + 0.5) - mask)
    else:
        raise ValueError(f"unrecognized round mode {round!r}")
    if clamp:
        m = 2 ** (bits - 1) - 1
        out = jnp.clip(out, -m, m)
    return out


def quantize_elemwise(a: jax.Array, bits: int, exp_bits: int,
                      max_norm: float, round: str = "nearest",
                      saturate_normals: bool = False,
                      allow_denorm: bool = True) -> jax.Array:
    """Reference `_quantize_elemwise_core` (elemwise_ops.py:85-200):
    quantize each element to a (sign, exp_bits, bits-2 mantissa) grid.
    NaN/Inf propagate; overflow saturates (saturate_normals or int
    formats) or becomes Inf."""
    a = a.astype(jnp.float32)
    out = a
    if not allow_denorm and exp_bits > 0:
        out = jnp.where(jnp.abs(a) >= _min_norm(exp_bits), out, 0.0)
    if exp_bits != 0:
        private_exp = jnp.floor(
            jnp.log2(jnp.abs(a) + (a == 0).astype(a.dtype)))
        min_exp = -(2 ** (exp_bits - 1)) + 2
        private_exp = jnp.maximum(private_exp, min_exp)
        shift = 2.0 ** (bits - 2 - private_exp)
    else:
        shift = jnp.float32(2.0 ** (bits - 2))
    out = round_mantissa(out * shift, bits, round, clamp=False) / shift
    if saturate_normals or exp_bits == 0:
        out = jnp.clip(out, -max_norm, max_norm)
    else:
        out = jnp.where(jnp.abs(out) > max_norm,
                        jnp.sign(out) * jnp.inf, out)
    # NaN/Inf of the INPUT propagate (clip would otherwise saturate them)
    out = jnp.where(jnp.isfinite(a), out, a)
    return out


def quantize_float(a: jax.Array, fmt: str, round: str = "nearest",
                   allow_denorm: bool = True) -> jax.Array:
    """Fake-quantize to a standalone small-float format (the reference's
    `_quantize_fp` / `_quantize_bfloat`, elemwise_ops.py:231-288)."""
    ebits, mbits, _, max_norm, _ = format_params(fmt)
    return quantize_elemwise(a, mbits, ebits, max_norm, round=round,
                             saturate_normals=False,
                             allow_denorm=allow_denorm)


def shared_exponents(a: jax.Array, method: str = "max",
                     rounding_mode: str = "even",
                     axes: Optional[Sequence[int]] = None,
                     ebits: int = 0) -> jax.Array:
    """Reference `_shared_exponents` (mx_ops.py:52-105): the shared
    (block) exponent per reduction group. rounding_mode 'even' rounds the
    max-abs to the nearest power of two via f32 bit arithmetic before
    taking floor(log2) -- the hardware-faithful e8m0 conversion."""
    if method == "max":
        amax = jnp.abs(a)
        if axes is None:
            amax = jnp.max(amax)
        else:
            for ax in sorted(axes):
                amax = jnp.max(amax, axis=ax, keepdims=True)
    elif method == "none":
        amax = jnp.abs(a)
    else:
        raise ValueError(f"unrecognized shared-exp method {method!r}")
    if rounding_mode == "even":
        bits = jax.lax.bitcast_convert_type(amax.astype(jnp.float32),
                                            jnp.int32)
        # mask = sign+exponent bits 0xFF800000 (== -(1<<23) as int32)
        bits = (bits + (1 << 22)) & (-(1 << 23))
        amax = jax.lax.bitcast_convert_type(bits, jnp.float32)
        exp = jnp.floor(jnp.log2(
            amax + FP32_MIN_NORMAL * (amax == 0).astype(amax.dtype)))
    elif rounding_mode == "ceil":
        exp = jnp.ceil(jnp.log2(
            amax + FP32_MIN_NORMAL * (amax == 0).astype(amax.dtype)))
    elif rounding_mode == "floor":
        exp = jnp.floor(jnp.log2(
            amax + FP32_MIN_NORMAL * (amax == 0).astype(amax.dtype)))
    else:
        raise ValueError(f"unrecognized rounding mode {rounding_mode!r}")
    if ebits > 0:
        emax = 2 ** (ebits - 1) - 1
        exp = jnp.where(exp > emax, jnp.nan, exp)
        exp = jnp.maximum(exp, -emax)
    return exp


def quantize_mx(a: jax.Array, elem_format: str, block_size: int = 32,
                axis: int = -1, scale_bits: int = 8,
                round: str = "nearest",
                shared_exp_method: str = "max",
                block_scale_rounding_mode: str = "even",
                flush_fp32_subnorms: bool = False) -> jax.Array:
    """Fake-quantize ``a`` to an MX format: ``block_size`` elements along
    ``axis`` share one power-of-two scale (scale_bits-wide exponent, e8m0
    at the default 8) and each element is quantized to ``elem_format``.
    Mirrors the reference `_quantize_mx` (mx_ops.py:205-305) with a single
    shared axis; mx4 == (elem_format='fp4', block_size=32)."""
    if elem_format is None:
        return a
    assert scale_bits > 0
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    axis = axis + a.ndim if axis < 0 else axis
    orig = a.shape
    L = orig[axis]
    pad = (-L) % block_size
    a32 = a.astype(jnp.float32)
    if pad:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        a32 = jnp.pad(a32, widths)
    shape = list(a32.shape)
    shape[axis:axis + 1] = [shape[axis] // block_size, block_size]
    blocks = a32.reshape(shape)

    exp = shared_exponents(blocks, method=shared_exp_method,
                           rounding_mode=block_scale_rounding_mode,
                           axes=[axis + 1], ebits=0)
    if flush_fp32_subnorms:
        blocks = blocks * (exp > -FP32_EXPONENT_BIAS).astype(blocks.dtype)
    exp = exp - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    exp = jnp.where(exp > scale_emax, jnp.nan, exp)
    exp = jnp.maximum(exp, -scale_emax)

    scale = 2.0 ** exp
    q = quantize_elemwise(blocks / scale, mbits, ebits, max_norm,
                          round=round, saturate_normals=True,
                          allow_denorm=True) * scale
    q = q.reshape(a32.shape)
    if pad:
        q = jax.lax.slice_in_dim(q, 0, L, axis=axis)
    return q.astype(a.dtype) if jnp.issubdtype(a.dtype, jnp.floating) \
        else q
