"""Fused dequant + matmul Pallas kernels (the TPU-native tinygemm).

The reference's CUDA core is a single templated m16n8k16 tensor-core kernel
that streams packed 4-bit weights gmem->registers, dequantizes in-register
(LUT gather via smem/`__shfl_sync` or uniform int4 magic-number arithmetic)
and accumulates with `mma.sync` (TinyGemmImpl.cuh:23-345,
MatrixLayoutB.cuh:698-1099, Dequantization.cuh:18-260). The TPU equivalent
is one Pallas kernel family over a ``(n_blocks, k_blocks)`` grid:

- packed codes arrive in the planar layout of :mod:`any4_tpu.ops.packing`:
  a ``[block_n, 128] int32`` tile holds, in its 8 nibble planes, a full
  ``[block_n, 1024]`` k-slice of the weight matrix; unpacking is 8
  shift/mask ops with no cross-lane interleaves;
- any4's per-row 16-entry LUT is tiled 8x along lanes and gathered with the
  hardware dynamic-gather unit (``jnp.take_along_axis`` along lanes with
  same-shape f32 operands -- the only gather direction TPU supports) -- the
  TPU analog of the reference's in-register `__shfl_sync` LUT
  (Dequantization.cuh:93-131);
- the group scale/zero affine is **hoisted past the matmul**: within one
  quantization group, ``x_c @ (vals*s + z)^T == (x_c @ vals^T)*s
  + (sum_k x_c)*z`` since s, z are constant per (group, output-row). The fma
  touches the tiny ``[m, block_n]`` f32 accumulator instead of the
  ``[block_n, 128]`` weight tile, and the MXU consumes raw bf16 LUT values
  through a rhs-contracted ``dot_general`` (the standard ``x @ W^T`` form);
- scales/zeros are stored transposed ``[k/g, n]`` (the reference's
  scales_and_zeros layout, tinygemm_lib/utils.py:53-65), tiling as
  (groups-per-k-block, block_n) blocks whose lane dim matches the output;
- k-blocks accumulate into a VMEM f32 scratch (the analog of the reference's
  cross-warp smem split-k reduction, TinyGemmImpl.cuh:313-344).

Supported formats: ``int4`` (uniform, arithmetic dequant), ``any4`` (per-row
LUT), ``lut4`` (global 16-entry LUT: nf4/fp4/mx4), ``int8``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..packing import LANES, PACK_BLOCK, PLANES

DEFAULT_BLOCK_N = 512


def _plane_rows(group_size: int) -> int:
    """Scale-table rows per PACK_BLOCK k-block (table granularity is
    min(group_size, 128); larger groups are pre-expanded to one row per
    plane by the wrapper)."""
    return PACK_BLOCK // min(group_size, LANES)


def _accumulate(acc, x_ref, vals, s_ref, z_ref, j, gpp, gw):
    """One plane's contribution: gpp scale-hoisted chunk matmuls.

    vals: [bn, LANES] bf16 raw codebook values for plane j.
    """
    for c in range(gpp):
        xc = x_ref[:, j * LANES + c * gw:j * LANES + (c + 1) * gw]
        vc = vals[:, c * gw:(c + 1) * gw]
        part = jax.lax.dot_general(
            xc, vc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [m, bn]
        row = j * gpp + c
        s = s_ref[row, :][None, :]
        z = z_ref[row, :][None, :]
        xs = jnp.sum(xc.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * s + xs * z
    return acc


def _q4_kernel(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref, *,
               fmt: str, group_size: int, bn: int, nk: int,
               use_gather: bool):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]  # [bn, 128] int32 = one PACK_BLOCK k-slice
    if fmt in ("any4", "lut4"):
        lut = lut_ref[:].astype(jnp.float32)         # [bn, 16] or [1, 16]
        if fmt == "lut4":
            lut = jnp.broadcast_to(lut, (bn, 16))
        lut_t = jnp.concatenate([lut] * (LANES // 16), axis=1)  # [bn, 128]

    gpp = max(1, LANES // group_size)   # scale chunks per plane
    gw = LANES // gpp                   # chunk width along k

    acc = acc_ref[:]
    for j in range(PLANES):
        codes = jax.lax.shift_right_logical(w, 4 * j) & 0xF
        if fmt == "int4":
            vals = (codes - 8).astype(jnp.bfloat16)
        elif use_gather:
            vals = jnp.take_along_axis(lut_t, codes, axis=1) \
                .astype(jnp.bfloat16)
        else:  # interpreter / no-gather fallback: 16-way select tree
            vals = jnp.zeros(codes.shape, jnp.float32)
            for c in range(16):
                vals = vals + jnp.where(codes == c, lut[:, c:c + 1], 0.0)
            vals = vals.astype(jnp.bfloat16)
        acc = _accumulate(acc, x_ref, vals, s_ref, z_ref, j, gpp, gw)
    acc_ref[:] = acc

    @pl.when(kb == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 group_size: int, bn: int, nk: int):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpp = max(1, LANES // group_size)
    gw = LANES // gpp
    acc = acc_ref[:]
    for j in range(PLANES):
        vals = w_ref[:, j * LANES:(j + 1) * LANES].astype(jnp.bfloat16)
        acc = _accumulate(acc, x_ref, vals, s_ref, z_ref, j, gpp, gw)
    acc_ref[:] = acc

    @pl.when(kb == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _expand_plane_scales(sz: jax.Array, group_size: int) -> jax.Array:
    """``[kp/g, n]`` -> one row per min(g,128)-wide chunk."""
    if group_size > LANES:
        assert group_size % LANES == 0, \
            f"group_size {group_size} must be a multiple of {LANES} or divide it"
        return jnp.repeat(sz, group_size // LANES, axis=0)
    assert LANES % group_size == 0, \
        f"group_size {group_size} must divide {LANES}"
    return sz


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group_size", "n", "block_n", "out_dtype",
                     "use_gather", "interpret"))
def quantized_matmul_padded(
    x: jax.Array,                  # [mp, kp] bf16 (mp % 16 == 0, kp % 1024 == 0)
    packed: jax.Array,             # 4-bit fmts: [np, kp/8] int32; int8: [np, kp]
    scales_t: jax.Array,           # [kp/g, np] f32 (transposed)
    zeros_t: jax.Array,            # [kp/g, np] f32
    lut: Optional[jax.Array],      # any4: [np, 16]; lut4: [1, 16]; else None
    *,
    fmt: str,
    group_size: int,
    n: int,
    block_n: int = DEFAULT_BLOCK_N,
    out_dtype=jnp.bfloat16,
    use_gather: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Core padded kernel launch; returns ``y [mp, n]``. Use
    :func:`quantized_matmul` for the padding-aware entry point."""
    mp, kp = x.shape
    np_ = packed.shape[0]
    assert kp % PACK_BLOCK == 0 and mp % 8 == 0
    assert np_ % block_n == 0
    nk = kp // PACK_BLOCK
    nb = np_ // block_n
    kw = LANES if fmt != "int8" else PACK_BLOCK
    rows = _plane_rows(group_size)  # scale rows per k-block

    sz = _expand_plane_scales(scales_t, group_size)
    zz = _expand_plane_scales(zeros_t, group_size)

    in_specs = [
        pl.BlockSpec((mp, PACK_BLOCK), lambda i, kb: (0, kb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, kw), lambda i, kb: (i, kb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kb: (kb, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kb: (kb, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, packed, sz, zz]
    if fmt in ("any4", "lut4"):
        if fmt == "any4":
            in_specs.append(pl.BlockSpec((block_n, 16), lambda i, kb: (i, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, 16), lambda i, kb: (0, 0),
                                         memory_space=pltpu.VMEM))
        args.append(lut.astype(jnp.float32))
        kern = functools.partial(
            _q4_kernel, fmt=fmt, group_size=group_size, bn=block_n, nk=nk,
            use_gather=use_gather)
    elif fmt == "int4":
        in_specs.append(pl.BlockSpec((1, 16), lambda i, kb: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 16), jnp.float32))  # unused placeholder
        kern = functools.partial(
            _q4_kernel, fmt=fmt, group_size=group_size, bn=block_n, nk=nk,
            use_gather=use_gather)
    elif fmt == "int8":
        kern = functools.partial(
            _int8_kernel, group_size=group_size, bn=block_n, nk=nk)
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")

    y = pl.pallas_call(
        kern,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, block_n), lambda i, kb: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=packed.size * packed.dtype.itemsize
            + x.size * x.dtype.itemsize * nb + mp * np_ * 2
            + 2 * sz.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return y[:, :n]


def quantized_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales_t: jax.Array,
    zeros_t: jax.Array,
    lut: Optional[jax.Array] = None,
    *,
    fmt: str = "int4",
    group_size: int = 128,
    n: Optional[int] = None,
    block_n: int = DEFAULT_BLOCK_N,
    out_dtype=jnp.bfloat16,
    use_gather: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ dequant(W)^T`` with W stored packed/quantized.

    ``x`` is ``[..., k]`` activations; W is ``[n_out, k]`` logical, stored
    row-major packed (``[n_out, kp/8] int32``) with ``scales_t``/``zeros_t``
    in the transposed ``[kp/g, n_out]`` layout and ``lut`` (if any) as
    ``[n_out, 16]`` per-row or ``[1, 16]`` global. Handles m/n padding (k
    was padded at pack time). The hot path is GEMV-shaped (reference
    tinygemm targets 1 <= m <= 16, README.md:33-37); large-m callers should
    prefer dequantize-then-matmul (see ops.linear.linear).
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.bfloat16)
    m, k = x2.shape
    np_full = packed.shape[0]
    n = np_full if n is None else n
    kp = packed.shape[1] * (PLANES if fmt != "int8" else 1)

    mp = _round_up(max(m, 16), 16)
    bn = min(block_n, _round_up(np_full, 128))
    npad = _round_up(np_full, bn)

    if x2.shape[1] != kp:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    if npad != np_full:
        pad_n = npad - np_full
        packed = jnp.pad(packed, ((0, pad_n), (0, 0)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, pad_n)))
        zeros_t = jnp.pad(zeros_t, ((0, 0), (0, pad_n)))
        if lut is not None and lut.shape[0] == np_full:
            lut = jnp.pad(lut, ((0, pad_n), (0, 0)))

    y = quantized_matmul_padded(
        x2, packed, scales_t, zeros_t, lut, fmt=fmt, group_size=group_size,
        n=n, block_n=bn, out_dtype=out_dtype, use_gather=use_gather,
        interpret=interpret)
    return y[:m].reshape(*orig_shape[:-1], n)
