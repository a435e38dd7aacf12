"""Fused dequant + matmul Pallas kernels (the TPU-native tinygemm).

The reference's CUDA core is a single templated m16n8k16 tensor-core kernel
that streams packed 4-bit weights gmem->registers, dequantizes in-register
(LUT gather via smem/`__shfl_sync` or uniform int4 magic-number arithmetic)
and accumulates with `mma.sync` (TinyGemmImpl.cuh:23-345,
MatrixLayoutB.cuh:698-1099, Dequantization.cuh:18-260). The TPU equivalent
is one Pallas kernel family over a ``(n_blocks, k_chunks)`` grid:

- packed codes arrive in the planar layout of :mod:`any4_tpu.ops.packing`:
  a ``[block_n, 128] int32`` tile holds, in its 8 nibble planes, a full
  ``[block_n, 1024]`` k-slice of the weight matrix; unpacking is 8
  shift/mask ops with no cross-lane interleaves;
- dequantization is a single hardware dynamic-gather per plane from a
  **fused dequant table**: for each run of 8 quantization groups the kernel
  builds ``table[r, 16*g + c] = lut[r, c] * scale[r, g] + zero[r, g]`` (the
  16-entry codebook -- any4's learned per-row LUT, the uniform int4 ramp, or
  a global nf4/fp4/mx4 table -- pre-multiplied into each group's affine), so
  the gathered value IS the bf16 dequantized weight, bit-identical to the
  reference's dequantize-to-bf16-then-mma semantics. This is the TPU analog
  of the reference's in-register `__shfl_sync` LUT (Dequantization.cuh:93).
  TPU's gather unit only works along lanes with same-shape operands, which
  fixes the packed layout orientation (rows on sublanes);
- scale/zero blocks load in their natural transposed ``[k/g, n]`` layout
  (the reference's scales_and_zeros layout, tinygemm_lib/utils.py:53-65) and
  are transposed + lane-tiled in-VMEM (tiny ``[groups, block_n]`` tiles);
- all planes of a k-chunk concatenate into one ``[block_n, chunk]`` bf16
  operand feeding a *single* ``dot_general`` per grid step, amortizing MXU
  pipeline drain across the whole chunk (8 small dots per k-block were
  drain-bound);
- k-chunks accumulate into a VMEM f32 scratch (the analog of the reference's
  cross-warp smem split-k reduction, TinyGemmImpl.cuh:313-344).

Supported formats: ``int4`` (uniform ramp table), ``any4`` (per-row LUT),
``lut4`` (global 16-entry LUT: nf4/fp4/mx4), ``int8``.
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
# int8 activation-quantization constants shared with ops.linear
ACT_QMAX = 127.0
ACT_EPS = 1e-8
# largest m for the fused-activation-quant int8-MXU variant: the raw
# activation row is staged as ONE full-width VMEM block per grid step
# (m * k * 4B in f32), trivial at decode shapes
FUSED_ACT_M_MAX = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _q4select_kernel(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref, *,
                     fmt: str, bn: int, nk: int, kbs: int):
    """Gather-free LUT dequant via 16 select-FMAs per plane (the "one-hot x
    LUT as a contraction" design, SURVEY §7: ``deq = sum_v lut[:,v] *
    (codes==v)``, i.e. onehot(codes) contracted with the LUT row -- the MXU
    cannot help because per-row LUTs make the contraction a batched
    diagonal, and building the one-hot operand costs the same VPU compares
    either way). Kept for measurement/benchmark comparison with the
    production gather path (PERF_NOTES.md); requires group_size >= 128."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    st = s_ref[:].astype(jnp.float32).T                          # [bn, R]
    zt = z_ref[:].astype(jnp.float32).T
    lut = lut_ref[:].astype(jnp.float32)
    if fmt != "any4":
        lut = jnp.broadcast_to(lut, (bn, 16))
    w = w_ref[:]  # [bn, kbs*128] int32
    planes = []
    for j in range(kbs * PLANES):
        b, jj = divmod(j, PLANES)
        wb = w[:, b * LANES:(b + 1) * LANES]
        codes = (wb if jj == 0 else
                 jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
        val = jnp.zeros((bn, LANES), jnp.float32)
        for v in range(16):
            val = val + jnp.where(codes == v, lut[:, v:v + 1], 0.0)
        planes.append(
            (val * st[:, j:j + 1] + zt[:, j:j + 1]).astype(jnp.bfloat16))
    wfull = jnp.concatenate(planes, axis=1)  # [bn, kbs*1024] bf16
    part = jax.lax.dot_general(
        x_ref[:], wfull, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + part

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_kernel(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref, *,
               fmt: str, group_size: int, bn: int, nk: int, kbs: int):
    """One grid step: dequantize a [bn, kbs*1024] k-chunk via fused-table
    gathers and accumulate a single dot."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g_eff = min(group_size, LANES)
    gpp = LANES // g_eff            # groups per plane
    ppt = 8 // gpp                  # planes per 8-group table
    n_tables = kbs * PLANES // ppt  # tables per program
    R = s_ref.shape[0]              # groups per program (at g_eff granularity)

    # scales/zeros arrive [R, bn]; transpose in-VMEM (tiny tile)
    st = s_ref[:].astype(jnp.float32).T                          # [bn, R]
    zt = z_ref[:].astype(jnp.float32).T

    w = w_ref[:]  # [bn, kbs*128] int32
    planes = []
    # all 4-bit formats gather from a fused per-group dequant table (int4
    # uses the uniform ramp as its codebook). An arithmetic int4 branch
    # ((codes-8)*s+z with static lane-slice broadcasts) measured FASTER
    # only in the pool's DVFS-throttled state and loses at full clock --
    # see PERF_NOTES.md "Addendum"; the gather is the production choice.
    lut = lut_ref[:].astype(jnp.float32)
    if fmt != "any4":
        lut = jnp.broadcast_to(lut, (bn, 16))
    lut_t = jnp.concatenate([lut] * (LANES // 16), axis=1)   # [bn, 128]
    tiles = LANES // R if R < LANES else 1
    st_t, zt_t = st, zt
    if tiles > 1:
        st_t = jnp.concatenate([st] * tiles, axis=1)         # [bn, 128]
        zt_t = jnp.concatenate([zt] * tiles, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, LANES), 1)
    for t in range(n_tables):
        # fused dequant table for groups [t*8, t*8+8):
        # table[r, 16*g + c] = lut[r, c] * s[r, g] + z[r, g]
        gidx = (t * 8 + lane // 16) % max(R, 1)
        sg = jnp.take_along_axis(st_t, gidx, axis=1)
        zg = jnp.take_along_axis(zt_t, gidx, axis=1)
        table = lut_t * sg + zg                               # f32
        for p in range(ppt):
            j = t * ppt + p      # global plane index in this chunk
            b, jj = divmod(j, PLANES)
            wb = w[:, b * LANES:(b + 1) * LANES]
            codes = (wb if jj == 0 else
                     jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
            idx = codes + 16 * (p * gpp + lane // g_eff)
            planes.append(
                jnp.take_along_axis(table, idx, axis=1)
                .astype(jnp.bfloat16))
    wfull = jnp.concatenate(planes, axis=1)  # [bn, kbs*1024] bf16

    part = jax.lax.dot_general(
        x_ref[:], wfull, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                       # [m, bn]
    acc_ref[:] = acc_ref[:] + part

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4post_kernel(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref, *,
                   fmt: str, bn: int, nk: int, kbs: int):
    """LUT formats with the affine applied POST-DOT (the production path
    for any4/nf4/fp4/mx4 at group_size % 128 == 0).

    The fused-table kernel (`_q4_kernel`) pays ~6 VPU ops per [bn, 128]
    weight tile (table build amortized, index offset, gather, f32 FMA,
    bf16 cast); hardware isolation (tools/probe_lut_variants.py, fast
    regime) showed the gather itself is only ~27% of its runtime -- the
    per-weight-element scale FMA and casts dominate. This kernel gathers
    the RAW 16-entry codebook (no index arithmetic: the table tiles the
    LUT every 16 lanes and codes are 0..15, so `take_along_axis(table,
    codes)` hits the first tile), dots each 128-wide plane against the
    bf16 codebook values, and applies each group's affine to the [m, bn]
    partial instead of the [bn, 128] weight tile -- 128x less FMA work at
    m=1, exactly the trick that makes int4p/w4a8 fast:
    ``y += P*s + sum(x_g)*z`` with ``P = x_g @ lut[codes]^T``.

    Numerics: the codebook is rounded to bf16 once pre-dot and the group
    affine runs in f32 post-dot (the fused-table path instead rounds
    ``lut*s+z`` to bf16 per element) -- same error class as the
    reference's bf16 tensor-core MMA, tested against the dequant
    reference at the shared kernel tolerance."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lut = lut_ref[:].astype(jnp.float32)
    if fmt != "any4":
        lut = jnp.broadcast_to(lut, (bn, 16))
    table = jnp.concatenate([lut] * (LANES // 16), axis=1)   # [bn, 128]

    xb = x_ref[:]                       # [mp, kbs*1024] bf16
    w = w_ref[:]                        # [bn, kbs*128] int32
    acc = acc_ref[:]
    for j in range(kbs * PLANES):
        b, jj = divmod(j, PLANES)
        wb = w[:, b * LANES:(b + 1) * LANES]
        codes = (wb if jj == 0 else
                 jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
        v = jnp.take_along_axis(table, codes, axis=1).astype(jnp.bfloat16)
        xg = xb[:, j * LANES:(j + 1) * LANES]
        part = jax.lax.dot_general(
            xg, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [mp, bn]
        sg = s_ref[j:j + 1, :].astype(jnp.float32)           # [1, bn]
        zg = z_ref[j:j + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4t_kernel(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref, *,
                fmt: str, bn: int, nk: int, kbs: int):
    """Transposed-layout LUT kernel (fmt="any4t"/"lut4t"): the production
    any4/nf4/fp4 path at group_size % 128 == 0.

    Codes arrive in :func:`any4_tpu.ops.packing.pack_int4_transposed`
    order -- k on SUBLANES, output rows on LANES -- so the 16-entry
    codebook can be gathered along the sublane dimension:
    ``take_along_axis(lut_half [8, bn], codes [8, bn], axis=0)`` lowers to
    ``tpu.dynamic_gather(dim 0)``, whose v5e reach is one 32-bit vreg (8
    sublanes). Two gathers (lo/hi LUT half) + a select cover 16 entries.
    Measured 110.6 -> ~50 us/layer at 4096^2 m=1 vs the lane-gather
    row-major kernel (benchmarks/lab_any4_r3.json, tune_any4t_r3.json):
    the lane-dimension gather retires ~2 us per [512, 128] tile while the
    sublane gather costs a few basic VPU ops -- this is the TPU analog of
    the reference's in-register `__shfl_sync` LUT (Dequantization.cuh:
    93-131). The dequantized [128, bn] group feeds the MXU in its natural
    ``[m, 128] x [128, bn]`` orientation and the group affine applies
    post-dot like `_q4post_kernel`: ``y += P*s + sum(x_g)*z``.

    Numerics are IDENTICAL to the row-major `_q4post_kernel` (same bf16
    codebook rounding pre-dot, same f32 post-dot affine): validated
    bit-equal on hardware at 4096^2.
    """
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lut_t = lut_ref[:].astype(jnp.float32)           # [16, bn] or [16, 1]
    if fmt != "any4t":
        lut_t = jnp.broadcast_to(lut_t, (16, bn))    # global codebook
    tlo = lut_t[0:8, :]
    thi = lut_t[8:16, :]

    xb = x_ref[:]                                    # [mp, kbs*1024] bf16
    w = w_ref[:]                                     # [kbs*128, bn] int32
    acc = acc_ref[:]
    for g in range(kbs * 8):                         # 128-wide k groups
        words = w[g * 16:(g + 1) * 16, :]            # [16, bn]
        outs = []
        for p in range(PLANES):
            wp = (words if p == 0 else
                  jax.lax.shift_right_logical(words, 4 * p)) & 0xF
            for s in range(2):                       # 8-sublane gather reach
                cs = wp[s * 8:(s + 1) * 8, :]
                c7 = cs & 7
                glo = jnp.take_along_axis(tlo, c7, axis=0)
                ghi = jnp.take_along_axis(thi, c7, axis=0)
                outs.append(jnp.where(cs >= 8, ghi, glo))
        deq = jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)
        xg = xb[:, g * LANES:(g + 1) * LANES]
        part = jax.lax.dot_general(
            xg, deq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group_size", "n", "block_n", "out_dtype",
                     "interpret", "k_chunk"))
def _q4t_matmul_padded(
    x: jax.Array,                  # [mp, kp] bf16
    packed: jax.Array,             # [kp/8, np] int32 (transposed planar)
    scales_t: jax.Array,           # [kp/g, np] f32
    zeros_t: jax.Array,            # [kp/g, np] f32
    lut_t: Optional[jax.Array],    # any4t: [16, np]; lut4t: [16, 1]
    *,
    fmt: str,
    group_size: int,
    n: int,
    block_n: int,
    out_dtype,
    interpret: bool,
    k_chunk: Optional[int],
) -> jax.Array:
    """Launch driver for the transposed-layout LUT kernels (``any4t`` /
    ``lut4t``; see :func:`_q4t_kernel`). The packed operand is
    :func:`any4_tpu.ops.packing.pack_int4_transposed` output -- k on
    sublanes, output rows on lanes -- and the LUT arrives TRANSPOSED
    (``[16, np]``) so its block along lanes matches the weight block."""
    mp, kp = x.shape
    np_ = packed.shape[1]
    assert packed.shape[0] * PLANES == kp, (packed.shape, kp)
    assert kp % PACK_BLOCK == 0 and (mp <= 16 or mp % 16 == 0)
    assert np_ % block_n == 0
    assert group_size % LANES == 0, \
        "transposed-layout kernels need group_size a multiple of 128"
    nkb = kp // PACK_BLOCK
    if k_chunk is not None:
        assert nkb % k_chunk == 0
        kbs = k_chunk
    else:
        kbs = 2 if nkb % 2 == 0 else 1
    nk = nkb // kbs
    nb = np_ // block_n
    sz = _expand_plane_scales(scales_t, group_size)
    zz = _expand_plane_scales(zeros_t, group_size)
    rows = kbs * PACK_BLOCK // LANES

    in_specs = [
        pl.BlockSpec((mp, kbs * PACK_BLOCK), lambda i, kc: (0, kc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kbs * 128, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, block_n if fmt == "any4t" else 1),
                     lambda i, kc: (0, i if fmt == "any4t" else 0),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(_q4t_kernel, fmt=fmt, bn=block_n, nk=nk,
                             kbs=kbs)
    y = pl.pallas_call(
        kern,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, block_n), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=packed.size * 4 + x.size * x.dtype.itemsize * nb
            + mp * np_ * 2 + 2 * sz.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, packed, sz, zz, lut_t.astype(jnp.float32))
    return y[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group_size", "n", "block_n", "out_dtype",
                     "interpret", "k_chunk"))
def _int8t_matmul_padded(
    x: jax.Array,                  # [mp, kp] int8/bf16/f32
    packed: jax.Array,             # [kp, np] int8 (transposed)
    scales_t: jax.Array,           # [kp/g, np] f32
    zeros_t: jax.Array,            # [kp/g, np] f32
    *,
    fmt: str,
    group_size: int,
    n: int,
    block_n: int,
    out_dtype,
    interpret: bool,
    k_chunk: Optional[int],
) -> jax.Array:
    """Launch driver for the transposed int8 kernels (``w8a8t`` int8-MXU /
    ``int8t`` bf16-dequant; see :func:`_w8a8t_kernel`). The packed operand
    is :func:`any4_tpu.ops.packing.pack_int8_transposed` output."""
    mp, kp = x.shape
    np_ = packed.shape[1]
    assert packed.shape[0] == kp, (packed.shape, kp)
    assert kp % PACK_BLOCK == 0 and (mp <= 16 or mp % 16 == 0)
    assert np_ % block_n == 0
    assert group_size % LANES == 0, \
        "transposed int8 kernels need group_size a multiple of 128"
    act_fused = fmt == "w8a8t" and x.dtype != jnp.int8
    if act_fused:
        assert mp <= FUSED_ACT_M_MAX
    nkb = kp // PACK_BLOCK
    if k_chunk is not None:
        assert nkb % k_chunk == 0
        kbs = k_chunk
    else:
        kbs = 4 if nkb % 4 == 0 else 2 if nkb % 2 == 0 else 1
    nk = nkb // kbs
    nb = np_ // block_n
    sz = _expand_plane_scales(scales_t, group_size)
    zz = _expand_plane_scales(zeros_t, group_size)
    rows = kbs * PACK_BLOCK // LANES

    in_specs = [
        pl.BlockSpec((mp, kp), lambda i, kc: (0, 0),
                     memory_space=pltpu.VMEM) if act_fused else
        pl.BlockSpec((mp, kbs * PACK_BLOCK), lambda i, kc: (0, kc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kbs * PACK_BLOCK, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
    ]
    if fmt == "int8t":
        kern = functools.partial(_int8t_kernel, bn=block_n, nk=nk, kbs=kbs)
    else:
        kern = functools.partial(
            _w8a8tf_kernel if act_fused else _w8a8t_kernel,
            bn=block_n, nk=nk, kbs=kbs)
    y = pl.pallas_call(
        kern,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, block_n), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)]
        + ([pltpu.VMEM((mp, LANES), jnp.float32)] if act_fused else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=packed.size + x.size * x.dtype.itemsize * nb
            + mp * np_ * 2 + 2 * sz.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, packed, sz, zz)
    return y[:, :n]


def _q4pair_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                   bn: int, nk: int, kbs: int):
    """Magic-number pair-packed int4 (fmt="int4p", packing.pack_int4_pair):
    per 128-wide plane, ``(w >> 4p) & 0x000F000F | 0x43004300`` bitcast to
    bf16 yields ``128 + code`` for TWO rows at once (no gather, no
    per-element scale); each plane is one >=128-wide quant group, so its
    dot's ``[m, bn]`` partial is scaled post-MXU:
    ``y += P*s + sum(x_g)*(z - 136 s)`` -- the TPU analog of the
    reference's fp16 magic-number int4 path (Dequantization.cuh:136-260),
    exact vs the dequant reference (no bf16 rounding of scaled values).
    (Hoisting the x-sum affine out of the kernel into a per-call XLA dot
    gains ~2% on long single-shape chains but costs ~25% on e2e decode --
    112 extra tiny-dot launches per token; see PERF_NOTES.md round 2b.)"""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]                       # [mp, kbs*1024] bf16
    w = w_ref[:]                        # [bn//2, kbs*256] int32
    acc = acc_ref[:]
    for b in range(2 * kbs):            # 512-k sub-blocks
        wb = w[:, b * 128:(b + 1) * 128]
        for p in range(4):
            g = b * 4 + p               # 128-wide scale row index
            shifted = wb if p == 0 else \
                jax.lax.shift_right_logical(wb, 4 * p)
            t = (shifted & 0x000F000F) | 0x43004300
            v = pltpu.bitcast(t, jnp.bfloat16)      # [bn, 128] = 128+c
            xg = xb[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [mp, bn]
            sg = s_ref[g:g + 1, :].astype(jnp.float32)   # [1, bn]
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + part * sg + xs * (zg - 136.0 * sg)
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4a8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 bn: int, nk: int, kbs: int):
    """Quad-packed int4 weights x int8 activations on the int8 MXU
    (fmt="w4a8", packing.pack_int4_quad): FOUR output rows per int32 word;
    ``w & 0x0F0F0F0F`` / ``(w >> 4) & 0x0F0F0F0F`` bitcast to int8 yield a
    whole ``[bn, 128]`` code tile in 1-2 VPU ops + a bitcast (~3x fewer
    vector ops per code than the bf16 pair path), and the dot runs
    int8 x int8 -> int32 on the MXU's double int8 rate (production-shaped
    int8 dots validated exact on hardware, benchmarks/probe_int8_dot2.json;
    device-time comparison: tools/validate_w4a8.py). Weight codes/scales
    are identical to
    fmt="int4"; activations are per-row absmax-int8 (the caller divides by
    127/absmax and multiplies the f32 output back -- see ops.linear).
    Per 128-wide group: ``y += P*s + sum(x_g)*(z - 8s)`` with P the int32
    code dot -- exact integer arithmetic inside, one f32 FMA per group."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = x_ref[:]                       # [mp, kbs*1024] int8
    w = w_ref[:]                        # [bn//4, kbs*512] int32
    acc = acc_ref[:]
    for b in range(kbs * 4):            # 256-k word blocks
        wb = w[:, b * 128:(b + 1) * 128]
        for p in range(2):
            g = b * 2 + p               # 128-wide scale row index
            t = (wb if p == 0 else
                 jax.lax.shift_right_logical(wb, 4)) & 0x0F0F0F0F
            cw = pltpu.bitcast(t, jnp.int8)          # [bn, 128] codes
            xg = xq[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, cw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)    # [mp, bn]
            sg = s_ref[g:g + 1, :].astype(jnp.float32)
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                         keepdims=True).astype(jnp.float32)
            acc = acc + part.astype(jnp.float32) * sg \
                + xs * (zg - 8.0 * sg)
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4a8f_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, sx_ref, *,
                  bn: int, nk: int, kbs: int):
    """w4a8 with activation quantization fused into the kernel prologue.

    The standalone w4a8 path pays two extra XLA ops per layer (the
    per-row absmax int8 quantize before the kernel and the ``y * sx``
    scale after it) -- measured at ~10 us of the 25.5 us/layer wall at
    4096^2 m=1 (PERF_NOTES round 2d). At decode-shaped m the whole
    activation row fits trivially in VMEM, so this variant takes the RAW
    bf16/f32 activations as a full-width ``[mp, kp]`` block, computes the
    per-row absmax scale in-register, quantizes the current k-chunk to
    int8, runs the same exact integer dots, and folds ``sx`` into the
    epilogue -- one dispatch, numerics identical to the external path
    (same full-row absmax, same round/clip, same f32 scale point).

    The full-row absmax is computed ONCE per n-block (``kc == 0``) into a
    VMEM scratch and re-read on later k-steps -- the first version loaded
    and reduced the whole ``[mp, kp]`` row every grid step (nk x the VPU
    work for the same value; VERDICT r2 weak #8)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)     # [mp, kp] full row
        sx0 = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          ACT_EPS) / ACT_QMAX  # [mp, 1]
        sx_ref[:] = jnp.broadcast_to(sx0, sx_ref.shape)

    sx = sx_ref[:, :1]                        # [mp, 1]
    csz = kbs * PACK_BLOCK
    # chunk via a dynamic ref slice (Mosaic lowers pl.ds on refs, not
    # lax.dynamic_slice on loaded values)
    xc = x_ref[:, pl.ds(kc * csz, csz)].astype(jnp.float32)
    xq = jnp.clip(jnp.round(xc / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)

    w = w_ref[:]                              # [bn//4, kbs*512] int32
    acc = acc_ref[:]
    for b in range(kbs * 4):                  # 256-k word blocks
        wb = w[:, b * 128:(b + 1) * 128]
        for p in range(2):
            g = b * 2 + p                     # 128-wide scale row index
            t = (wb if p == 0 else
                 jax.lax.shift_right_logical(wb, 4)) & 0x0F0F0F0F
            cw = pltpu.bitcast(t, jnp.int8)
            xg = xq[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, cw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sg = s_ref[g:g + 1, :].astype(jnp.float32)
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                         keepdims=True).astype(jnp.float32)
            acc = acc + part.astype(jnp.float32) * sg \
                + xs * (zg - 8.0 * sg)
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx).astype(o_ref.dtype)


def _w8a8f_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, sx_ref, *,
                  bn: int, nk: int, kbs: int):
    """w8a8 with fused activation quantization (see _w4a8f_kernel)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)
        sx0 = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          ACT_EPS) / ACT_QMAX
        sx_ref[:] = jnp.broadcast_to(sx0, sx_ref.shape)

    sx = sx_ref[:, :1]
    csz = kbs * PACK_BLOCK
    xc = x_ref[:, pl.ds(kc * csz, csz)].astype(jnp.float32)
    xq = jnp.clip(jnp.round(xc / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)

    w = w_ref[:]                              # [bn, kbs*1024] int8
    acc = acc_ref[:]
    for g in range(kbs * 8):                  # 128-wide groups
        wg = w[:, g * 128:(g + 1) * 128]
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx).astype(o_ref.dtype)


def _w8a8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 bn: int, nk: int, kbs: int):
    """int8 weights x int8 activations on the int8 MXU (fmt="w8a8"):
    zero unpack work -- the packed array IS the centered int8 code matrix
    (packing.pack_int8), so each 128-wide group is one int8 dot plus the
    post-dot affine ``y += P*s + sum(x_g)*z`` (reconstruction q*s + z).
    The bf16-dequant int8 kernel (_int8_kernel) measured 0.56x bf16; this
    path rides the 2x int8 MXU rate instead."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = x_ref[:]                       # [mp, kbs*1024] int8
    w = w_ref[:]                        # [bn, kbs*1024] int8
    acc = acc_ref[:]
    for g in range(kbs * 8):            # 128-wide groups
        wg = w[:, g * 128:(g + 1) * 128]
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)        # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w8a8q_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  bn: int, nk: int, kbs: int):
    """Quad-packed int8 weights x int8 activations (fmt="w8a8", the
    production int8-weight path; packing.pack_int8_quad): FOUR output
    rows' bytes per int32 word, so ``pltpu.bitcast(words, int8)`` yields
    a whole ``[bn, 128]`` centered-int8 tile with ZERO vector ops -- the
    w4a8 mechanics applied to full bytes. Plain int8-typed weight arrays
    measured 62-65 us/layer at 4096^2 m=1 in BOTH orientations
    (benchmarks/lab_int8_r4.json; the (32,128) int8 VMEM tiling feeds the
    MXU poorly) while this int32-word structure runs w4a8's dot pattern
    (25.4 us) with the only difference being 2x the HBM bytes. Post-dot
    affine per 128-group: ``y += P*s + sum(x_g)*z``."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = x_ref[:]                       # [mp, kbs*1024] int8
    w = w_ref[:]                        # [bn//4, kbs*1024] int32
    acc = acc_ref[:]
    for g in range(kbs * 8):            # 128-wide word blocks = k groups
        wb = w[:, g * 128:(g + 1) * 128]
        cw = pltpu.bitcast(wb, jnp.int8)             # [bn, 128] codes
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, cw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)        # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w8a8qf_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, sx_ref, *,
                   bn: int, nk: int, kbs: int):
    """_w8a8q_kernel with fused activation quantization (see
    _w4a8f_kernel)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)
        sx0 = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          ACT_EPS) / ACT_QMAX
        sx_ref[:] = jnp.broadcast_to(sx0, sx_ref.shape)

    sx = sx_ref[:, :1]
    csz = kbs * PACK_BLOCK
    xc = x_ref[:, pl.ds(kc * csz, csz)].astype(jnp.float32)
    xq = jnp.clip(jnp.round(xc / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)

    w = w_ref[:]                        # [bn//4, kbs*1024] int32
    acc = acc_ref[:]
    for g in range(kbs * 8):
        wb = w[:, g * 128:(g + 1) * 128]
        cw = pltpu.bitcast(wb, jnp.int8)
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, cw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx).astype(o_ref.dtype)


def _int8q_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  bn: int, nk: int, kbs: int):
    """Quad-packed int8 weights x bf16 activations (fmt="int8", the
    weight-only int8 path): bitcast to int8, astype to bf16 (codes are
    bf16-exact), dot, post-dot affine -- the int8 analog of the magic-
    number int4p path. Replaces both the per-element dequant _int8_kernel
    (121.7 us/layer) and the transposed astype variant (64.6 us)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]                       # [mp, kbs*1024] bf16
    w = w_ref[:]                        # [bn//4, kbs*1024] int32
    acc = acc_ref[:]
    for g in range(kbs * 8):
        wb = w[:, g * 128:(g + 1) * 128]
        v = pltpu.bitcast(wb, jnp.int8).astype(jnp.bfloat16)
        xg = xb[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w8a8t_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  bn: int, nk: int, kbs: int):
    """Transposed int8 weights x int8 activations (fmt="w8a8", the
    production int8-weight path): codes arrive ``[kp, n]``
    (packing.pack_int8_transposed) so each 128-wide k group is a
    ``[128, bn]`` tile that dots as ``x [m, 128] @ w [128, bn]`` in the
    MXU's NATURAL orientation -- the row-major variant (_w8a8_kernel)
    contracts dim 1 of both operands, and the implied int8 weight
    transpose measured 62.2 us/layer at 4096^2 m=1 vs a ~37 us structural
    floor for this layout (benchmarks/lab_any4_r3.json a8_floor; VERDICT
    r3 weak #3). Zero unpack work; post-dot affine per group:
    ``y += P*s + sum(x_g)*z``."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = x_ref[:]                       # [mp, kbs*1024] int8
    w = w_ref[:]                        # [kbs*1024, bn] int8
    acc = acc_ref[:]
    for g in range(kbs * 8):            # 128-wide groups
        wg = w[g * 128:(g + 1) * 128, :]
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w8a8tf_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, sx_ref, *,
                   bn: int, nk: int, kbs: int):
    """_w8a8t_kernel with fused activation quantization (see
    _w4a8f_kernel: full-row absmax into a kc==0 scratch, per-chunk int8
    quantize, sx folded into the epilogue)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)
        sx0 = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                          ACT_EPS) / ACT_QMAX
        sx_ref[:] = jnp.broadcast_to(sx0, sx_ref.shape)

    sx = sx_ref[:, :1]
    csz = kbs * PACK_BLOCK
    xc = x_ref[:, pl.ds(kc * csz, csz)].astype(jnp.float32)
    xq = jnp.clip(jnp.round(xc / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)

    w = w_ref[:]                              # [kbs*1024, bn] int8
    acc = acc_ref[:]
    for g in range(kbs * 8):
        wg = w[g * 128:(g + 1) * 128, :]
        xg = xq[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        acc = acc + part.astype(jnp.float32) * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx).astype(o_ref.dtype)


def _int8t_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  bn: int, nk: int, kbs: int):
    """Transposed int8 weights x bf16 activations (fmt="int8", the
    weight-only int8 path at group_size % 128 == 0): int8 codes are
    bf16-EXACT (|q| <= 127), so dequantization is a plain astype with the
    group affine applied post-dot -- no per-element FMA at all (the old
    row-major _int8_kernel built a bf16 ``q*s+z`` plane per element and
    measured 0.56x bf16). Numerics: exact vs the dequant reference up to
    the f32 affine (codes are integers, the bf16 dot accumulates f32)."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]                       # [mp, kbs*1024] bf16
    w = w_ref[:]                        # [kbs*1024, bn] int8
    acc = acc_ref[:]
    for g in range(kbs * 8):
        wg = w[g * 128:(g + 1) * 128, :].astype(jnp.bfloat16)
        xg = xb[:, g * 128:(g + 1) * 128]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [mp, bn]
        sg = s_ref[g:g + 1, :].astype(jnp.float32)
        zg = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * sg + xs * zg
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 group_size: int, bn: int, nk: int, kbs: int):
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g_eff = min(group_size, LANES)
    gpp = LANES // g_eff
    st = s_ref[:].astype(jnp.float32).T   # [bn, R]
    zt = z_ref[:].astype(jnp.float32).T

    planes = []
    for j in range(kbs * PLANES):
        q = w_ref[:, j * LANES:(j + 1) * LANES].astype(jnp.float32)
        for c in range(gpp):
            G = j * gpp + c
            sg = st[:, G:G + 1]           # static lane slice, broadcasts
            zg = zt[:, G:G + 1]
            seg = q if gpp == 1 else q[:, c * g_eff:(c + 1) * g_eff]
            planes.append((seg * sg + zg).astype(jnp.bfloat16))
    wfull = jnp.concatenate(planes, axis=1)
    part = jax.lax.dot_general(
        x_ref[:], wfull, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + part

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


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
                     "use_gather", "interpret", "k_chunk"))
def quantized_matmul_padded(
    x: jax.Array,                  # [mp, kp] bf16 (mp % 16 == 0, kp % 1024 == 0)
    packed: jax.Array,             # 4-bit fmts: [np, kp/8] int32; int8: [np, kp]
    scales_t: jax.Array,           # [kp/g, np] f32 (transposed)
    zeros_t: jax.Array,            # [kp/g, np] f32
    lut: Optional[jax.Array],      # any4: [np, 16]; lut4/int4: [1, 16]
    *,
    fmt: str,
    group_size: int,
    n: int,
    block_n: int = DEFAULT_BLOCK_N,
    out_dtype=jnp.bfloat16,
    use_gather: bool = True,
    interpret: bool = False,
    k_chunk: Optional[int] = None,  # PACK_BLOCKs fused per grid step
) -> jax.Array:
    """Core padded kernel launch; returns ``y [mp, n]``. Use
    :func:`quantized_matmul` for the padding-aware entry point."""
    if fmt in ("int8", "w8a8", "w8a8t", "int8t", "w8a8q", "int8q"):
        # int8 blocks are 8x larger than packed-int4 at the same block_n;
        # bn=1024 overflows the 16MB VMEM budget (measured on v5e)
        block_n = min(block_n, 512)
    mp, kp = x.shape
    if fmt in ("any4t", "lut4t"):
        return _q4t_matmul_padded(
            x, packed, scales_t, zeros_t, lut, fmt=fmt,
            group_size=group_size, n=n, block_n=block_n,
            out_dtype=out_dtype, interpret=interpret, k_chunk=k_chunk)
    if fmt in ("w8a8t", "int8t"):
        return _int8t_matmul_padded(
            x, packed, scales_t, zeros_t, fmt=fmt, group_size=group_size,
            n=n, block_n=block_n, out_dtype=out_dtype, interpret=interpret,
            k_chunk=k_chunk)
    np_ = packed.shape[0] * (2 if fmt == "int4p" else
                             4 if fmt in ("w4a8", "w8a8q", "int8q") else 1)
    # int8-MXU formats: int8 x -> pre-quantized activations (external
    # quantize_activations, prefill); float x -> activation quantization
    # fused into the kernel (decode; one dispatch, no separate absmax /
    # round / post-scale XLA ops)
    act_fused = fmt in ("w4a8", "w8a8", "w8a8q") and x.dtype != jnp.int8
    if act_fused:
        assert mp <= FUSED_ACT_M_MAX, \
            f"fused activation quant stages the full [m={mp}, k={kp}] row " \
            f"in VMEM; quantize externally above m={FUSED_ACT_M_MAX}"
    assert kp % PACK_BLOCK == 0 and (mp <= 16 or mp % 16 == 0)
    assert np_ % block_n == 0
    nkb = kp // PACK_BLOCK
    if k_chunk is not None:
        assert nkb % k_chunk == 0, \
            f"k_chunk {k_chunk} must divide {nkb} pack blocks"
        kbs = k_chunk
    elif fmt in ("int4p", "w4a8", "w8a8", "w8a8q", "int8q"):
        # chain-timed sweep (tools/tune_chain.py, benchmarks/
        # tune_chain_int4p_r2.json): kbs=4 consistently ~6% faster than 2
        kbs = 4 if nkb % 4 == 0 else 2 if nkb % 2 == 0 else 1
    else:
        kbs = 2 if nkb % 2 == 0 else 1   # k-blocks fused per grid step
    nk = nkb // kbs
    nb = np_ // block_n
    kw = LANES if fmt not in ("int8", "w8a8") else PACK_BLOCK

    sz = _expand_plane_scales(scales_t, group_size)
    zz = _expand_plane_scales(zeros_t, group_size)
    g_eff = min(group_size, LANES)
    assert g_eff >= 16, \
        f"group_size {group_size} < 16 unsupported by the fused-table kernel"
    rows = kbs * PACK_BLOCK // g_eff  # scale rows per grid step

    if fmt == "int4p":
        wspec = pl.BlockSpec((block_n // 2, kbs * PACK_BLOCK // 4),
                             lambda i, kc: (i, kc),
                             memory_space=pltpu.VMEM)
    elif fmt == "w4a8":
        wspec = pl.BlockSpec((block_n // 4, kbs * PACK_BLOCK // 2),
                             lambda i, kc: (i, kc),
                             memory_space=pltpu.VMEM)
    elif fmt in ("w8a8q", "int8q"):
        wspec = pl.BlockSpec((block_n // 4, kbs * PACK_BLOCK),
                             lambda i, kc: (i, kc),
                             memory_space=pltpu.VMEM)
    else:
        wspec = pl.BlockSpec((block_n, kbs * kw), lambda i, kc: (i, kc),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((mp, kp), lambda i, kc: (0, 0),
                     memory_space=pltpu.VMEM) if act_fused else
        pl.BlockSpec((mp, kbs * PACK_BLOCK), lambda i, kc: (0, kc),
                     memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, block_n), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, packed, sz, zz]
    if fmt == "int4p":
        assert group_size % LANES == 0, \
            "int4p needs group_size a multiple of 128 (plane-constant " \
            "scales for the post-dot affine)"
        assert block_n % 2 == 0
        kern = functools.partial(_q4pair_kernel, bn=block_n, nk=nk, kbs=kbs)
    elif fmt == "w4a8":
        assert group_size % LANES == 0, \
            "w4a8 needs group_size a multiple of 128 (plane-constant " \
            "scales for the post-dot affine)"
        assert block_n % 4 == 0
        kern = functools.partial(_w4a8f_kernel if act_fused else _w4a8_kernel,
                                 bn=block_n, nk=nk, kbs=kbs)
    elif fmt == "w8a8":
        assert group_size % LANES == 0, \
            "w8a8 needs group_size a multiple of 128"
        kern = functools.partial(_w8a8f_kernel if act_fused else _w8a8_kernel,
                                 bn=block_n, nk=nk, kbs=kbs)
    elif fmt == "w8a8q":
        assert group_size % LANES == 0, \
            "w8a8q needs group_size a multiple of 128"
        assert block_n % 4 == 0
        kern = functools.partial(
            _w8a8qf_kernel if act_fused else _w8a8q_kernel,
            bn=block_n, nk=nk, kbs=kbs)
    elif fmt == "int8q":
        assert group_size % LANES == 0, \
            "int8q needs group_size a multiple of 128"
        assert block_n % 4 == 0
        kern = functools.partial(_int8q_kernel, bn=block_n, nk=nk, kbs=kbs)
    elif fmt in ("any4", "lut4", "int4"):
        if fmt == "any4":
            in_specs.append(pl.BlockSpec((block_n, 16), lambda i, kc: (i, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, 16), lambda i, kc: (0, 0),
                                         memory_space=pltpu.VMEM))
        if fmt == "int4":
            lut = (jnp.arange(16, dtype=jnp.float32) - 8.0)[None, :]
        args.append(lut.astype(jnp.float32))
        if not use_gather:
            # select-16 one-hot contraction variant (measurement alternative
            # to the production gather; see _q4select_kernel)
            assert group_size % LANES == 0, \
                "use_gather=False requires group_size a multiple of 128"
            kern = functools.partial(
                _q4select_kernel, fmt=fmt, bn=block_n, nk=nk, kbs=kbs)
        elif fmt in ("any4", "lut4") and group_size % LANES == 0:
            # post-dot affine: raw-LUT gather + per-plane dots (2.3x the
            # fused-table kernel at 4096^2 m=1; probe_lut_variants.py)
            kern = functools.partial(
                _q4post_kernel, fmt=fmt, bn=block_n, nk=nk, kbs=kbs)
        else:
            kern = functools.partial(
                _q4_kernel, fmt=fmt, group_size=group_size, bn=block_n,
                nk=nk, kbs=kbs)
    elif fmt == "int8":
        kern = functools.partial(
            _int8_kernel, group_size=group_size, bn=block_n, nk=nk, kbs=kbs)
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")

    y = pl.pallas_call(
        kern,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, block_n), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)]
        + ([pltpu.VMEM((mp, LANES), jnp.float32)] if act_fused else []),
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
    k_chunk: Optional[int] = None,
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
    # Mosaic kernels only run on TPU; fall back to the interpreter on CPU
    # (tests, virtual-device meshes, multichip dry runs)
    interpret = interpret or jax.default_backend() == "cpu"

    orig_shape = x.shape
    if fmt in ("w4a8", "w8a8", "w8a8t", "w8a8q"):
        # int8 activations were quantized externally
        # (ops.linear.quantize_activations); a float dtype selects the
        # fused in-kernel activation quantization (kept in its original
        # precision -- the kernel's absmax/round run in f32 either way)
        x2 = x.reshape(-1, orig_shape[-1])
    else:
        x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.bfloat16)
    m, k = x2.shape
    transposed = fmt in ("any4t", "lut4t", "w8a8t", "int8t")
    k_per_trow = 1 if fmt in ("w8a8t", "int8t") else PLANES
    rows_per_word = 2 if fmt == "int4p" else \
        4 if fmt in ("w4a8", "w8a8q", "int8q") else 1
    word_k = 4 if fmt == "int4p" else 2 if fmt == "w4a8" else \
        (PLANES if fmt not in ("int8", "w8a8", "w8a8q", "int8q") else 1)
    if transposed:
        # packed is [kp/8, np] (packing.pack_int4_transposed) or [kp, np]
        # int8 (pack_int8_transposed); lut arrives TRANSPOSED [16, np]
        # (any4t) or [16, 1] (lut4t global codebook)
        np_full = packed.shape[1]
        kp = packed.shape[0] * k_per_trow
    else:
        np_full = packed.shape[0] * rows_per_word
        kp = packed.shape[1] * word_k
    n = np_full if n is None else n

    # a sharded (row-parallel) weight may carry a partial PACK_BLOCK of k;
    # zero-pad back to alignment (codes 0 + scales 0 reconstruct to 0.0)
    kpa = _round_up(kp, PACK_BLOCK)
    if kpa != kp:
        if transposed:
            packed = jnp.pad(packed, ((0, (kpa - kp) // k_per_trow),
                                      (0, 0)))
        else:
            wordpad = (kpa - kp) // word_k
            packed = jnp.pad(packed, ((0, 0), (0, wordpad)))
        ge = min(group_size, kpa)
        rows_target = kpa // ge
        rowpad = rows_target - scales_t.shape[0]
        scales_t = jnp.pad(scales_t, ((0, rowpad), (0, 0)))
        zeros_t = jnp.pad(zeros_t, ((0, rowpad), (0, 0)))
        kp = kpa

    # m <= 16 runs as a full-dim (sub-tile) block with NO padding: on the
    # decode hot path (m=1) the wrapper then adds zero extra device ops
    # around the single pallas dispatch
    mp = m if m <= 16 else _round_up(m, 16)
    bn = min(block_n, _round_up(np_full, 128))
    npad = _round_up(np_full, bn)

    if x2.shape[1] != kp:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    if npad != np_full:
        pad_n = npad - np_full
        if transposed:
            packed = jnp.pad(packed, ((0, 0), (0, pad_n)))
        else:
            packed = jnp.pad(packed, ((0, pad_n // rows_per_word), (0, 0)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, pad_n)))
        zeros_t = jnp.pad(zeros_t, ((0, 0), (0, pad_n)))
        if lut is not None and not transposed and lut.shape[0] == np_full:
            lut = jnp.pad(lut, ((0, pad_n), (0, 0)))
        if lut is not None and transposed and lut.shape[1] == np_full:
            lut = jnp.pad(lut, ((0, 0), (0, pad_n)))

    y = quantized_matmul_padded(
        x2, packed, scales_t, zeros_t, lut, fmt=fmt, group_size=group_size,
        n=n, block_n=bn, out_dtype=out_dtype, use_gather=use_gather,
        interpret=interpret, k_chunk=k_chunk)
    return y[:m].reshape(*orig_shape[:-1], n)
