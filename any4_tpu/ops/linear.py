"""Quantized tensor container and the `linear` dispatch API.

The reference wraps packed weights in nn.Module subclasses
(Int4Linear/Int8Linear/Any4Linear, modules.py:12-230) that dispatch on a
kernel-name string. TPU-natively, a quantized weight is a *pytree leaf
bundle* (:class:`QuantizedTensor`) carried inside the model's parameter tree,
and :func:`linear` is a functional op that dispatches between the fused
Pallas GEMV kernel (decode, small m) and dequantize-then-XLA-matmul
(prefill, large m), the analog of the reference's m<=16 kernel validity rule
(tinygemm_lib/functional.py:10-18). The int8-MXU formats (w4a8/w8a8) never
dequantize: every m runs the fused kernel, chunked over m at prefill.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp

from . import packing, quant
from .formats import get_table
from .pallas import gemv

# formats whose packed codes are 4-bit planar words
_NIBBLE_FMTS = ("int4", "any4", "nf4", "fp4", "mx4")
# transposed (k-on-sublanes) packings: the sublane-gather LUT kernels plus
# the natural-orientation int8 kernels (packed axis 0 carries k, axis 1 n)
TRANSPOSED_FMTS = ("any4t", "nf4t", "fp4t", "w8a8t", "int8t")
# transposed formats whose packed array is int8 [kp, n] (one k per row)
_T_INT8_FMTS = ("w8a8t", "int8t")
# quad-word int8 formats: packed [n/4, kp] int32, four rows' bytes per
# word, in-kernel bitcast (the w4a8 mechanics on full bytes) -- the
# best PALLAS int8-weight layout (lab_int8b_r4.json), kept addressable;
# superseded as default by the XLA-dot grouped layout below
_QUAD8_FMTS = ("w8a8q", "int8q", "any4q8")
# grouped XLA-dot int8 formats (round 5): packed [kp/128, n, 128] int8,
# one batched int8 dot -> per-group int32 partials + two small affine
# einsums. Mosaic DMA stages weight bytes at ~250-280 GB/s no matter how
# the pipeline is built (even pure-DMA rings; lab_staging_r5.json) while
# XLA's own dot streams them at ~654 GB/s -- so the int8-weight formats
# ride XLA, not Pallas. Numerics identical to the quad kernels.
_GROUPED_FMTS = ("w8a8g", "int8g", "any4q8g")
# per-ROW-scale int8 formats: packed [n, k] int8 plain, scales [1, n].
# One full-k dot + a rank-1 affine -- no per-group partials, so the
# grouped path's [G, m, n] materialization cost disappears and m=1
# decode runs at the plain-dot 25.7 us (1.80x bf16). Accuracy: 8-bit
# per-channel (w8a8r/int8r, the standard per-channel int8 story) or the
# any4 per-row LUT learned on row-normalized weights (any4q8r) --
# any4's learned codebook is exactly the format whose quality survives
# whole-row grouping (BASELINE.md group-size table: any4 degrades 2.8%
# from g=128 to g=1024 where fp4/nf4 explode).
_ROWSCALE_FMTS = ("w8a8r", "int8r", "any4q8r")
# largest m for the grouped XLA formulation: the [G, m, n] int32 partial
# tensor scales with m (134 MB at m=256, 4096^2 -- measured collapse in
# lab_xla8_r5.json m_sweep); above this the dequantize-then-matmul path
# wins. Per-row formats never materialize partials and take every m.
_XLA_GROUPED_M_MAX = 128
# m-tile of the fused GEMV kernel: calls at m <= FUSED_M_MAX run as one
# dispatch, larger m is CHUNKED through the same kernel in FUSED_M_MAX
# tiles (round 5; previously large m dequantized, which is what made
# m=3968 engine prefills collapse the long-context A/Bs). Measured on
# hardware (tools/tune_m.py, benchmarks/tune_m_{int4p,any4}_4096.json):
# the kernel's cost is dominated by per-weight-element dequant work, so
# it is FLAT in m until the MXU dots catch up (int4p 29 us/layer at
# m=1..64, 63 us at m=256; any4 153-171 us through m=512), while the
# dequantize-then-matmul path pays the dense reconstruction every call
# (int4p ~600 us, any4 275-640 us after the select-chain fix). Passing
# fused_m_max=0 to :func:`linear` selects dequantize-then-matmul (kept
# addressable for measurement).
FUSED_M_MAX = 512
# m-chunk for int8-MXU (w4a8/w8a8) prefill through the fused kernel.
# Each chunk re-streams the packed weights, so a long prefill pays
# ceil(m/tile) weight reads: the tile is as large as the VMEM budget
# allows for the shape (x [tile, kp] int8 + [tile, block_n] f32
# accumulator + the weight block inside ~16 MB). Round 4 used a flat
# 256 (the m=3968 engine prefills read the weights 16x -- the
# long-context collapse, VERDICT r4 #3); 1024 at k <= 4096 cuts that
# to 4x.
_INT8_M_TILE = 512      # conservative flat tile (large-k shapes)


def _int8_m_tile(k: int) -> int:
    return 1024 if k <= 4096 else _INT8_M_TILE


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """A quantized 2-D weight ``[n, k]`` in TPU packed layout.

    Fields (all device arrays):
      packed: ``[n, kp/8] int32`` planar nibbles (4-bit fmts) or
              ``[n, kp] int8`` (int8).
      scales: ``[kp/g, n] f32`` transposed group scales, matching the
              reference's scales_and_zeros layout (tinygemm_lib/
              utils.py:53-65) and the kernel's block tiling (for mx4 these
              are the decoded e8m0 scales)
      zeros:  ``[kp/g, n] f32`` zeros of the affine reconstruction (0 for
              absmax formats)
      lut:    ``[n, 16]`` centered per-row LUT (any4), ``[1, 16]`` global
              table (nf4/fp4/mx4), or None (int4/int8). Reconstruction is
              ``lut[code] * scale + zero`` -- for any4 the stored LUT is
              pre-centered (``lut - 8``), matching the reference module
              convention (quantize.py:893).
    """
    packed: jax.Array
    scales: jax.Array
    zeros: jax.Array
    lut: Optional[jax.Array]
    fmt: str = field(metadata=dict(static=True), default="int4")
    group_size: int = field(metadata=dict(static=True), default=128)
    shape: tuple = field(metadata=dict(static=True), default=())
    dtype: jnp.dtype = field(metadata=dict(static=True), default=jnp.bfloat16)
    # number of independently-packed contiguous k-shards (row-parallel TP):
    # each shard's k-range is padded to the pack block on its own, so array
    # sharding along the packed axis splits at logical k boundaries
    row_shards: int = field(metadata=dict(static=True), default=1)

    def tree_flatten(self):
        children = (self.packed, self.scales, self.zeros, self.lut)
        aux = (self.fmt, self.group_size, self.shape, self.dtype,
               self.row_shards)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scales, zeros, lut = children
        fmt, group_size, shape, dtype, row_shards = aux
        return cls(packed, scales, zeros, lut, fmt, group_size, shape, dtype,
                   row_shards)

    @property
    def nbytes(self) -> int:
        tot = sum(int(a.size) * a.dtype.itemsize
                  for a in (self.packed, self.scales, self.zeros)
                  if a is not None)
        if self.lut is not None:
            tot += int(self.lut.size) * self.lut.dtype.itemsize
        return tot


def quantize_tensor(w: jax.Array, fmt: str = "any4", group_size: int = 128,
                    row_shards: int = 1, **kwargs) -> QuantizedTensor:
    """Quantize a 2-D weight ``[n, k]`` into TPU packed layout.

    ``kwargs`` are forwarded to the any4 learner for ``fmt="any4"``
    (sample_weight, init, keep_outliers, ...). ``row_shards`` packs the k
    axis as that many independently-padded contiguous shards (for
    row-parallel TP; see packing.pack_int4).

    The per-element-LUT formats (any4/nf4/fp4) DEFAULT to the transposed
    sublane-gather packing whenever the group size is plane-constant
    (multiple of 128) -- identical numbers, ~2.2x faster decode kernel
    (benchmarks/lab_any4_r3.json; the reference's in-register ``__shfl``
    LUT is likewise its default any4 path, Dequantization.cuh:93-131).
    ``layout="row"`` forces the row-major planar packing (needed for row
    gathers, e.g. quantized embedding tables).
    """
    from ..quant import anyq  # local import to avoid cycle
    import numpy as _np

    layout = kwargs.pop("layout", None)
    assert layout in (None, "row", "transposed"), \
        f"layout must be None/'row'/'transposed', got {layout!r}"
    n, k = w.shape
    if group_size <= 0 or group_size > k:
        # whole-row grouping when the layer is narrower than the group
        group_size = k
    if fmt in ("any4", "nf4", "fp4") and layout != "row" \
            and group_size % 128 == 0:
        fmt = fmt + "t"     # default to the fast transposed layout
    if fmt == "int4" and layout != "row" and group_size % 128 == 0 \
            and n % 2 == 0:
        # uniform int4 defaults to the pair-packed magic-number layout:
        # identical numbers (same group quantization), gather-free kernel
        # at 29 vs the planar gather path's 134 us/layer at 4096^2 m=1
        # (PERF_NOTES round-2 design matrix; the round-4 any4->any4t
        # precedent, VERDICT r4 #8). Row-major planar remains for
        # embeddings (layout="row"), g % 128 != 0 and odd n.
        fmt = "int4p"
    if fmt in ("w8a8", "int8", "any4q8") and layout != "row" \
            and group_size % 128 == 0:
        # int8-weight routing is k-DEPENDENT (round 5, both measured):
        # - k >= 4096: the GROUPED XLA-dot layout. Mosaic stages weight
        #   bytes at ~250-280 GB/s however the DMA is pipelined while
        #   XLA's own int8 dot streams them at ~654 GB/s, so large
        #   blocks move 59.8 -> 25.8-37.4 us/layer at 4096^2 m<=64 with
        #   numerics IDENTICAL to the quad kernels (lab_staging_r5,
        #   lab_xla8_r5).
        # - k < 4096: the quad-word Pallas kernel. Small per-layer
        #   blocks sit at their HBM floor already and the grouped
        #   path's affine einsums cost more than they save (1B e2e
        #   any4q8: quad 595 tok/s vs grouped 421;
        #   bench_decode_1b_any4q8_qemb_r{4,5}).
        # Row-major remains for embeddings (layout="row") and
        # g % 128 != 0; all layouts stay explicitly addressable.
        if k >= 4096 or n % 4 != 0:
            fmt = {"w8a8": "w8a8g", "int8": "int8g",
                   "any4q8": "any4q8g"}[fmt]
        elif fmt != "any4q8":
            fmt = {"w8a8": "w8a8q", "int8": "int8q"}[fmt]
    host_input = isinstance(w, _np.ndarray)
    int_zeros = bool(kwargs.pop("int_zeros", False))
    assert not int_zeros or fmt in ("int4", "int4p", "int8", "int8p",
                                    "w4a8", "w8a8", "w8a8t", "int8t",
                                    "w8a8g", "int8g"), \
        f"int_zeros (group_q1/new_grouping) applies to int formats, not {fmt!r}"
    if fmt in ("int4", "int4p") and host_input and k % group_size == 0 \
            and not int_zeros and not kwargs.get("scale_only", False):
        # host-side (checkpoint-conversion) fast path: the C++/OpenMP data
        # plane quantizes (and for the planar layout packs) without a
        # device round trip (the analog of the reference's host conversion
        # stage, TinyGemmConvertB.cu:21-466)
        from .. import native
        if native.available():
            codes_n, scales_n, zeros_n = native.group_quantize(
                _np.asarray(w, _np.float32), 4, group_size)
            if fmt == "int4p":
                packed_n = packing.pack_int4_pair(jnp.asarray(codes_n),
                                                  row_shards)
            else:
                packed_n = jnp.asarray(native.pack_int4(codes_n, row_shards))
            scales, zeros = packing.pad_group_arrays(
                jnp.asarray(scales_n), jnp.asarray(zeros_n), k, group_size,
                row_shards)
            return QuantizedTensor(
                packed_n, scales.T.astype(jnp.float32),
                zeros.T.astype(jnp.float32), None, fmt, group_size, (n, k),
                jnp.dtype(w.dtype), row_shards)
    if host_input:
        w = jnp.asarray(w)
    symmetric = bool(kwargs.pop("scale_only", False))
    assert not symmetric or fmt in ("int4", "int4p", "int8", "int8p",
                                    "w4a8", "w8a8", "w8a8t", "int8t",
                                    "w8a8g", "int8g", "w8a8r", "int8r",
                                    "any4", "any4t", "any4q8", "any4q8g",
                                    "any4q8r"), \
        f"scale_only (symmetric) applies to int/any4 formats, not {fmt!r}"
    if fmt == "int4":
        codes, scales, zeros = quant.group_quantize(
            w, 4, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int4(codes, row_shards)
        lut = None
    elif fmt == "w4a8":
        # int4 weights (same codes/scales as fmt="int4") quad-packed for
        # the int8-MXU kernel; activations are quantized per row to int8
        # at matmul time (ops.linear.quantize_activations) -- the
        # throughput play on top of int4's memory win
        assert group_size % 128 == 0, \
            "w4a8 requires group_size a multiple of 128"
        assert n % 4 == 0, "w4a8 quad packing requires n % 4 == 0"
        codes, scales, zeros = quant.group_quantize(
            w, 4, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int4_quad(codes, row_shards)
        lut = None
    elif fmt == "w8a8":
        # centered int8 codes ARE the kernel operand (no unpack); the
        # int8-MXU kernel computes q-dots with post-dot (s, z) affines.
        # (Row-major variant -- reached via layout="row"; the default is
        # the transposed w8a8t below.)
        assert group_size % 128 == 0, \
            "w8a8 requires group_size a multiple of 128"
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int8(q, row_shards)
        lut = None
    elif fmt in ("w8a8t", "int8t"):
        # transposed (natural MXU orientation) int8: same numbers as
        # w8a8/int8, codes stored [kp, n]. Kept addressable for
        # measurement; the quad layout below measured faster
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int8_transposed(q, row_shards)
        lut = None
    elif fmt in ("w8a8q", "int8q"):
        # quad-word int8 (the best PALLAS layout; the grouped XLA layout
        # below superseded it as default): four rows' bytes per int32
        # word, in-kernel bitcast to a [bn, 128] int8 tile with zero
        # vector ops (w4a8's mechanics on full bytes)
        assert group_size % 128 == 0, \
            f"{fmt} requires group_size a multiple of 128"
        assert n % 4 == 0, f"{fmt} quad packing requires n % 4 == 0"
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int8_quad(q, row_shards)
        lut = None
    elif fmt in ("w8a8g", "int8g"):
        # grouped XLA-dot int8 (the production int8-weight default):
        # same numbers as w8a8/int8, codes stored [kp/128, n, 128] for
        # the batched int8 dot_general (see packing.pack_int8_grouped)
        assert group_size % 128 == 0, \
            f"{fmt} requires group_size a multiple of 128"
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int8_grouped(q, row_shards)
        lut = None
    elif fmt in ("w8a8r", "int8r"):
        # per-ROW-scale int8 on the plain XLA dot: one full-k
        # contraction + a rank-1 affine (the standard per-channel int8
        # quantization; scales [1, n])
        q, scales, zeros = quant.int8_quantize(
            w, k, symmetric=symmetric, int_zeros=int_zeros)
        return QuantizedTensor(
            packing.pack_rowscale(q, row_shards),
            scales.T.astype(jnp.float32), zeros.T.astype(jnp.float32),
            None, fmt, k, (n, k), w.dtype, row_shards)
    elif fmt == "any4q8r":
        # any4's learned per-row LUT at WHOLE-ROW grouping, snapped to
        # an int8 grid: reconstruction lut8[c] * s_row + z_row is a
        # plain int8 dot + rank-1 affine -- m=1 decode at the full
        # XLA-dot rate (~25.7 us at 4096^2 = 1.80x bf16) with the one
        # 4-bit-born format whose accuracy survives large groups
        # (BASELINE.md group-size ablation: any4 14.34 at g=1024 vs
        # 13.95 at g=128 while fp4/nf4 blow up to 1e5-1e6)
        codes, lut01, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=k, scale_only=symmetric, **kwargs)
        lutc = (lut01 - 8.0).astype(jnp.float32)
        sr = jnp.maximum(jnp.max(jnp.abs(lutc), axis=1, keepdims=True),
                         1e-12) / 127.0
        lut8 = jnp.clip(jnp.round(lutc / sr), -127.0,
                        127.0).astype(jnp.int8)
        if lut8.shape[0] == 1:
            lut8 = jnp.broadcast_to(lut8, (n, 16))
            sr = jnp.broadcast_to(sr, (n, 1))
        q8 = jnp.take_along_axis(lut8, codes.astype(jnp.int32), axis=1)
        return QuantizedTensor(
            packing.pack_rowscale(q8, row_shards),
            (scales * sr).T.astype(jnp.float32),
            zeros.T.astype(jnp.float32), None, fmt, k, (n, k), w.dtype,
            row_shards)
    elif fmt in ("any4q8", "any4q8g"):
        # any4 accuracy on the w8a8t kernel: the learned per-row LUT is
        # snapped to an int8 grid (error <= |lut|_max/254 of the row
        # scale) and the CODES ARE MATERIALIZED as int8 at pack time --
        # recon lut[c]*s + z == lut8[c]*(s*sr) + z, so the row scale
        # folds into the group scales and the runtime is exactly the
        # quad int8-MXU path (8 bits/weight instead of 4.25: a
        # speed/memory tradeoff point between any4t and w4a8 -- VERDICT
        # r3 next #3's "unexplored any4-q8 design")
        assert group_size % 128 == 0, \
            "any4q8 requires group_size a multiple of 128"
        codes, lut01, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=group_size, scale_only=symmetric,
            **kwargs)
        lutc = (lut01 - 8.0).astype(jnp.float32)         # [n|1, 16]
        sr = jnp.maximum(jnp.max(jnp.abs(lutc), axis=1, keepdims=True),
                         1e-12) / 127.0                  # [n|1, 1]
        lut8 = jnp.clip(jnp.round(lutc / sr), -127.0,
                        127.0).astype(jnp.int8)
        if lut8.shape[0] == 1:                           # global LUT
            lut8 = jnp.broadcast_to(lut8, (n, 16))
            sr = jnp.broadcast_to(sr, (n, 1))
        q8 = jnp.take_along_axis(lut8, codes.astype(jnp.int32), axis=1)
        if fmt == "any4q8g":
            packed = packing.pack_int8_grouped(q8, row_shards)
        else:
            assert n % 4 == 0, "any4q8 quad packing requires n % 4 == 0"
            packed = packing.pack_int8_quad(q8, row_shards)
        scales = scales * sr                             # fold row scale
        lut = None
    elif fmt == "int4p":
        # pair-packed int4 for the magic-number (gather-free) kernel;
        # identical numbers to fmt="int4", different word layout
        assert group_size % 128 == 0, \
            "int4p requires group_size a multiple of 128"
        codes, scales, zeros = quant.group_quantize(
            w, 4, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int4_pair(codes, row_shards)
        lut = None
    elif fmt == "any4":
        codes, lut01, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=group_size, scale_only=symmetric,
            **kwargs)
        packed = packing.pack_int4(codes, row_shards)
        lut = (lut01 - 8.0).astype(jnp.float32)  # centered storage
    elif fmt == "any4t":
        # identical NUMBERS to fmt="any4" (same learner, same LUT/codes)
        # in the transposed k-on-sublanes packing whose kernel gathers the
        # codebook along the sublane dimension -- measured 119 -> 52
        # us/layer at 4096^2 m=1 (benchmarks/lab_any4_r3.json); the
        # production any4 deployment format. LUT stored TRANSPOSED
        # [16, n] to match the kernel's lane-blocked table spec.
        if group_size % 128 != 0:
            # sub-128 groups (e.g. a layer narrower than one lane tile)
            # have no plane-constant affine for the transposed post-dot
            # epilogue: fall back to the row-major packing -- same
            # numbers, fused-table kernel
            return quantize_tensor(w, "any4", group_size,
                                   row_shards=row_shards,
                                   scale_only=symmetric, **kwargs)
        codes, lut01, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=group_size, scale_only=symmetric,
            **kwargs)
        packed = packing.pack_int4_transposed(codes, row_shards)
        lut = (lut01.T - 8.0).astype(jnp.float32)      # [16, n] centered
    elif fmt in ("nf4", "fp4"):
        codes, scales = quant.lut_quantize(w, fmt, group_size)
        packed = packing.pack_int4(codes, row_shards)
        zeros = jnp.zeros_like(scales)
        lut = jnp.asarray(get_table(fmt))[None, :]
    elif fmt in ("nf4t", "fp4t"):
        # nf4/fp4 numbers in the transposed sublane-gather packing (the
        # any4t layout with the global codebook; kernel fmt "lut4t")
        base = fmt[:-1]
        if group_size % 128 != 0:
            return quantize_tensor(w, base, group_size,
                                   row_shards=row_shards, **kwargs)
        codes, scales = quant.lut_quantize(w, base, group_size)
        packed = packing.pack_int4_transposed(codes, row_shards)
        zeros = jnp.zeros_like(scales)
        lut = jnp.asarray(get_table(base))[None, :].T      # [16, 1]
    elif fmt == "mx4":
        codes, exps = quant.mx4_quantize(w, group_size)
        packed = packing.pack_int4(codes, row_shards)
        scales = quant.mx4_scales(exps)
        zeros = jnp.zeros_like(scales)
        lut = jnp.asarray(get_table("mx4"))[None, :]
    elif fmt == "int8":
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        packed = packing.pack_int8(q, row_shards)
        lut = None
    elif fmt == "int8p":
        # MEASUREMENT-ONLY layout (never a routed default): loses to the
        # quad-word int8q/w8a8q at every measured shape (75 vs 60-62
        # us/layer at 4096^2 m=1, lab_int8_r4.json); kept addressable so
        # the design-matrix numbers stay reproducible.
        # split-byte magic-number int8: each byte u = 16*hi + lo becomes
        # two group-interleaved nibble planes with scales (s, 16*s), so
        # the gather-free pair-packed kernel computes the int8 dot as two
        # magic dots per group -- same numbers as fmt="int8", same bytes
        assert group_size % 128 == 0, \
            "int8p requires group_size a multiple of 128"
        assert row_shards == 1, "int8p does not support row_shards yet"
        assert k % 128 == 0, "int8p requires k a multiple of 128"
        q, scales, zeros = quant.int8_quantize(
            w, group_size, symmetric=symmetric, int_zeros=int_zeros)
        u = (q.astype(jnp.int32) + 128).astype(jnp.uint8)
        G = k // 128
        u = u.reshape(n, G, 128)
        c4 = jnp.stack([u & 0xF, u >> 4], axis=2)      # [n, G, 2, 128]
        packed = packing.pack_int4_pair(c4.reshape(n, 2 * k))
        # per-128-lane plane rows on the doubled axis: (lo: s, z-120s),
        # (hi: 16s, 128s) -- derived so the kernel's per-plane affine
        # P*sg + sum(x_g)*(zg - 136*sg) sums to (u-128)*s + z exactly
        s128 = jnp.repeat(scales, group_size // 128, axis=1)  # [n, G]
        z128 = jnp.repeat(zeros, group_size // 128, axis=1)
        # constants are per-chunk-uniform so they sum over a group's chunks
        # as coef*sum(x_g); solve z_lo + z_hi - 136 s = z - 128 s
        z_lo = z128 - 120.0 * s128
        z_hi = 128.0 * s128
        s4 = jnp.stack([s128, 16.0 * s128], axis=2).reshape(n, 2 * G)
        z4 = jnp.stack([z_lo, z_hi], axis=2).reshape(n, 2 * G)
        s4, z4 = packing.pad_group_arrays(s4, z4, 2 * k, 128)
        return QuantizedTensor(packed, s4.T.astype(jnp.float32),
                               z4.T.astype(jnp.float32), None, fmt,
                               group_size, (n, k), w.dtype, 1)
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")
    scales, zeros = packing.pad_group_arrays(scales, zeros, k, group_size,
                                             row_shards)
    return QuantizedTensor(packed, scales.T.astype(jnp.float32),
                           zeros.T.astype(jnp.float32), lut, fmt, group_size,
                           (n, k), w.dtype, row_shards)


def dequantize_tensor(qt: QuantizedTensor, dtype=None) -> jax.Array:
    """Reconstruct the dense weight ``[n, k]`` (debug path + prefill path;
    the analog of tinygemm's `tinygemm_dequant_int4`,
    TinyGemmDequantize.cu:19-58)."""
    from dataclasses import replace as _replace
    if qt.fmt in _ROWSCALE_FMTS:
        # [k(_local), n(_local)] int8 + per-row affine; unpadded, so
        # shard-local leaves reconstruct with the same expression
        dtype = dtype or qt.dtype
        s = qt.scales.T          # [n_local, 1]
        z = qt.zeros.T
        return (qt.packed.T.astype(jnp.float32) * s + z).astype(dtype)
    if qt.fmt in _GROUPED_FMTS:
        dtype = dtype or qt.dtype
        n, k = qt.shape
        S = qt.row_shards
        if S > 1:
            shard_groups = packing.padded_k(k // S) // packing.LANES
            if qt.packed.shape[0] == shard_groups:
                # live shard_map leaf: one k-shard, full static metadata
                sub = _replace(qt, shape=(n, k // S), row_shards=1)
                return dequantize_tensor(sub, dtype)
            rowper = qt.scales.shape[0] // S
            parts = []
            for s_ in range(S):
                sub = _replace(
                    qt,
                    packed=qt.packed[s_ * shard_groups:
                                     (s_ + 1) * shard_groups],
                    scales=qt.scales[s_ * rowper:(s_ + 1) * rowper],
                    zeros=qt.zeros[s_ * rowper:(s_ + 1) * rowper],
                    shape=(n, k // S), row_shards=1)
                parts.append(dequantize_tensor(sub, dtype))
            return jnp.concatenate(parts, axis=1)
        n_local = qt.packed.shape[1]
        kp = qt.packed.shape[0] * packing.LANES
        q = packing.unpack_int8_grouped(qt.packed, kp).astype(jnp.float32)
        g = min(qt.group_size, kp)
        scales = jnp.repeat(qt.scales.T, g, axis=1)[:, :kp]
        zeros = jnp.repeat(qt.zeros.T, g, axis=1)[:, :kp]
        w = q * scales + zeros
        return w[:, :min(k, kp)].astype(dtype)
    transposed = qt.fmt in TRANSPOSED_FMTS
    k_axis = 0 if transposed else 1   # packed axis carrying (packed) k
    if qt.row_shards > 1:
        S = qt.row_shards
        n, k = qt.shape
        denom = 1 if qt.fmt in _T_INT8_FMTS else \
            8 if qt.fmt in _NIBBLE_FMTS or transposed else \
            4 if qt.fmt == "int4p" else 2 if qt.fmt == "w4a8" else 1
        shard_words = packing.padded_k(k // S) // denom
        if qt.packed.shape[k_axis] == shard_words:
            # live leaf holds ONE k-shard (inside shard_map the static
            # metadata still describes the full logical tensor): dequantize
            # it as a standalone single-shard weight
            sub = _replace(qt, shape=(n, k // S), row_shards=1)
            return dequantize_tensor(sub, dtype)
        wordper = qt.packed.shape[k_axis] // S
        rowper = qt.scales.shape[0] // S
        parts = []
        for s_ in range(S):
            pk = (qt.packed[s_ * wordper:(s_ + 1) * wordper] if transposed
                  else qt.packed[:, s_ * wordper:(s_ + 1) * wordper])
            sub = _replace(
                qt,
                packed=pk,
                scales=qt.scales[s_ * rowper:(s_ + 1) * rowper],
                zeros=qt.zeros[s_ * rowper:(s_ + 1) * rowper],
                shape=(n, k // S), row_shards=1)
            parts.append(dequantize_tensor(sub, dtype))
        return jnp.concatenate(parts, axis=1)
    n, k = qt.shape
    dtype = dtype or qt.dtype
    kp = qt.packed.shape[k_axis] * (
        1 if qt.fmt in _T_INT8_FMTS else
        8 if qt.fmt in _NIBBLE_FMTS or transposed else
        4 if qt.fmt in ("int4p", "int8p") else
        2 if qt.fmt == "w4a8" else 1)
    g = qt.group_size
    if qt.fmt == "int8p":
        # split-byte layout: de-interleave nibble planes, reassemble bytes
        # and recover the original (s, z) from the plane-transformed rows
        c4 = packing.unpack_int4_pair(qt.packed, kp).astype(jnp.int32)
        Gp = kp // 256
        c4 = c4.reshape(n, Gp, 2, 128)
        u = c4[:, :, 0] + 16 * c4[:, :, 1]            # [n, Gp, 128]
        q = (u - 128).astype(jnp.float32).reshape(n, Gp * 128)
        s128 = qt.scales[0::2].T                      # [n, Gp] (s rows)
        z128 = qt.zeros[0::2].T + 120.0 * s128        # z_lo = z - 120 s
        w = q * jnp.repeat(s128, 128, axis=1) \
            + jnp.repeat(z128, 128, axis=1)
        return w[:, :k].astype(dtype)
    if qt.fmt in ("int8", "w8a8"):
        q = qt.packed.astype(jnp.float32)
    elif qt.fmt in _T_INT8_FMTS:
        q = qt.packed.T.astype(jnp.float32)       # [n, kp]
    elif qt.fmt in _QUAD8_FMTS:
        q = packing.unpack_int8_quad(qt.packed, kp).astype(jnp.float32)
    else:
        if qt.fmt == "int4p":
            codes = packing.unpack_int4_pair(qt.packed, kp).astype(jnp.int32)
        elif qt.fmt == "w4a8":
            codes = packing.unpack_int4_quad(qt.packed, kp).astype(jnp.int32)
        elif transposed:
            codes = packing.unpack_int4_transposed(
                qt.packed, kp).astype(jnp.int32)
        else:
            codes = packing.unpack_int4(qt.packed, kp).astype(jnp.int32)
        if qt.fmt in ("int4", "int4p", "w4a8"):
            q = (codes - 8).astype(jnp.float32)
        else:
            # LUT lookup as 16 fused compare-selects: an XLA gather here
            # (take_along_axis) measured ~196 ms for a 4096^2 weight on
            # TPU vs ~0.3 ms for the select chain (benchmarks/
            # tune_m_any4_4096.json drove this); bit-exact either way
            lut = qt.lut.astype(jnp.float32)
            if transposed:          # any4t stores the LUT as [16, n]
                lut = lut.T if lut.shape[1] == n else \
                    jnp.broadcast_to(lut.T, (n, 16))
            elif lut.shape[0] == 1:  # global table (nf4/fp4/mx4/global-any4)
                lut = jnp.broadcast_to(lut, (n, 16))
            q = jnp.zeros(codes.shape, jnp.float32)
            for c in range(16):
                q = q + jnp.where(codes == c, lut[:, c:c + 1], 0.0)
    scales = jnp.repeat(qt.scales.T, g, axis=1)[:, :kp]
    zeros = jnp.repeat(qt.zeros.T, g, axis=1)[:, :kp]
    w = q * scales + zeros
    return w[:, :k].astype(dtype)


# formats a quantized *embedding table* may use: the row gather needs one
# logical row per packed row (int4p/w4a8 interleave 2/4 rows per int32
# word; int8p splits bytes across group-interleaved planes)
EMBED_FMTS = _NIBBLE_FMTS + ("int8", "w8a8")


def embedding_lookup(qt: QuantizedTensor, ids: jax.Array) -> jax.Array:
    """Gather + dequantize rows of a quantized embedding table.

    The reference never quantizes embeddings (its tinygemm is a linear-
    layer kernel); on TPU a quantized *tied* embedding pays twice: the
    lm_head matmul reads half (w8a8) or a quarter (4-bit) of the bf16
    bytes at decode, and the token lookup is a cheap row gather + affine
    over ``[batch, k]`` -- so the big vocab table stops being the largest
    bf16 buffer in a quantized checkpoint. Rows are gathered from the
    packed codes and reconstructed exactly like
    :func:`dequantize_tensor` on the sub-table.
    """
    assert qt.row_shards == 1, "embedding tables are not row-sharded"
    assert qt.fmt in EMBED_FMTS, \
        f"embedding lookup needs row-gatherable packing; fmt {qt.fmt!r} " \
        f"packs multiple rows per word (use one of {EMBED_FMTS})"
    n, k = qt.shape
    flat = ids.reshape(-1)
    sub = replace(
        qt,
        packed=jnp.take(qt.packed, flat, axis=0),
        scales=jnp.take(qt.scales, flat, axis=1),
        zeros=jnp.take(qt.zeros, flat, axis=1),
        lut=(jnp.take(qt.lut, flat, axis=0)
             if qt.lut is not None and qt.lut.shape[0] == n else qt.lut),
        shape=(int(flat.shape[0]), k))
    w = dequantize_tensor(sub)
    return w.reshape(*ids.shape, k)


def embed(w, ids: jax.Array, dtype=None) -> jax.Array:
    """Token-embedding lookup over a dense or quantized table."""
    if isinstance(w, QuantizedTensor):
        x = embedding_lookup(w, ids)
    else:
        x = jnp.take(w, ids, axis=0)
    return x if dtype is None else x.astype(dtype)


def quantize_activations(x: jax.Array, eps: float = gemv.ACT_EPS):
    """Per-row absmax int8 activation quantization for the w4a8/w8a8
    int8-MXU kernels: ``x ~= xq * sx`` with ``xq`` int8 in [-127, 127] and
    ``sx = absmax/127`` per leading row. Under row-parallel TP each shard
    quantizes its local k-slice independently (a finer-grained, equally
    valid activation grouping -- each shard's partial is scaled by its own
    ``sx`` before the psum). At decode-shaped m the kernels fuse this step
    into their prologue (gemv._w4a8f_kernel) with identical math; this
    external path serves prefill (m-chunked) and the test references.
    Returns ``(xq int8, sx f32[..., 1])``."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     eps) / gemv.ACT_QMAX
    xq = jnp.clip(jnp.round(xf / sx), -gemv.ACT_QMAX,
                  gemv.ACT_QMAX).astype(jnp.int8)
    return xq, sx


def _xla_rowscale_linear(x: jax.Array, w: QuantizedTensor) -> jax.Array:
    """Per-row-scale int8 linear on the plain XLA dot (w8a8r/int8r/
    any4q8r): ``y = (x . W8) * s_n + sum(x) * z_n`` -- one full-k
    contraction at XLA's streaming rate plus a rank-1 affine. Works at
    every m (no per-group partials to materialize). The weight is
    stored ``[k, n]`` so the contraction is in natural orientation --
    the [n, k] dim-1 form makes XLA re-lay the operand out per scan
    step at large shapes (probe_rowscale_mem_r5)."""
    packed, s, z = w.packed, w.scales, w.zeros       # [k_l, n_l], [1, n_l]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    n_local = packed.shape[1]
    if w.fmt == "int8r":
        P = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), packed.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        xs = jnp.sum(x2.astype(jnp.float32), axis=1, keepdims=True)
        y = P * s + xs * z
    else:
        xq, sx = quantize_activations(x2)
        P = jax.lax.dot_general(
            xq, packed, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        xs = jnp.sum(xq.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        y = (P * s + xs * z) * sx
    return y.reshape(*lead, n_local).astype(x.dtype)


def _xla_grouped_linear(x: jax.Array, w: QuantizedTensor) -> jax.Array:
    """Grouped int8 linear on the batched XLA dot (w8a8g/int8g/any4q8g):
    codes [G, n, 128], one int8 dot_general -> [G, m, n] partials, the
    per-group affine folded by two small einsums. Exact w8a8/any4q8
    numerics (verified vs the quad kernel, lab_xla8_r5). Callers bound
    m at _XLA_GROUPED_M_MAX (the partial tensor scales with m)."""
    packed = w.packed                                 # [G, n_l, 128]
    G, n_local = packed.shape[0], packed.shape[1]
    kp = G * packing.LANES
    xa = _shard_align_x(x, w)
    lead = xa.shape[:-1]
    x2 = xa.reshape(-1, xa.shape[-1])
    if x2.shape[1] != kp:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - x2.shape[1])))
    m = x2.shape[0]
    s, z = w.scales, w.zeros                          # [kp/g, n_l]
    rep = G // s.shape[0]
    if rep > 1:                                       # g > 128
        s = jnp.repeat(s, rep, axis=0)
        z = jnp.repeat(z, rep, axis=0)
    if w.fmt == "int8g":
        xb = x2.astype(jnp.bfloat16).reshape(m, G, 128).transpose(1, 0, 2)
        P = jax.lax.dot_general(
            xb, packed.astype(jnp.bfloat16), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xb.astype(jnp.float32), axis=2)
        y = jnp.einsum("gmn,gn->mn", P, s) + jnp.einsum("gm,gn->mn", xs, z)
    else:
        xq, sx = quantize_activations(x2)
        xb = xq.reshape(m, G, 128).transpose(1, 0, 2)
        P = jax.lax.dot_general(
            xb, packed, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        xs = jnp.sum(xb.astype(jnp.int32), axis=2).astype(jnp.float32)
        y = jnp.einsum("gmn,gn->mn", P.astype(jnp.float32), s) \
            + jnp.einsum("gm,gn->mn", xs, z)
        y = y * sx
    return y.reshape(*lead, n_local).astype(x.dtype)


def _kernel_fmt(fmt: str, lut: Optional[jax.Array] = None) -> str:
    if fmt in ("nf4", "fp4", "mx4"):
        return "lut4"
    if fmt == "any4q8":
        # the LUT was materialized into int8 codes at pack time: runtime
        # IS the quad int8-MXU path
        return "w8a8q"
    if fmt == "int8p":
        # split-byte int8 runs on the pair-packed magic kernel with
        # plane-transformed scales (quantize_tensor folds them)
        return "int4p"
    if fmt == "any4" and lut is not None and lut.shape[0] == 1:
        # global-LUT any4 (reference `Any4_Global_Grouped`,
        # TinyGemm_int4.cu:622-746, selected by `int4Dequant.dim()`): the
        # kernel's per-row BlockSpec would misread a [1, 16] table, so this
        # variant runs on the shared-table kernel path like nf4/fp4
        return "lut4"
    if fmt in ("nf4t", "fp4t") or (
            fmt == "any4t" and lut is not None and lut.shape[1] == 1):
        return "lut4t"   # global codebook in the transposed layout
    return fmt


def _shard_align_x(x: jax.Array, w: QuantizedTensor) -> jax.Array:
    """Align activations to a multi-shard weight's per-shard k padding.

    A weight packed with ``row_shards=S`` holds S independently padded
    k-segments; when executing UNsharded (the live leaf carries all S
    segments) the activation k-axis must be split at logical shard
    boundaries and zero-padded per segment to match. Inside shard_map the
    live leaf is a single segment and x is the local k-slice: no-op.
    """
    S = w.row_shards
    if S > 1 and x.shape[-1] == w.shape[1]:
        kl = w.shape[1] // S
        kps = packing.padded_k(kl)
        xs = x.reshape(*x.shape[:-1], S, kl)
        xs = jnp.pad(xs, [(0, 0)] * (xs.ndim - 1) + [(0, kps - kl)])
        return xs.reshape(*x.shape[:-1], S * kps)
    return x


def linear(x: jax.Array, w, bias: Optional[jax.Array] = None, *,
           block_n: int = gemv.DEFAULT_BLOCK_N, use_gather: bool = True,
           fused_m_max: int = FUSED_M_MAX, k_chunk: Optional[int] = None,
           interpret: bool = False) -> jax.Array:
    """``y = x @ W^T + bias`` where ``w`` is dense or a QuantizedTensor."""
    if not isinstance(w, QuantizedTensor):
        y = jnp.einsum("...k,nk->...n", x, w.astype(x.dtype))
    else:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if w.fmt in _ROWSCALE_FMTS:
            y = _xla_rowscale_linear(x, w)
        elif w.fmt in _GROUPED_FMTS:
            if m <= _XLA_GROUPED_M_MAX:
                y = _xla_grouped_linear(x, w)
            else:
                # the [G, m, n] partials outgrow their usefulness
                # (lab_xla8_r5 m_sweep: 39.4 us at m=256 vs bf16 16.7);
                # big prefills dequantize (int8 dequant is a cheap
                # elementwise affine, unlike the 4-bit LUT select chain)
                wd = dequantize_tensor(w, dtype=x.dtype)
                y = jnp.einsum("...k,nk->...n", x, wd)
        elif w.fmt in ("w4a8", "w8a8", "w8a8t", "w8a8q", "any4q8"):
            # int8-MXU formats run the fused kernel at EVERY m: decode in
            # one dispatch, prefill chunked over m so the VMEM f32
            # accumulator block stays within budget. Unlike the bf16
            # formats there is no dequant fallback -- the packed int8/int4
            # codes are the MXU operand directly, and int8 dots run at
            # twice the bf16 MXU rate.
            xa = _shard_align_x(x, w)
            kfmt = _kernel_fmt(w.fmt)
            n_local = (w.packed.shape[1] if w.fmt in TRANSPOSED_FMTS else
                       w.packed.shape[0] *
                       (4 if w.fmt == "w4a8" or w.fmt in _QUAD8_FMTS
                        else 1))
            if m <= gemv.FUSED_ACT_M_MAX:
                # decode: the per-row absmax quantize and the y*sx
                # post-scale are fused into the kernel itself (float
                # input selects the fused-act variant) -- one dispatch,
                # no separate XLA ops (PERF_NOTES round 2d gap analysis)
                y = gemv.quantized_matmul(
                    xa, w.packed, w.scales, w.zeros, None, fmt=kfmt,
                    group_size=w.group_size, n=n_local, block_n=block_n,
                    out_dtype=x.dtype, interpret=interpret,
                    k_chunk=k_chunk)
            else:
                xq, sx = quantize_activations(xa)
                mm = functools.partial(
                    gemv.quantized_matmul, packed=w.packed,
                    scales_t=w.scales, zeros_t=w.zeros, lut=None,
                    fmt=kfmt, group_size=w.group_size, n=n_local,
                    block_n=block_n, out_dtype=jnp.float32,
                    interpret=interpret, k_chunk=k_chunk)
                tile = _int8_m_tile(w.shape[1])
                if m <= max(fused_m_max, tile):
                    y = mm(xq)
                else:
                    x2 = xq.reshape(-1, xq.shape[-1])
                    y = jnp.concatenate(
                        [mm(x2[i:i + tile])
                         for i in range(0, m, tile)]
                    ).reshape(*xq.shape[:-1], n_local)
                y = (y * sx).astype(x.dtype)
        elif fused_m_max > 0:
            xq = _shard_align_x(x, w)
            # n from the live array, not static metadata: inside shard_map
            # the leaves are local shards while .shape still describes the
            # full logical tensor
            gs = w.group_size
            if w.fmt == "int8p":
                # duplicate each 128-wide x group so both nibble planes of
                # a byte contract against the same activations
                k_log = w.shape[1]
                lead = xq.shape[:-1]
                xr = xq[..., :k_log].reshape(*lead, k_log // 128, 128)
                xq = jnp.repeat(xr, 2, axis=-2).reshape(*lead, 2 * k_log)
                gs = 128  # plane-granular scales on the doubled axis
            n_local = (w.packed.shape[1] if w.fmt in TRANSPOSED_FMTS else
                       w.packed.shape[0] *
                       (2 if w.fmt in ("int4p", "int8p") else
                        4 if w.fmt in _QUAD8_FMTS else 1))
            mm = functools.partial(
                gemv.quantized_matmul, packed=w.packed, scales_t=w.scales,
                zeros_t=w.zeros, lut=w.lut,
                fmt=_kernel_fmt(w.fmt, w.lut), group_size=gs,
                n=n_local, block_n=block_n, out_dtype=x.dtype,
                use_gather=use_gather, interpret=interpret,
                k_chunk=k_chunk)
            if m <= fused_m_max:
                y = mm(xq)
            else:
                # long-prompt prefill: chunk m through the fused kernel
                # (the int8-MXU formats' _INT8_M_TILE treatment applied to
                # the bf16-dot formats -- VERDICT r4 #3). The dequantize-
                # then-matmul alternative materializes the dense weight
                # per call (~600 us/layer at 4096^2, tune_m_int4p_4096)
                # and was what made m=3968 engine prefills collapse the
                # long-context A/Bs to 0.97-1.00x.
                x2 = xq.reshape(-1, xq.shape[-1])
                y = jnp.concatenate(
                    [mm(x2[i:i + fused_m_max])
                     for i in range(0, m, fused_m_max)]
                ).reshape(*xq.shape[:-1], n_local)
        else:
            wd = dequantize_tensor(w, dtype=x.dtype)
            y = jnp.einsum("...k,nk->...n", x, wd)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
