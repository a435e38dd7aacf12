"""Paged KV cache: fixed-size pages + per-sequence page tables.

The reference has no serving layer (SURVEY.md: "not a serving engine");
this is the TPU build's new scope (BASELINE.json north star). Design is
vLLM-style adapted to XLA's static shapes:

- one page pool per layer: ``k_pages/v_pages [n_kv, num_pages, page_size,
  head_dim]`` (head-major, the layout the TPU paged-attention flash kernel
  consumes);
- a page table ``[max_seqs, max_pages_per_seq] int32`` maps each sequence
  slot's logical page index to a physical page;
- page allocation/free runs host-side (a numpy free list) between jitted
  steps; the device-side write/read paths are pure gathers/scatters with
  static shapes, so decode compiles once;
- decode attention runs the fused Pallas paged-attention flash kernel
  (jax.experimental.pallas.ops.tpu.paged_attention) on TPU; CPU/test
  backends fall back to a dense gather + masked attention.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# inverse of quantization_utils.MAX_INT8 (= 127.5): int8 pools store
# code = rint(x * 127.5/amax) with scales = amax, so dequant multiplies
# by amax/127.5
_INV_MAX_INT8 = 1.0 / 127.5


@dataclass
class PagedKVCache:
    k_pages: List   # per layer [n_kv, P, ps, hd], or (int8 pages, scales)
    v_pages: List
    page_size: int
    quantized: bool = False

    @classmethod
    def create(cls, cfg, num_pages: int, page_size: int = 16, dtype=None,
               quantize: bool = False):
        """``quantize=True`` stores pages in int8 with per-token scales
        (2x KV memory; the flash paged-attention kernel consumes quantized
        pages natively via its QuantizedTensor input)."""
        dtype = dtype or cfg.dtype
        hd = cfg.head_dim_
        shape = (cfg.num_key_value_heads, num_pages, page_size, hd)
        if quantize:
            # scales are 3-D [h, P, ps] -- a trailing dim of 1 would be
            # lane-padded to 128 by XLA, making the f32 scale pool 4x the
            # HBM of the int8 CODE pool it serves (measured: the 4-D
            # scale pool alone erased int8 KV's bandwidth win,
            # PERF_NOTES round 4 kvq addendum)
            def mk():
                return (jnp.zeros(shape, jnp.int8),
                        jnp.ones(shape[:-1], jnp.float32))
            return cls([mk() for _ in range(cfg.num_hidden_layers)],
                       [mk() for _ in range(cfg.num_hidden_layers)],
                       page_size, True)
        return cls(
            [jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers)],
            [jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers)],
            page_size)


class PageAllocator:
    """Host-side physical-page free list + per-slot page tables."""

    def __init__(self, num_pages: int, max_seqs: int, pages_per_seq: int,
                 contiguous: bool = False):
        # incremented on every table mutation so callers can cache the
        # device-side upload of `table` (the engine re-uploads only when
        # this changes -- a per-burst upload costs a relay round trip)
        self.version = 0
        self.pages_per_seq = pages_per_seq
        self.contiguous = contiguous
        if contiguous:
            # each slot owns the fixed page range [i*pps, (i+1)*pps): the
            # engine's flash-contig layout. The table is PREASSIGNED and
            # never mutates; no sink page is needed (a retired slot's
            # stale positions are masked by seq_len and overwritten on
            # reuse). Trades page sharing for gather-free attention.
            assert num_pages >= max_seqs * pages_per_seq, \
                (num_pages, max_seqs, pages_per_seq)
            self.free = []
            self.table = np.arange(
                max_seqs * pages_per_seq, dtype=np.int32).reshape(
                max_seqs, pages_per_seq)
            self.seq_pages: List[List[int]] = [
                list(self.table[i]) for i in range(max_seqs)]
            return
        # page 0 is reserved as a scratch sink: inactive slots' page tables
        # are all-zero, so their (masked, never-read) decode writes land
        # there instead of corrupting live pages
        self.free = list(range(num_pages - 1, 0, -1))
        self.table = np.zeros((max_seqs, pages_per_seq), np.int32)
        self.seq_pages = [[] for _ in range(max_seqs)]

    def ensure(self, slot: int, seq_len: int, page_size: int) -> bool:
        """Allocate pages so `seq_len` positions fit. False if OOM."""
        need = -(-seq_len // page_size) if seq_len else 0
        if self.contiguous:
            return need <= self.pages_per_seq
        pages = self.seq_pages[slot]
        while len(pages) < need:
            if not self.free or len(pages) >= self.pages_per_seq:
                return False
            p = self.free.pop()
            self.table[slot, len(pages)] = p
            pages.append(p)
            self.version += 1
        return True

    def release(self, slot: int):
        if self.contiguous:
            return      # preassigned ranges never move
        if self.seq_pages[slot]:
            self.version += 1
        self.free.extend(reversed(self.seq_pages[slot]))
        self.seq_pages[slot] = []
        self.table[slot] = 0


def write_tokens(pages, kv: jax.Array, page_ids: jax.Array,
                 offsets: jax.Array):
    """Scatter per-slot new tokens into the page pool.

    pages: [h, P, ps, d] (or an (int8 pages, scales [h, P, ps]) pair for
    a quantized pool); kv: [b, t, h, d] new values; page_ids/offsets:
    [b, t] physical page and in-page offset per token (garbage entries
    should point at page 0, the reserved scratch sink, so inactive slots
    never corrupt live pages).
    """
    if isinstance(pages, tuple):  # int8-quantized pool
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            quantization_utils as qu)
        qpages, scales = pages
        b, t, h, d = kv.shape
        amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1,
                       keepdims=True)                       # [b, t, h, 1]
        amax = jnp.maximum(amax, 1e-6)
        q = qu.to_int8(kv.astype(jnp.float32), amax)
        qpages = write_tokens(qpages, q, page_ids, offsets)
        scales = _write_scales(scales, amax[..., 0].astype(jnp.float32),
                               page_ids, offsets)
        return (qpages, scales)
    b, t, h, d = kv.shape
    if t == 1 and b <= 16:
        # decode hot path: per-slot dynamic_update_slice on the FLAT pool
        # instead of one scatter. The scatter made XLA carry the pools in
        # non-default layouts through the burst while-loop, costing TWO
        # full-pool layout copies per layer per step AND a materialized
        # (instead of bitcast) dense ctx view -- ~2/3 of the decode step
        # at ctx 2048 (32x pool copy-dones in
        # benchmarks/profile_engine_1b_w4a8.json; HLO layout evidence via
        # tools/dump_burst_hlo.py). dus is the canonical in-place KV
        # update XLA aliases through while loops.
        flat = pages.reshape(h, -1, d)              # [h, P*ps, d]
        pos = page_ids * pages.shape[2] + offsets   # [b, 1]
        for i in range(b):
            tok = kv[i, 0].astype(flat.dtype)[:, None, :]   # [h, 1, d]
            flat = jax.lax.dynamic_update_slice(
                flat, tok, (0, pos[i, 0], 0))
        return flat.reshape(pages.shape)
    flat = pages.reshape(h, -1, d)                  # [h, P*ps, d]
    idx = (page_ids * pages.shape[2] + offsets).reshape(-1)
    vals = kv.transpose(2, 0, 1, 3).reshape(h, b * t, d)
    flat = flat.at[:, idx].set(vals.astype(flat.dtype))
    return flat.reshape(pages.shape)


def _write_scales(scales, amax: jax.Array, page_ids: jax.Array,
                  offsets: jax.Array):
    """Scatter per-token dequant scales into the 3-D ``[h, P, ps]`` scale
    pool (mirrors :func:`write_tokens`'s decode dus / prefill scatter
    split). amax: ``[b, t, h]``."""
    b, t, h = amax.shape
    flat = scales.reshape(h, -1)                    # [h, P*ps]
    pos = page_ids * scales.shape[2] + offsets      # [b, t]
    if t == 1 and b <= 16:
        for i in range(b):
            flat = jax.lax.dynamic_update_slice(
                flat, amax[i, 0][:, None], (0, pos[i, 0]))
        return flat.reshape(scales.shape)
    flat = flat.at[:, pos.reshape(-1)].set(
        amax.transpose(2, 0, 1).reshape(h, b * t))
    return flat.reshape(scales.shape)


def gather_ctx_hmajor(pages, table: jax.Array) -> jax.Array:
    """Gather a dense [h, b, max_ctx, d] context view from the page pool
    in the gather's NATIVE dimension order -- no transpose, so XLA keeps
    the pool's default layout (a [b, ctx, h, d] result forces full-pool
    layout copies every decode step; see PERF_NOTES paged-attention
    addendum). Dequantizes int8 pools. table: [b, pages_per_seq]."""
    if isinstance(pages, tuple):
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            quantization_utils as qu)
        qpages, scales = pages
        g = gather_ctx_hmajor(qpages, table).astype(jnp.float32)
        sc = gather_scales_hmajor(scales, table)
        # bf16 view: the KV numbers are already int8-quantized, so bf16
        # rounding is noise -- and the materialized dense view is the
        # dominant HBM traffic of the dense path (f32 doubled it)
        return qu.from_int8(g, sc[..., None], dtype=jnp.bfloat16)
    h, P, ps, d = pages.shape
    b, pps = table.shape
    g = pages[:, table.reshape(-1)]                 # [h, b*pps, ps, d]
    return g.reshape(h, b, pps * ps, d)


def gather_scales_hmajor(scales, table: jax.Array) -> jax.Array:
    """[h, b, max_ctx] view of the 3-D [h, P, ps] scale pool (the scale
    analog of :func:`gather_ctx_hmajor`)."""
    h, P, ps = scales.shape
    b, pps = table.shape
    g = scales[:, table.reshape(-1)]                # [h, b*pps, ps]
    return g.reshape(h, b, pps * ps)


def gather_ctx(pages, table: jax.Array) -> jax.Array:
    """Dense [b, max_ctx, h, d] context view (test/debug convenience;
    the hot path uses :func:`gather_ctx_hmajor` to avoid the layout
    transpose)."""
    return gather_ctx_hmajor(pages, table).transpose(1, 2, 0, 3)


def _flash_decode_kernel_q(seq_ref, tbl_ref, q_ref, k_ref, ks_ref, v_ref,
                           vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
                           ps: int, scale: float):
    """Quantized-pool variant: int8 pages + per-token scales [1, 1, ps]
    blocks of the 3-D scale pool. The pools are written with
    ``quantization_utils.to_int8`` (code = rint(x * 127.5/amax),
    scales = amax), so the inverse is ``code * amax / 127.5`` -- a plain
    ``code * amax`` is 127.5x off (caught by
    test_contig_attention_quantized_pool_impls_agree). Scales fold into
    the logits/probs (O(rep*ps)) instead of scaling the page (O(ps*d));
    linearity makes them identical.

    Precision note (intentional asymmetry): this kernel dequantizes and
    dots in f32, while the contig quantized kernel and _dense_attend_q8
    run their dots in bf16 for MXU rate -- this paged flash path is the
    large-context fallback where the extra precision is free relative to
    its data movement, and cross-kernel agreement is pinned at 2e-2.
    Align the dots to bf16 before tightening those tolerances."""
    _flash_decode_step(
        seq_ref, tbl_ref, q_ref,
        k_ref[0, 0].astype(jnp.float32),
        v_ref[0, 0].astype(jnp.float32),
        o_ref, m_ref, l_ref, acc_ref, ps=ps, scale=scale,
        ks_sc=ks_ref[0], vs_sc=vs_ref[0])


def _flash_decode_kernel(seq_ref, tbl_ref, q_ref, k_ref, v_ref, o_ref,
                         m_ref, l_ref, acc_ref, *, ps: int, scale: float):
    _flash_decode_step(
        seq_ref, tbl_ref, q_ref, k_ref[0, 0].astype(jnp.float32),
        v_ref[0, 0].astype(jnp.float32), o_ref, m_ref, l_ref, acc_ref,
        ps=ps, scale=scale)


def _flash_decode_step(seq_ref, tbl_ref, q_ref, k, v, o_ref,
                       m_ref, l_ref, acc_ref, *, ps: int, scale: float,
                       ks_sc=None, vs_sc=None):
    """Flash decode attention over paged KV for ONE (batch, kv-head) pair,
    one physical page per grid step (page ids arrive via scalar prefetch).

    head_dim sits on the CONTRACTION axis of the two small dots, so any
    head_dim works (the upstream pallas paged_attention kernel tiles
    head_dim on lanes and requires head_dim % 128 == 0 -- which excludes
    hd=64 models like Llama-3.2-1B). Scratch buffers are (8,128)-tile
    padded (Mosaic requires it); padded rows/lanes carry zeros and are
    sliced away at the output write."""
    b_, i = pl.program_id(0), pl.program_id(2)
    npages = pl.num_programs(2)
    R8, DP = acc_ref.shape                       # padded rows / lanes

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)          # [rep, hd]
    rep, d = q.shape
    if rep < R8:
        q = jnp.pad(q, ((0, R8 - rep), (0, 0)))
    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [R8, ps]
    if ks_sc is not None:
        s = s * (ks_sc * _INV_MAX_INT8)       # [1, ps] broadcast
    pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
    s = jnp.where(pos < seq_ref[b_], s, -1e30)

    m_prev = m_ref[:, 0:1]                       # [R8, 1]
    l_prev = l_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                       # [R8, ps]
    alpha = jnp.exp(m_prev - m_new)              # [R8, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    if vs_sc is not None:
        p = p * (vs_sc * _INV_MAX_INT8)       # after l_new: denominator
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # [R8, hd]
    if d < DP:
        pv = jnp.pad(pv, ((0, 0), (0, DP - d)))
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == npages - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:, 0:1], 1e-30)
                       )[:rep, :d].astype(o_ref.dtype)


def flash_paged_decode(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                       seq_lens: jax.Array, table: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Paged flash decode supporting ANY head_dim: q [b, nq, d] ->
    [b, nq, d]. Page tables and sequence lengths are scalar-prefetched so
    each grid step DMAs exactly one physical page."""
    from jax.experimental.pallas import tpu as pltpu

    quantized = isinstance(k_pages, tuple)
    kp = k_pages[0] if quantized else k_pages
    b, nq, d = q.shape
    h, P, ps, _ = kp.shape
    rep = nq // h
    pps = table.shape[1]
    qh = q.reshape(b, h, rep, d)
    scale = 1.0 / np.sqrt(d)
    rp8 = -(-rep // 8) * 8          # Mosaic scratch tiling: (8, 128)
    dp = -(-d // 128) * 128

    page_spec = pl.BlockSpec(
        (1, 1, ps, d), lambda b_, h_, i, seq, tbl: (h_, tbl[b_, i], 0, 0))
    # scales are 3-D [h, P, ps] (see KVCache.create); block (1, 1, ps)
    sc_spec = pl.BlockSpec(
        (1, 1, ps), lambda b_, h_, i, seq, tbl: (h_, tbl[b_, i], 0))
    if quantized:
        assert ps % 8 == 0, \
            "quantized paged flash needs page_size % 8 == 0"
        in_specs = [
            pl.BlockSpec((1, 1, rep, d),
                         lambda b_, h_, i, seq, tbl: (b_, h_, 0, 0)),
            page_spec, sc_spec, page_spec, sc_spec,
        ]
        args = (qh, k_pages[0], k_pages[1], v_pages[0], v_pages[1])
        kern = functools.partial(_flash_decode_kernel_q, ps=ps, scale=scale)
    else:
        in_specs = [
            pl.BlockSpec((1, 1, rep, d),
                         lambda b_, h_, i, seq, tbl: (b_, h_, 0, 0)),
            page_spec, page_spec,
        ]
        args = (qh, k_pages, v_pages)
        kern = functools.partial(_flash_decode_kernel, ps=ps, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, pps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rep, d),
                               lambda b_, h_, i, seq, tbl: (b_, h_, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rp8, 128), jnp.float32),
                        pltpu.VMEM((rp8, 128), jnp.float32),
                        pltpu.VMEM((rp8, dp), jnp.float32)],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seq_lens.astype(jnp.int32), table.astype(jnp.int32), *args)
    return out.reshape(b, nq, d)


def _contig_step(seq_ref, q_ref, ks, vs, o_ref, m_ref, l_ref, acc_ref,
                 *, kb: int, scale: float, h: int,
                 ks_sc=None, vs_sc=None):
    """Flash update for ONE (batch, ctx-block) grid step covering ALL kv
    heads: the per-head work at decode shapes is tiny (a [rep, d] x
    [d, kb] dot pair), so putting heads on the grid made the kernel
    grid-overhead-bound (~0.8 us/step measured; 64 steps at ctx 512 =
    53 us vs dense-gather 31). Heads loop IN-KERNEL over one (h, kb, d)
    block instead -- 8x fewer grid steps -- with per-head flash state
    stacked along the scratch sublane axis."""
    b_, i = pl.program_id(0), pl.program_id(1)
    nblk = pl.num_programs(1)
    HR8, DP = acc_ref.shape
    R8 = HR8 // h

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = i * kb + jax.lax.broadcasted_iota(jnp.int32, (1, kb), 1)
    live = pos < seq_ref[b_]
    rep, d = q_ref.shape[2], q_ref.shape[3]
    for hh in range(h):
        q = q_ref[0, hh].astype(jnp.float32)          # [rep, d]
        if rep < R8:
            q = jnp.pad(q, ((0, R8 - rep), (0, 0)))
        # dots run in the POOL's dtype (bf16 pools -> native-rate MXU;
        # f32 test pools -> exact) with f32 accumulation -- matching the
        # dense paths' bf16-einsum precision. An unconditional f32 dot
        # ran the MXU at its 1/8 f32 rate and left the kernel
        # MXU-pass-bound at decode shapes (round-3 note in
        # contig_attention's docstring).
        k = ks[hh]                                    # [kb, d]
        v = vs[hh]
        s = jax.lax.dot_general((q * scale).astype(k.dtype), k,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if ks_sc is not None:
            # int8 pools: fold the per-token K scale into the LOGITS
            # ([R8, kb] work) instead of scaling the code block
            # ([kb, d] work) -- linearity makes them identical
            s = s * (ks_sc[hh] * _INV_MAX_INT8)[None, :]
        s = jnp.where(live, s, -1e30)                 # [R8, kb]
        lo = hh * R8
        m_prev = m_ref[lo:lo + R8, 0:1]
        l_prev = l_ref[lo:lo + R8, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        if vs_sc is not None:
            # per-token V scale folded into the PROBS (sum for l_new
            # above stays unscaled -- it is the softmax denominator)
            p = p * (vs_sc[hh] * _INV_MAX_INT8)[None, :]
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if d < DP:
            pv = jnp.pad(pv, ((0, 0), (0, DP - d)))
        acc_ref[lo:lo + R8, :] = acc_ref[lo:lo + R8, :] * alpha + pv
        m_ref[lo:lo + R8, :] = jnp.broadcast_to(m_new, (R8, 128))
        l_ref[lo:lo + R8, :] = jnp.broadcast_to(l_new, (R8, 128))

    @pl.when(i == nblk - 1)
    def _():
        for hh in range(h):
            lo = hh * R8
            o_ref[0, hh] = (
                acc_ref[lo:lo + R8, :] /
                jnp.maximum(l_ref[lo:lo + R8, 0:1], 1e-30)
            )[:rep, :d].astype(o_ref.dtype)


def _flash_contig_kernel(seq_ref, q_ref, k_ref, v_ref, o_ref,
                         m_ref, l_ref, acc_ref, *, kb: int, scale: float,
                         h: int):
    # no dtype cast: the dots run in the pool's own dtype (see
    # _contig_step) -- bf16 pools hit the MXU's native rate
    _contig_step(seq_ref, q_ref, k_ref[:], v_ref[:], o_ref, m_ref, l_ref,
                 acc_ref, kb=kb, scale=scale, h=h)


def _flash_contig_kernel_q(seq_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                           o_ref, m_ref, l_ref, acc_ref, *, kb: int,
                           scale: float, h: int):
    """Quantized contiguous variant: int8 KV + per-token scales (see
    _flash_decode_kernel_q for the to_int8-inverse scaling).

    Scales arrive as 2-D ``[h, kb]`` blocks -- a ``[h, kb, 1]`` block
    would lane-pad the trailing 1 to 128 and stage 128x the scale bytes
    (measured: the pre-fix kernel ran 0.6x the DENSE q8 path at ctx 4096,
    bench_engine_ab_1b_w4a8_kvq_long4096_r4b). The scales are folded
    into logits/probs inside :func:`_contig_step` (O(rep*kb) VPU work)
    instead of scaling the code blocks (O(kb*d))."""
    _contig_step(seq_ref, q_ref,
                 k_ref[:].astype(jnp.bfloat16),
                 v_ref[:].astype(jnp.bfloat16),
                 o_ref, m_ref, l_ref, acc_ref, kb=kb, scale=scale, h=h,
                 ks_sc=ks_ref[:], vs_sc=vs_ref[:])


# tokens per contiguous flash compute block: the multi-page compute block
# of the upstream kernel, realized as a plain block over the contiguous
# slot region. 512 x 64 bf16 = 64 KB per operand block -- big enough that
# the per-grid-step overhead (the ps=16 page-grid killer, PERF_NOTES
# paged-attention addendum) amortizes, small enough for any VMEM budget.
CONTIG_BLOCK_TOKENS = 512
# context bucket at/above which contig decode attention takes the flash
# kernel instead of the dense view (measured crossover; see
# contig_attention dispatch)
CONTIG_FLASH_MIN_CTX = 2048


def flash_contig_decode(q: jax.Array, k_pool, v_pool, seq_lens: jax.Array,
                        ctx_bucket: int, max_ctx: int,
                        interpret: bool = False) -> jax.Array:
    """Flash decode attention over a CONTIGUOUS-slot KV pool.

    ``k_pool/v_pool``: ``[h, slots * max_ctx, d]`` (or (int8 pool,
    scales [h, slots*max_ctx]) pairs) where slot ``b`` owns positions
    ``[b*max_ctx, b*max_ctx + ctx)`` -- the engine's contiguous layout
    (the page pool reshaped; each slot's pages are preassigned in order,
    so the region IS contiguous). Only the first ``ctx_bucket`` positions
    of each slot participate (power-of-two context bucketing, compiled
    per bucket). q: [b, nq, d] -> [b, nq, d].

    Unlike the per-page grid (ps=16 blocks: MXU ~1% utilized, 10x slower
    than dense-gather at serving shapes), blocks here are
    ``CONTIG_BLOCK_TOKENS`` wide with STATIC index maps, so the kernel
    reads the KV pool exactly once at full DMA width with zero gather --
    the dense-gather path's 3x traffic (pool -> gathered view -> attention
    reads) collapses to 1x.
    """
    from jax.experimental.pallas import tpu as pltpu

    quantized = isinstance(k_pool, tuple)
    kp = k_pool[0] if quantized else k_pool
    b, nq, d = q.shape
    h = kp.shape[0]
    rep = nq // h
    kb = min(CONTIG_BLOCK_TOKENS, ctx_bucket)
    assert ctx_bucket % kb == 0 and max_ctx % kb == 0, \
        (ctx_bucket, max_ctx, kb)
    nblk = ctx_bucket // kb
    stride = max_ctx // kb       # ctx blocks per slot region
    qh = q.reshape(b, h, rep, d)
    scale = 1.0 / np.sqrt(d)
    rp8 = -(-rep // 8) * 8
    dp = -(-d // 128) * 128

    kv_spec = pl.BlockSpec((h, kb, d),
                           lambda b_, i, seq: (0, b_ * stride + i, 0))
    # scales as 2-D [h, T] so kb rides the LANE axis; a [h, kb, 1] block
    # pads the trailing 1 to 128 lanes (128x the scale traffic)
    sc_spec = pl.BlockSpec((h, kb),
                           lambda b_, i, seq: (0, b_ * stride + i))
    q_spec = pl.BlockSpec((1, h, rep, d),
                          lambda b_, i, seq: (b_, 0, 0, 0))
    if quantized:
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]
        args = (qh, k_pool[0], k_pool[1].reshape(h, -1),
                v_pool[0], v_pool[1].reshape(h, -1))
        kern = functools.partial(_flash_contig_kernel_q, kb=kb,
                                 scale=scale, h=h)
    else:
        in_specs = [q_spec, kv_spec, kv_spec]
        args = (qh, k_pool, v_pool)
        kern = functools.partial(_flash_contig_kernel, kb=kb,
                                 scale=scale, h=h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, rep, d),
                               lambda b_, i, seq: (b_, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((h * rp8, 128), jnp.float32),
                        pltpu.VMEM((h * rp8, 128), jnp.float32),
                        pltpu.VMEM((h * rp8, dp), jnp.float32)],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(seq_lens.astype(jnp.int32), *args)
    return out.reshape(b, nq, d)


# Largest gathered-context footprint (k+v dense views, bytes) for which
# decode attention takes the dense-gather path; measured crossover on the
# v5e-class chip -- see paged_attention's docstring and
# benchmarks/bench_paged_attn_*.json
DENSE_CTX_BYTES = 256 * 1024 * 1024


def _contig_ctx_view(pages, b: int, ctx_bucket: int):
    """Dense ``[h, b, ctx_bucket, d]`` context view of a CONTIGUOUS-slot
    pool: slot ``i`` owns pages ``[i*pps, (i+1)*pps)``, so the "gather" is
    a layout-preserving reshape + static slice -- zero data movement
    (the paged layout's :func:`gather_ctx_hmajor` pays a real gather).
    Dequantizes int8 pools."""
    if isinstance(pages, tuple):
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            quantization_utils as qu)
        g = _contig_ctx_view(pages[0], b, ctx_bucket).astype(jnp.float32)
        sc = _contig_ctx_view(pages[1], b, ctx_bucket)
        # bf16 for the same reason as gather_ctx_hmajor: int8 KV numbers
        # lose nothing to bf16, the view's HBM footprint halves
        return qu.from_int8(g, sc[..., None], dtype=jnp.bfloat16)
    if pages.ndim == 3:                              # [h, P, ps] scale pool
        h = pages.shape[0]
        return pages.reshape(h, b, -1)[:, :, :ctx_bucket]
    h, P, ps, d = pages.shape
    return pages.reshape(h, b, P * ps // b, d)[:, :, :ctx_bucket]


def contig_attention(q: jax.Array, k_pages, v_pages,
                     seq_lens: jax.Array, table: jax.Array,
                     impl: str = "", scale=None, softcap=None,
                     window=None) -> jax.Array:
    """Decode attention over the CONTIGUOUS slot layout
    (PageAllocator(contiguous=True)). ``table`` only conveys the context
    BUCKET width (columns).

    Dispatch (measured, benchmarks/bench_paged_attn_b8_ctx{512,2048}
    .json): for UNQUANTIZED pools the dense path is a pure
    reshape+slice view feeding XLA einsums -- nothing materializes, the
    bucketed pool is read exactly once at the HBM roofline (45.8 us at
    b=8/ctx=2048/hd=64 = 732 GB/s effective, vs flash_contig 179.8 us:
    the kernel's per-head [rep, d] dots are MXU-pass-bound) -- so dense
    wins at EVERY context and is always taken. For int8-quantized pools
    the dense path materializes a bf16 dequantized view of the bucket,
    so :func:`flash_contig_decode` (in-kernel dequant, static 512-token
    blocks) takes over above ``DENSE_CTX_BYTES`` of view -- an HBM
    -capacity bound, not a speed crossover. ``ANY4_CONTIG_IMPL`` in
    {dense, flash} overrides for benchmarking."""
    quantized = isinstance(k_pages, tuple)
    kp = k_pages[0] if quantized else k_pages
    b = q.shape[0]
    h, P, ps, d = kp.shape
    ctx_bucket = table.shape[1] * ps
    max_ctx = P * ps // b
    on_tpu = jax.default_backend() == "tpu"
    impl = impl or os.environ.get("ANY4_CONTIG_IMPL", "")
    if scale is not None or softcap is not None or window is not None:
        # gemma2 attention options (query_pre_attn_scalar / logit softcap /
        # sliding window) are implemented in the dense paths only; dense is
        # the measured production path at every context for bf16 pools and
        # below DENSE_CTX_BYTES for int8 pools
        impl = "dense"
    if not impl:
        dense_bytes = 2 * b * ctx_bucket * h * d * 2
        if not on_tpu:
            # CI mirror of paged_attention: quantized pools take the
            # dense path, unquantized keep the kernel interpret-covered
            impl = "dense" if quantized else "flash"
        elif quantized:
            # int8 pools: the folded-scale dense path wins at EVERY
            # measured context (the in-kernel dequant makes the flash-q
            # kernel 0.6x at long ctx: 167 vs dense 254 tok/s at 4096,
            # bench_engine_ab_1b_w4a8_kvq_long4096_* artifacts); flash
            # only above the view-capacity bound
            impl = "dense" if dense_bytes <= DENSE_CTX_BYTES else "flash"
        elif ctx_bucket >= CONTIG_FLASH_MIN_CTX:
            # bf16 pools at long contexts: the flash kernel reads the
            # pool ONCE in-kernel with no views -- the dense path's XLA
            # program drowns in pool layout/slice machinery at these
            # sizes (engine A/B at prompt~bucket: flash 524 vs dense 476
            # tok/s at ctx2048, 277 vs 251 at 4096;
            # bench_engine_ab_1b_w4a8_long*_r4 artifacts)
            impl = "flash"
        else:
            impl = "dense"
    if impl == "dense":
        if quantized:
            # int8 pools: slice codes and scales separately and fold the
            # per-token scales into the logits/probs (NOT the operands) --
            # the codes feed the einsums directly (the int8->bf16 convert
            # fuses into the dot read), nothing materializes, and the
            # attention traffic HALVES vs bf16 pools instead of growing
            # 2.5x via a dequantized view
            return _dense_attend_q8(
                q,
                _contig_ctx_view(k_pages[0], b, ctx_bucket),
                _contig_ctx_view(k_pages[1], b, ctx_bucket),
                _contig_ctx_view(v_pages[0], b, ctx_bucket),
                _contig_ctx_view(v_pages[1], b, ctx_bucket),
                seq_lens, scale=scale, softcap=softcap, window=window)
        kctx = _contig_ctx_view(k_pages, b, ctx_bucket)
        vctx = _contig_ctx_view(v_pages, b, ctx_bucket)
        return _dense_attend(q, kctx, vctx, seq_lens, scale=scale,
                             softcap=softcap, window=window)
    flat = (lambda p: p.reshape(h, P * ps, -1))
    k_pool = ((flat(k_pages[0]), flat(k_pages[1])) if quantized
              else flat(k_pages))
    v_pool = ((flat(v_pages[0]), flat(v_pages[1])) if quantized
              else flat(v_pages))
    return flash_contig_decode(
        q, k_pool, v_pool, seq_lens, ctx_bucket, max_ctx,
        interpret=not on_tpu)


def paged_attention(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                    seq_lens: jax.Array, table: jax.Array,
                    pages_per_compute_block: int = 4, scale=None,
                    softcap=None, window=None) -> jax.Array:
    """Paged attention for decode: q [b, nq, d] -> out [b, nq, d].

    Dispatch (measured, benchmarks/bench_paged_attn_*.json): below
    ``DENSE_CTX_BYTES`` of gathered context the dense gather+attention
    (plain XLA ops) is the production path -- on this chip it beats the
    page-grid kernels by ~10x in device time at serving-size contexts
    (b=8, ctx=512, hd=64: 73us vs 844us/step; the per-page grid steps do
    16x64-sized dots that leave the MXU idle and pay grid overhead per
    page). Kernels take over only where materializing the dense
    [b, ctx, h, d] view gets prohibitively large: the upstream pallas
    kernel when head_dim % 128 == 0 (it tiles head_dim on lanes), else
    our :func:`flash_paged_decode` (head_dim on the contraction axis --
    covers hd=64 flagships). ``ANY4_PAGED_IMPL`` in {dense, flash,
    upstream} overrides for benchmarking. Off-TPU: dense, except
    unquantized pools route through flash_paged_decode in interpret mode
    so the kernel stays CI-covered.
    """
    b, nq, d = q.shape
    quantized = isinstance(k_pages, tuple)
    kp = k_pages[0] if quantized else k_pages
    h, ctx = kp.shape[0], table.shape[1] * kp.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    impl = os.environ.get("ANY4_PAGED_IMPL", "")  # benchmarking override
    if scale is not None or softcap is not None or window is not None:
        impl = "dense"   # gemma2 options live in the dense path (see
        # contig_attention)
    if not impl:
        if not on_tpu:
            # CPU/test backends: dense, except unquantized pools run the
            # flash kernel interpreted so it stays CI-covered
            impl = "dense" if quantized else "flash"
        else:
            dense_bytes = 2 * b * ctx * h * d * 2  # k+v ctx views, bf16
            if dense_bytes <= DENSE_CTX_BYTES:
                impl = "dense"
            else:
                impl = "upstream" if d % 128 == 0 else "flash"
    if impl == "upstream" and on_tpu and d % 128 == 0:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as pa)
        scale = 1.0 / np.sqrt(d)
        pps = table.shape[1]
        blk = min(pages_per_compute_block, pps)
        while pps % blk:
            blk -= 1
        if quantized:
            kq = _upstream_quantized_pages(k_pages)
            vq = _upstream_quantized_pages(v_pages)
            return pa((q * scale).astype(jnp.bfloat16), kq, vq,
                      seq_lens.astype(jnp.int32), table.astype(jnp.int32),
                      pages_per_compute_block=blk)
        return pa(
            (q * scale).astype(k_pages.dtype), k_pages, v_pages,
            seq_lens.astype(jnp.int32), table.astype(jnp.int32),
            pages_per_compute_block=blk)
    if impl == "flash":
        # any head_dim (quantized pools dequantize their int8 pages +
        # per-token scales in-kernel)
        return flash_paged_decode(q, k_pages, v_pages, seq_lens, table,
                                  interpret=not on_tpu)
    return _dense_paged_attention(q, k_pages, v_pages, seq_lens, table,
                                  scale=scale, softcap=softcap,
                                  window=window)


def _upstream_quantized_pages(pages):
    """Adapt an int8 ``(codes [h, P, ps, d], scales [h, P, ps])`` pool pair
    to the upstream paged_attention kernel's QuantizedTensor convention.

    Our scale pools are 3-D (the round-4 lane-padding fix: a trailing
    size-1 axis makes XLA pad the pool 128x on lanes), but the upstream
    kernel dequantizes with ``codes * scales`` broadcast over head_dim --
    it expects ``[h, P, ps, 1]``. Restore the trailing axis at the call
    boundary only (the view is free; the stored pool stays 3-D)."""
    from jax.experimental.pallas.ops.tpu.paged_attention import (
        quantization_utils as qu)
    codes, scales = pages
    return qu.QuantizedTensor(codes, scales[..., None])


def _dense_paged_attention(q, k_pages, v_pages, seq_lens, table,
                           scale=None, softcap=None, window=None):
    """Gather a dense context view and attend with plain XLA ops (the
    off-TPU reference; also selectable on TPU via ANY4_PAGED_IMPL=dense
    for benchmarking -- at small contexts the materialized gather can beat
    a page-grid kernel whose per-grid-step overhead dominates).

    int8 pools gather CODES and SCALES separately and fold the scales
    into the logits/probs (see :func:`_dense_attend_q8`): the gathered
    views stay int8 -- half the bf16 traffic -- instead of dequantizing
    to a float view."""
    if isinstance(k_pages, tuple):
        return _dense_attend_q8(
            q,
            gather_ctx_hmajor(k_pages[0], table),
            gather_scales_hmajor(k_pages[1], table),
            gather_ctx_hmajor(v_pages[0], table),
            gather_scales_hmajor(v_pages[1], table),
            seq_lens, scale=scale, softcap=softcap, window=window)
    kctx = gather_ctx_hmajor(k_pages, table)        # [h, b, ctx, d]
    vctx = gather_ctx_hmajor(v_pages, table)
    return _dense_attend(q, kctx, vctx, seq_lens, scale=scale,
                         softcap=softcap, window=window)


def _attn_mask(ctx_len: int, seq_lens, window=None):
    """Additive decode mask [1, b, 1, ctx]: positions < seq_len visible;
    with ``window`` (gemma2 sliding layers) only the last ``window``
    positions (query position = seq_len - 1, HF ``q - k < window``)."""
    ctx_pos = jnp.arange(ctx_len)[None, None, None, :]
    vis = ctx_pos < seq_lens[None, :, None, None]
    if window is not None:
        vis &= ctx_pos > (seq_lens[None, :, None, None] - 1 - window)
    return jnp.where(vis, 0.0, -1e9)


def _dense_attend_q8(q, kc, ks, vc, vs, seq_lens, scale=None, softcap=None,
                     window=None):
    """:func:`_dense_attend` over int8 code views + per-token scales.

    The dequant ``code * amax / 127.5`` is linear in the code with a
    per-TOKEN constant, so it commutes with the attention dots: the k
    scales multiply the [.., rep, ctx] logits after the QK einsum and
    the v scales fold into the [.., rep, ctx] probs before the PV
    einsum. The big int8 operands feed the MXU directly (the int8->bf16
    convert fuses into the dot read; |code| <= 127 is bf16-exact) --
    attention HBM traffic is half the bf16-pool dense path's instead of
    2.5x via a materialized dequant view."""
    b, nq, d = q.shape
    h = kc.shape[0]
    rep = nq // h
    qh = q.reshape(b, h, rep, d).transpose(1, 0, 2, 3)   # [h, b, rep, d]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("hbrd,hbcd->hbrc",
                        (qh * scale).astype(jnp.bfloat16),
                        kc.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    logits = logits * (ks * _INV_MAX_INT8)[:, :, None, :]
    if softcap is not None:  # gemma2 attn_logit_softcapping, pre-mask
        logits = softcap * jnp.tanh(logits / softcap)
    mask = _attn_mask(kc.shape[2], seq_lens, window)
    probs = jax.nn.softmax(logits + mask, axis=-1)
    pv = probs * (vs * _INV_MAX_INT8)[:, :, None, :]
    out = jnp.einsum("hbrc,hbcd->hbrd", pv.astype(jnp.bfloat16),
                     vc.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.transpose(1, 0, 2, 3).reshape(b, nq, d).astype(q.dtype)


def _dense_attend(q, kctx, vctx, seq_lens, scale=None, softcap=None,
                  window=None):
    """Decode attention over a dense ``[h, b, ctx, d]`` context view.

    Grouped-head GQA dots (q heads grouped per kv head) -- no
    jnp.repeat: expanding KV to nq heads materializes rep x the
    context and showed up as ~250 us/step of broadcast+convert in the
    1B engine profile. The big operands stay in the view-native
    [h, b, c, d] order with (h, b) as leading dot batch dims -- a
    [b, c, h, d] view forced 4.2 MB layout copies of both the views
    and the pools every step. bf16 inputs, f32 MXU accumulation."""
    b, nq, d = q.shape
    h = kctx.shape[0]
    rep = nq // h
    qh = q.reshape(b, h, rep, d).transpose(1, 0, 2, 3)   # [h, b, rep, d]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("hbrd,hbcd->hbrc", qh * scale, kctx,
                        preferred_element_type=jnp.float32)
    if softcap is not None:  # gemma2 attn_logit_softcapping, pre-mask
        logits = softcap * jnp.tanh(logits / softcap)
    mask = _attn_mask(kctx.shape[2], seq_lens, window)
    probs = jax.nn.softmax(logits + mask, axis=-1)
    out = jnp.einsum("hbrc,hbcd->hbrd", probs.astype(vctx.dtype), vctx,
                     preferred_element_type=jnp.float32)
    return out.transpose(1, 0, 2, 3).reshape(b, nq, d).astype(q.dtype)
