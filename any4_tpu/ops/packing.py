"""TPU-native packed weight layouts.

This is the TPU analog of the reference's tensor-core layout converters
(TinyGemmConvertA.cu / TinyGemmConvertB.cu): a one-time pre-processing step
that rearranges quantized codes into the layout the fused Pallas kernels
consume. The CUDA reference interleaves 8 codes per int32 in `75316420` nibble
order to match its `mma.sync` fragment ownership; a TPU kernel instead wants
**planar nibble packing** so that each 4-bit shift/mask of a loaded int32
block yields a *contiguous k-slice* aligned with quantization groups and VPU
lanes:

For each k-block of ``PACK_BLOCK = 1024`` weights of one logical weight row,
view the codes as ``[8, 128]`` (8 planes x 128 lanes); nibble ``j`` of the
packed word at lane ``l`` holds ``codes[k_block*1024 + j*128 + l]``. Packed
storage is row-major ``packed[r, kb*128 + l]`` -- output rows on sublanes,
k-words on lanes. A kernel that loads the packed block ``[bn, 128] int32``
recovers plane ``j`` (one contiguous 128-wide k-slice per output row) with
``(word >> 4j) & 0xF``. This orientation is dictated by the hardware's
dynamic-gather unit: TPU supports per-sublane gathers along the *lane*
dimension only, so any4's 16-entry row LUTs (tiled 8x along lanes) can be
gathered with codes in this layout but not in the transposed one. The MXU
consumes the dequantized ``[bn, 128]`` tile through a rhs-contracted
``dot_general`` (the standard ``x @ W^T`` torch-linear form).

k is zero-padded to a multiple of 1024 at pack time (codes 0, scales/zeros 0,
so padded columns reconstruct to exactly 0.0 and contribute nothing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PACK_BLOCK = 1024          # k-weights per packed block
PLANES = 8                 # nibbles per int32
LANES = PACK_BLOCK // PLANES  # 128


def padded_k(k: int) -> int:
    return -(-k // PACK_BLOCK) * PACK_BLOCK


def pad_axis(x: jax.Array, axis: int, target: int, value=0) -> jax.Array:
    """Zero-pad ``x`` along ``axis`` up to length ``target``."""
    cur = x.shape[axis]
    if cur == target:
        return x
    assert cur < target
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=value)


def pack_int4(codes: jax.Array, shards: int = 1) -> jax.Array:
    """Pack 4-bit codes ``[n, k]`` (values in [0,15]) into planar int32
    ``[n, k_padded/8]``.

    ``shards > 1`` packs each of the ``shards`` contiguous k-slices
    independently (each zero-padded to a PACK_BLOCK multiple) so that
    sharding the packed array along its word axis splits exactly at logical
    k boundaries -- required for row-parallel tensor parallelism, where each
    device must hold a contiguous k-range of the weight.
    """
    n, k = codes.shape
    if shards > 1:
        assert k % shards == 0, f"k={k} not divisible by shards={shards}"
        parts = [pack_int4(codes[:, s * (k // shards):(s + 1) * (k // shards)])
                 for s in range(shards)]
        return jnp.concatenate(parts, axis=1)
    kp = padded_k(k)
    c = pad_axis(codes.astype(jnp.int32), 1, kp)
    c = c.reshape(n, kp // PACK_BLOCK, PLANES, LANES)
    shifts = (4 * jnp.arange(PLANES, dtype=jnp.int32))[None, None, :, None]
    words = jnp.sum(c << shifts, axis=2, dtype=jnp.int32)  # [n, kb, 128]
    return words.reshape(n, kp // PLANES)


def unpack_int4(packed: jax.Array, k: int, shards: int = 1) -> jax.Array:
    """Inverse of :func:`pack_int4`; returns uint8 codes ``[n, k]``."""
    if shards > 1:
        n, kw = packed.shape
        per = kw // shards
        parts = [unpack_int4(packed[:, s * per:(s + 1) * per], k // shards)
                 for s in range(shards)]
        return jnp.concatenate(parts, axis=1)
    n, kw = packed.shape
    kp = kw * PLANES
    words = packed.reshape(n, kp // PACK_BLOCK, 1, LANES)
    shifts = (4 * jnp.arange(PLANES, dtype=jnp.int32))[None, None, :, None]
    c = (jax.lax.shift_right_logical(words, shifts)) & 0xF  # [n, kb, j, l]
    return c.reshape(n, kp)[:, :k].astype(jnp.uint8)


def pad_group_arrays(scales: jax.Array, zeros: jax.Array | None, k: int,
                     group_size: int, shards: int = 1):
    """Pad per-group scale/zero arrays ``[n, k/g]`` to cover ``padded_k(k)``
    groups with zeros (so padded weights reconstruct to 0). With
    ``shards > 1`` padding is applied per contiguous k-shard, mirroring
    :func:`pack_int4`."""
    if shards > 1:
        gs = scales.shape[1] // shards
        parts = [pad_group_arrays(
            scales[:, s * gs:(s + 1) * gs],
            None if zeros is None else zeros[:, s * gs:(s + 1) * gs],
            k // shards, group_size) for s in range(shards)]
        s_all = jnp.concatenate([p[0] for p in parts], axis=1)
        z_all = None if zeros is None else \
            jnp.concatenate([p[1] for p in parts], axis=1)
        return s_all, z_all
    kp = padded_k(k)
    gp = kp // group_size
    scales = pad_axis(scales, 1, gp)
    if zeros is not None:
        zeros = pad_axis(zeros, 1, gp)
    return scales, zeros


def pack_int8(q: jax.Array, shards: int = 1) -> jax.Array:
    """int8 weights need no nibble packing on TPU (int8 is a native tile
    dtype); this just zero-pads k to the kernel block size (row-major
    ``[n, kp]``), per contiguous k-shard when ``shards > 1``."""
    n, k = q.shape
    if shards > 1:
        assert k % shards == 0
        return jnp.concatenate(
            [pack_int8(q[:, s * (k // shards):(s + 1) * (k // shards)])
             for s in range(shards)], axis=1)
    return pad_axis(q, 1, padded_k(k))
