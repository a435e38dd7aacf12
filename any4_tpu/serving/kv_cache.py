"""Paged KV cache: fixed-size pages + per-sequence page tables.

The reference has no serving layer (SURVEY.md: "not a serving engine");
this is the TPU build's new scope (BASELINE.json north star). Design is
vLLM-style adapted to XLA's static shapes:

- one page pool per layer: ``k_pages/v_pages [num_pages, page_size, n_kv,
  head_dim]``;
- a page table ``[max_seqs, max_pages_per_seq] int32`` maps each sequence
  slot's logical page index to a physical page;
- page allocation/free runs host-side (a numpy free list) between jitted
  steps; the device-side write/read paths are pure gathers/scatters with
  static shapes, so decode compiles once;
- attention gathers each slot's pages into a ``[b, max_ctx]`` view and runs
  masked attention (an O(max_ctx) dense read -- a fused paged-attention
  Pallas kernel is the next optimization step).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PagedKVCache:
    k_pages: List[jax.Array]   # per layer [P, ps, n_kv, hd]
    v_pages: List[jax.Array]
    page_size: int

    @classmethod
    def create(cls, cfg, num_pages: int, page_size: int = 16, dtype=None):
        dtype = dtype or cfg.dtype
        hd = cfg.head_dim_
        shape = (num_pages, page_size, cfg.num_key_value_heads, hd)
        return cls(
            [jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers)],
            [jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers)],
            page_size)


class PageAllocator:
    """Host-side physical-page free list + per-slot page tables."""

    def __init__(self, num_pages: int, max_seqs: int, pages_per_seq: int):
        # page 0 is reserved as a scratch sink: inactive slots' page tables
        # are all-zero, so their (masked, never-read) decode writes land
        # there instead of corrupting live pages
        self.free = list(range(num_pages - 1, 0, -1))
        self.table = np.zeros((max_seqs, pages_per_seq), np.int32)
        self.seq_pages: List[List[int]] = [[] for _ in range(max_seqs)]
        self.pages_per_seq = pages_per_seq

    def ensure(self, slot: int, seq_len: int, page_size: int) -> bool:
        """Allocate pages so `seq_len` positions fit. False if OOM."""
        need = -(-seq_len // page_size) if seq_len else 0
        pages = self.seq_pages[slot]
        while len(pages) < need:
            if not self.free or len(pages) >= self.pages_per_seq:
                return False
            p = self.free.pop()
            self.table[slot, len(pages)] = p
            pages.append(p)
        return True

    def release(self, slot: int):
        self.free.extend(reversed(self.seq_pages[slot]))
        self.seq_pages[slot] = []
        self.table[slot] = 0


def write_tokens(pages: jax.Array, kv: jax.Array, page_ids: jax.Array,
                 offsets: jax.Array) -> jax.Array:
    """Scatter per-slot new tokens into the page pool.

    pages: [P, ps, h, d]; kv: [b, t, h, d] new values; page_ids/offsets:
    [b, t] physical page and in-page offset per token (garbage entries
    should point at page 0 with a separate mask handled by never reading
    them -- we reserve page 0 as scratch when slots are inactive).
    """
    b, t, h, d = kv.shape
    flat_pages = pages.reshape(-1, h, d)
    idx = (page_ids * pages.shape[1] + offsets).reshape(-1)
    flat_pages = flat_pages.at[idx].set(kv.reshape(-1, h, d))
    return flat_pages.reshape(pages.shape)


def gather_ctx(pages: jax.Array, table: jax.Array) -> jax.Array:
    """Gather a dense [b, max_ctx, h, d] context view from the page pool.

    table: [b, pages_per_seq] physical page ids.
    """
    b, pps = table.shape
    ps = pages.shape[1]
    g = pages[table.reshape(-1)]                    # [b*pps, ps, h, d]
    return g.reshape(b, pps * ps, *pages.shape[2:])
