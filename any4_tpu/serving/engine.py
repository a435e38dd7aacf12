"""Continuous-batching inference engine over the paged KV cache.

Host-side scheduler (admit / step / retire) around two jitted device
programs: a single-sequence prefill that writes prompt KV into the paged
pool, and a batched decode step over all active slots. Static shapes
throughout -- slot count, page-table width and context length are fixed at
engine construction, so XLA compiles exactly two programs.

The reference has no serving layer; this is the TPU build's new scope
(BASELINE.json north star: sharded decode + paged KV + continuous
batching).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from . import kv_cache as kvc


@dataclass
class Request:
    uid: int
    prompt: np.ndarray            # [t] int32
    max_new_tokens: int = 32
    eos_token_id: Optional[int] = None
    out_tokens: list = field(default_factory=list)
    done: bool = False


@functools.partial(jax.jit, static_argnames=("cfg", "page_size"))
def _prefill_one(params, cfg, prompt, k_pages, v_pages, table_row,
                 page_size):
    """Run one prompt [1, t] and write its KV into the paged pool.
    Returns (last_logits [vocab], k_pages, v_pages)."""
    t = prompt.shape[1]
    positions = jnp.arange(t)[None, :]
    mask = jnp.where(jnp.tril(jnp.ones((t, t), jnp.bool_)), 0.0,
                     -1e9)[None, None].astype(jnp.float32)
    # temporary dense cache for the prefill, then scatter into pages
    caches = llama.init_kv_caches(cfg, 1, t)
    logits, caches = llama.forward(params, cfg, prompt, positions=positions,
                                   kv_caches=caches, cache_pos=None,
                                   mask=mask)
    pos = jnp.arange(t)
    page_ids = table_row[pos // page_size]          # [t]
    offsets = pos % page_size
    new_k, new_v = [], []
    for li in range(cfg.num_hidden_layers):
        kc, vc = caches[li]
        new_k.append(kvc.write_tokens(k_pages[li], kc, page_ids[None],
                                      offsets[None]))
        new_v.append(kvc.write_tokens(v_pages[li], vc, page_ids[None],
                                      offsets[None]))
    # (quantized pools are handled transparently by write_tokens)
    return logits[0, -1], new_k, new_v


@functools.partial(jax.jit, static_argnames=("cfg", "page_size"))
def _decode_batch(params, cfg, tokens, seq_lens, tables, k_pages, v_pages,
                  active, page_size):
    """One decode step for all slots.

    tokens: [b] int32 current token per slot; seq_lens: [b] current length
    (the new token's position); tables: [b, pps]; active: [b] bool.
    Returns (logits [b, vocab], k_pages, v_pages).
    """
    b = tokens.shape[0]
    pps = tables.shape[1]
    max_ctx = pps * page_size
    positions = seq_lens[:, None]                   # [b, 1]
    cos, sin = llama.rope_tables(cfg, positions)
    x = jnp.take(params["embed_tokens"], tokens[:, None],
                 axis=0).astype(cfg.dtype)

    # per-slot write target for the new token
    page_ids = jnp.take_along_axis(
        tables, (seq_lens // page_size)[:, None], axis=1)  # [b, 1]
    offsets = (seq_lens % page_size)[:, None]

    hd = cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

    new_k, new_v = list(k_pages), list(v_pages)
    for li, layer in enumerate(params["layers"]):
        h = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        from ..ops import linear as lin
        if "qkv_proj" in layer:  # fused projections (models/fuse.py)
            qkv = lin.linear(h, layer["qkv_proj"], layer.get("qkv_bias"))
            q = qkv[..., :nq * hd]
            k = qkv[..., nq * hd:(nq + nkv) * hd]
            v = qkv[..., (nq + nkv) * hd:]
        else:
            q = lin.linear(h, layer["q_proj"], layer.get("q_bias"))
            k = lin.linear(h, layer["k_proj"], layer.get("k_bias"))
            v = lin.linear(h, layer["v_proj"], layer.get("v_bias"))
        q = llama.apply_rope(q.reshape(b, 1, nq, hd), cos, sin)
        k = llama.apply_rope(k.reshape(b, 1, nkv, hd), cos, sin)
        v = v.reshape(b, 1, nkv, hd)

        new_k[li] = kvc.write_tokens(new_k[li], k, page_ids, offsets)
        new_v[li] = kvc.write_tokens(new_v[li], v, page_ids, offsets)

        # flash paged attention over each slot's pages (the new token was
        # just written at position seq_len, so the visible length is +1)
        out = kvc.paged_attention(q[:, 0], new_k[li], new_v[li],
                                  seq_lens + 1, tables)
        out = out.astype(x.dtype).reshape(b, 1, nq * hd)
        out = lin.linear(out, layer["o_proj"], layer.get("o_bias"))
        x = x + out
        h = llama.rms_norm(x, layer["post_attention_layernorm"],
                           cfg.rms_norm_eps)
        x = x + llama.mlp(layer, h)

    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if "lm_head" in params:
        logits = lin.linear(x, params["lm_head"])
    else:
        logits = x @ params["embed_tokens"].T.astype(x.dtype)
    return logits[:, -1, :], new_k, new_v


class Engine:
    """Continuous-batching engine: admit requests into slots, run batched
    decode, retire finished sequences and recycle their pages."""

    def __init__(self, params, cfg, max_slots: int = 8,
                 max_ctx: int = 512, page_size: int = 16,
                 num_pages: Optional[int] = None,
                 sample_fn: Optional[Callable] = None,
                 kv_quantize: bool = False):
        self.params = params
        self.cfg = cfg
        self.page_size = page_size
        self.pps = -(-max_ctx // page_size)
        self.max_slots = max_slots
        num_pages = num_pages or (max_slots * self.pps + 1)
        self.cache = kvc.PagedKVCache.create(cfg, num_pages, page_size,
                                             quantize=kv_quantize)
        self.alloc = kvc.PageAllocator(num_pages, max_slots, self.pps)
        self.slots: List[Optional[Request]] = [None] * max_slots
        self.tokens = np.zeros(max_slots, np.int32)
        self.seq_lens = np.zeros(max_slots, np.int32)
        self.pending: List[Request] = []
        self.finished: List[Request] = []
        self._uid = 0
        self.sample_fn = sample_fn or (lambda lg: jnp.argmax(lg, axis=-1))

    def submit(self, prompt, max_new_tokens: int = 32,
               eos_token_id: Optional[int] = None) -> int:
        self._uid += 1
        self.pending.append(Request(self._uid, np.asarray(prompt, np.int32),
                                    max_new_tokens, eos_token_id))
        return self._uid

    def _admit(self):
        for i in range(self.max_slots):
            if self.slots[i] is not None or not self.pending:
                continue
            req = self.pending.pop(0)
            t = len(req.prompt)
            if not self.alloc.ensure(i, t + 1, self.page_size):
                self.pending.insert(0, req)
                break
            table_row = jnp.asarray(self.alloc.table[i])
            last_logits, new_k, new_v = _prefill_one(
                self.params, self.cfg, jnp.asarray(req.prompt[None]),
                self.cache.k_pages, self.cache.v_pages, table_row,
                self.page_size)
            self.cache.k_pages, self.cache.v_pages = new_k, new_v
            tok = int(self.sample_fn(last_logits[None])[0])
            req.out_tokens.append(tok)
            self.slots[i] = req
            self.tokens[i] = tok
            self.seq_lens[i] = t

    def _retire(self, i: int):
        req = self.slots[i]
        req.done = True
        self.finished.append(req)
        self.slots[i] = None
        self.alloc.release(i)

    def step(self) -> int:
        """Admit + one batched decode step. Returns number of active slots."""
        self._admit()
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return 0
        # grow page tables for slots about to write position seq_len
        for i in active:
            if not self.alloc.ensure(i, int(self.seq_lens[i]) + 2,
                                     self.page_size):
                self._retire(i)  # out of pages: finish the sequence
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return 0
        logits, new_k, new_v = _decode_batch(
            self.params, self.cfg, jnp.asarray(self.tokens),
            jnp.asarray(self.seq_lens), jnp.asarray(self.alloc.table),
            self.cache.k_pages, self.cache.v_pages,
            jnp.asarray([s is not None for s in self.slots]),
            self.page_size)
        self.cache.k_pages, self.cache.v_pages = new_k, new_v
        next_tokens = np.asarray(self.sample_fn(logits))
        for i in active:
            req = self.slots[i]
            self.seq_lens[i] += 1
            tok = int(next_tokens[i])
            req.out_tokens.append(tok)
            self.tokens[i] = tok
            if (len(req.out_tokens) >= req.max_new_tokens or
                    (req.eos_token_id is not None
                     and tok == req.eos_token_id)):
                self._retire(i)
        return len([s for s in self.slots if s is not None])

    def run(self, max_steps: int = 10000) -> List[Request]:
        """Drive until all submitted requests finish."""
        steps = 0
        while (self.pending or any(s is not None for s in self.slots)) \
                and steps < max_steps:
            self.step()
            steps += 1
        out = self.finished
        self.finished = []
        return out
