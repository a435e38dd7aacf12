"""Greedy / sampled autoregressive generation with a static KV cache.

TPU-first decode: prefill is one jitted call over the padded prompt; each
decode step is a jitted single-token forward with `dynamic_update_slice` KV
writes -- static shapes throughout so XLA compiles exactly two programs.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import llama


def _prefill_mask(t: int, max_len: int) -> jax.Array:
    """Causal mask for prefill writing into a [max_len] cache."""
    q = jnp.arange(t)[:, None]
    s = jnp.arange(max_len)[None, :]
    return jnp.where(s <= q, 0.0, -1e9)[None, None].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict, cfg: "llama.LlamaConfig", input_ids: jax.Array,
            kv_caches):
    b, t = input_ids.shape
    max_len = kv_caches[0][0].shape[1]
    logits, caches = llama.forward(
        params, cfg, input_ids, kv_caches=kv_caches, cache_pos=None,
        mask=_prefill_mask(t, max_len))
    return logits[:, -1, :], caches


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: Dict, cfg: "llama.LlamaConfig", token: jax.Array,
                pos: jax.Array, kv_caches):
    """One decode step. token: [b], pos: scalar int32 (cache write index)."""
    b = token.shape[0]
    max_len = kv_caches[0][0].shape[1]
    positions = jnp.broadcast_to(pos, (b, 1))
    mask = llama.decode_mask(max_len, pos)
    logits, caches = llama.forward(
        params, cfg, token[:, None], positions=positions,
        kv_caches=kv_caches, cache_pos=pos, mask=mask)
    return logits[:, -1, :], caches


def generate(params: Dict, cfg: "llama.LlamaConfig", prompt_ids: jax.Array,
             max_new_tokens: int = 32, temperature: float = 0.0,
             key: Optional[jax.Array] = None,
             eos_token_id: Optional[int] = None) -> jax.Array:
    """Generate greedily (or sample with ``temperature > 0``).

    prompt_ids: [b, t_prompt] int32. Returns [b, t_prompt + max_new_tokens].
    """
    b, tp = prompt_ids.shape
    max_len = tp + max_new_tokens
    caches = llama.init_kv_caches(cfg, b, max_len)
    logits, caches = prefill(params, cfg, prompt_ids, caches)

    tokens = [prompt_ids]
    tok = None
    done = jnp.zeros((b,), jnp.bool_)
    for i in range(max_new_tokens):
        if temperature > 0:
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        tok = tok.astype(jnp.int32)
        if eos_token_id is not None:
            tok = jnp.where(done, eos_token_id, tok)
            done = done | (tok == eos_token_id)
        tokens.append(tok[:, None])
        if i + 1 < max_new_tokens:
            logits, caches = decode_step(
                params, cfg, tok, jnp.int32(tp + i), caches)
    return jnp.concatenate(tokens, axis=1)
