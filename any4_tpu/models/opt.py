"""Functional JAX OPT decoder (facebook/opt-*), the reference's second eval
family (tests/test_eval.py and the golden opt-125m perplexity,
test_accuracy.py:51).

Architecturally distinct from Llama: learned positional embeddings (with
OPT's +2 offset), pre/post LayerNorm with bias, fused-head attention with
biases, and a ReLU fc1/fc2 MLP. Parameters are a nested pytree whose linear
leaves may be dense or QuantizedTensor (fc1/fc2/q,k,v,out_proj are
quantization targets -- covered by api.DEFAULT_LINEAR_KEYS).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import linear as lin


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    dtype: Any = jnp.bfloat16

    @classmethod
    def opt_125m(cls):
        return cls()

    @classmethod
    def tiny(cls, vocab=256, layers=2):
        return cls(vocab_size=vocab, hidden_size=64, ffn_dim=128,
                   num_hidden_layers=layers, num_attention_heads=4,
                   max_position_embeddings=128)


@functools.partial(jax.jit, static_argnums=(0,))
def init_params(cfg: OPTConfig, key: jax.Array) -> Dict:
    d, f = cfg.hidden_size, cfg.ffn_dim
    keys = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 8))

    def dense(k, n_out, n_in):
        return (jax.random.normal(k, (n_out, n_in), jnp.float32) *
                (1.0 / jnp.sqrt(n_in))).astype(cfg.dtype)

    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(
            next(keys), (cfg.vocab_size, d), jnp.float32
        ).astype(cfg.dtype) * 0.02,
        "embed_positions": jax.random.normal(
            next(keys), (cfg.max_position_embeddings + 2, d), jnp.float32
        ).astype(cfg.dtype) * 0.02,
        "final_layer_norm": {"weight": jnp.ones((d,), cfg.dtype),
                             "bias": jnp.zeros((d,), cfg.dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "self_attn_layer_norm": {"weight": jnp.ones((d,), cfg.dtype),
                                     "bias": jnp.zeros((d,), cfg.dtype)},
            "final_layer_norm": {"weight": jnp.ones((d,), cfg.dtype),
                                 "bias": jnp.zeros((d,), cfg.dtype)},
            "q_proj": dense(next(keys), d, d),
            "k_proj": dense(next(keys), d, d),
            "v_proj": dense(next(keys), d, d),
            "out_proj": dense(next(keys), d, d),
            "q_bias": jnp.zeros((d,), cfg.dtype),
            "k_bias": jnp.zeros((d,), cfg.dtype),
            "v_bias": jnp.zeros((d,), cfg.dtype),
            "out_bias": jnp.zeros((d,), cfg.dtype),
            "fc1": dense(next(keys), f, d),
            "fc1_bias": jnp.zeros((f,), cfg.dtype),
            "fc2": dense(next(keys), d, f),
            "fc2_bias": jnp.zeros((d,), cfg.dtype),
        })
    return params


def layer_norm(x: jax.Array, p: Dict, eps: float = 1e-5) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(dt)


def forward(params: Dict, cfg: OPTConfig, input_ids: jax.Array,
            positions: Optional[jax.Array] = None,
            mask: Optional[jax.Array] = None,
            capture: Optional[dict] = None, **kw):
    """Full-sequence forward. Returns (logits, None)."""
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = lin.embed(params["embed_tokens"], input_ids)
    # OPT's learned positions carry a +2 offset (HF OPTLearnedPositionalEmbedding)
    x = x + jnp.take(params["embed_positions"], positions + 2,
                     axis=0).astype(x.dtype)
    x = x.astype(cfg.dtype)

    if mask is None and t > 1:
        mask = jnp.where(jnp.tril(jnp.ones((t, t), jnp.bool_)), 0.0,
                         -1e9)[None, None].astype(jnp.float32)

    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    scale = 1.0 / jnp.sqrt(hd).astype(jnp.float32)

    from .llama import _capture
    for li, layer in enumerate(params["layers"]):
        res = x
        h = layer_norm(x, layer["self_attn_layer_norm"]) \
            if cfg.do_layer_norm_before else x
        if capture is not None:
            for nm in ("q_proj", "k_proj", "v_proj"):
                _capture(capture, f"layers.{li}.{nm}", h)
        q = lin.linear(h, layer["q_proj"], layer["q_bias"], **kw)
        k = lin.linear(h, layer["k_proj"], layer["k_bias"], **kw)
        v = lin.linear(h, layer["v_proj"], layer["v_bias"], **kw)
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nh, hd)
        v = v.reshape(b, t, nh, hd)
        logits_a = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                              k.astype(jnp.float32)) * scale
        if mask is not None:
            logits_a = logits_a + mask
        probs = jax.nn.softmax(logits_a, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, nh * hd)
        if capture is not None:
            _capture(capture, f"layers.{li}.out_proj", o)
        o = lin.linear(o, layer["out_proj"], layer["out_bias"], **kw)
        x = res + o
        if not cfg.do_layer_norm_before:
            x = layer_norm(x, layer["self_attn_layer_norm"])

        res = x
        h = layer_norm(x, layer["final_layer_norm"]) \
            if cfg.do_layer_norm_before else x
        if capture is not None:
            _capture(capture, f"layers.{li}.fc1", h)
        h = lin.linear(h, layer["fc1"], layer["fc1_bias"], **kw)
        h = jnp.maximum(h, 0)
        if capture is not None:
            _capture(capture, f"layers.{li}.fc2", h)
        h = lin.linear(h, layer["fc2"], layer["fc2_bias"], **kw)
        x = res + h
        if not cfg.do_layer_norm_before:
            x = layer_norm(x, layer["final_layer_norm"])

    x = layer_norm(x, params["final_layer_norm"])
    if isinstance(params["embed_tokens"], lin.QuantizedTensor):
        logits = lin.linear(x, params["embed_tokens"], **kw)
    else:
        logits = x @ params["embed_tokens"].T.astype(x.dtype)
    return logits, None


def load_hf_opt(model_dir: str, dtype=jnp.bfloat16):
    """Load an HF OPT checkpoint directory into the functional pytree."""
    import json
    import os

    from .loader import _open_shards

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = OPTConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        ffn_dim=hf["ffn_dim"], num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        max_position_embeddings=hf["max_position_embeddings"],
        do_layer_norm_before=hf.get("do_layer_norm_before", True))
    get, names = _open_shards(model_dir)

    def arr(name):
        pfx = "model.decoder." if f"model.decoder.{name}" in names else ""
        return jnp.asarray(get(pfx + name)).astype(dtype)

    params = {
        "embed_tokens": arr("embed_tokens.weight"),
        "embed_positions": arr("embed_positions.weight"),
        "final_layer_norm": {"weight": arr("final_layer_norm.weight"),
                             "bias": arr("final_layer_norm.bias")},
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        params["layers"].append({
            "self_attn_layer_norm": {
                "weight": arr(p + "self_attn_layer_norm.weight"),
                "bias": arr(p + "self_attn_layer_norm.bias")},
            "final_layer_norm": {
                "weight": arr(p + "final_layer_norm.weight"),
                "bias": arr(p + "final_layer_norm.bias")},
            "q_proj": arr(p + "self_attn.q_proj.weight"),
            "k_proj": arr(p + "self_attn.k_proj.weight"),
            "v_proj": arr(p + "self_attn.v_proj.weight"),
            "out_proj": arr(p + "self_attn.out_proj.weight"),
            "q_bias": arr(p + "self_attn.q_proj.bias"),
            "k_bias": arr(p + "self_attn.k_proj.bias"),
            "v_bias": arr(p + "self_attn.v_proj.bias"),
            "out_bias": arr(p + "self_attn.out_proj.bias"),
            "fc1": arr(p + "fc1.weight"),
            "fc1_bias": arr(p + "fc1.bias"),
            "fc2": arr(p + "fc2.weight"),
            "fc2_bias": arr(p + "fc2.bias"),
        })
    return cfg, params
