"""Tensor/data-parallel inference over a TPU device mesh.

The reference has no first-class parallelism -- multi-GPU is HF `accelerate`
layer placement (eval.py:168-177; SURVEY.md section 2.3). The TPU-native
replacement: a ``jax.sharding.Mesh`` over ICI with megatron-style tensor
parallelism expressed via ``shard_map``:

- q/k/v/gate/up projections are **column-parallel**: the weight's output dim
  (and so attention heads / FFN neurons) is split over the ``tp`` axis; for a
  QuantizedTensor that means sharding ``packed``/``lut`` on axis 0 and
  ``scales``/``zeros`` on axis 1 -- the packed codes *are* the sharded
  tensor.
- o/down projections are **row-parallel**: input dim split; each shard
  computes a partial product over its k-slice and a ``lax.psum`` over ``tp``
  combines them (hook in models/llama.py attention/mlp).
- the KV cache shards over heads (tp) and batch (dp); embeddings and norms
  are replicated.

Everything runs inside one ``shard_map`` so the Pallas kernels see local
shards (GSPMD cannot partition a pallas_call on its own).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..ops import linear as lin

# column-parallel leaves: shard output dim; row-parallel: shard input dim
_COL_KEYS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
             "qkv_proj", "gateup_proj")
_ROW_KEYS = ("o_proj", "down_proj")
_REPL_KEYS = ("input_layernorm", "post_attention_layernorm", "norm",
              "embed_tokens", "lm_head")


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp == len(devices), \
        f"dp*tp={dp * tp} != device count {len(devices)}"
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def _qt_spec(kind: str, qt: lin.QuantizedTensor) -> lin.QuantizedTensor:
    """PartitionSpecs for the leaves of a QuantizedTensor (mirrors None-ness
    of optional leaves so the pytree structures match)."""
    has_row_lut = qt.lut is not None and qt.lut.shape[0] == qt.shape[0]
    if kind == "col":  # shard n (output) dim
        lut = (P("tp", None) if has_row_lut
               else (None if qt.lut is None else P(None, None)))
        return lin.QuantizedTensor(
            packed=P("tp", None), scales=P(None, "tp"),
            zeros=P(None, "tp"), lut=lut,
            fmt=qt.fmt, group_size=qt.group_size, shape=qt.shape,
            dtype=qt.dtype, row_shards=qt.row_shards)
    else:               # row: shard k (input) dim
        lut = None if qt.lut is None else P(None, None)
        return lin.QuantizedTensor(
            packed=P(None, "tp"), scales=P("tp", None),
            zeros=P("tp", None), lut=lut,
            fmt=qt.fmt, group_size=qt.group_size, shape=qt.shape,
            dtype=qt.dtype, row_shards=qt.row_shards)


def _dense_spec(kind: str):
    return P("tp", None) if kind == "col" else P(None, "tp")


def param_specs(params: Dict) -> Dict:
    """Build a matching pytree of PartitionSpecs for a llama param tree."""

    def spec_for(name: str, leaf):
        last = name.split(".")[-1]
        if last in _COL_KEYS or last.endswith("_bias") and \
                last[:1] in ("q", "k", "v"):
            kind = "col"
        elif last in _ROW_KEYS:
            kind = "row"
        else:
            kind = "repl"
        if isinstance(leaf, lin.QuantizedTensor):
            if kind == "repl":
                return lin.QuantizedTensor(
                    P(None, None), P(None, None), P(None, None),
                    None if leaf.lut is None else P(None, None),
                    fmt=leaf.fmt, group_size=leaf.group_size,
                    shape=leaf.shape, dtype=leaf.dtype,
                    row_shards=leaf.row_shards)
            return _qt_spec(kind, leaf)
        if kind == "repl" or leaf.ndim != 2:
            return P(*([None] * getattr(leaf, "ndim", 1)))
        return _dense_spec(kind)

    from ..quant.api import _walk, _copy_tree
    out = _copy_tree(params)
    for name, leaf, setter in _walk(out):
        setter(spec_for(name, leaf))
    return out


def shard_params(params: Dict, mesh: Mesh) -> Tuple[Dict, Dict]:
    """device_put the param tree with TP shardings. Returns (params, specs)."""
    specs = param_specs(params)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    is_qt = lambda x: isinstance(x, (lin.QuantizedTensor,))
    shards = jax.tree_util.tree_map(
        put, params, specs,
        is_leaf=lambda x: isinstance(x, P))
    return shards, specs


def local_config(cfg: "llama.LlamaConfig", tp: int) -> "llama.LlamaConfig":
    """Per-shard head counts for column-parallel attention."""
    assert cfg.num_attention_heads % tp == 0, \
        f"{cfg.num_attention_heads} heads not divisible by tp={tp}"
    assert cfg.num_key_value_heads % tp == 0, \
        f"{cfg.num_key_value_heads} kv heads not divisible by tp={tp}"
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp)


def make_tp_forward(cfg: "llama.LlamaConfig", mesh: Mesh, param_spec,
                    with_cache: bool = False):
    """Build a jitted shard_map'd forward.

    Returns ``fn(params, input_ids[, kv_caches, cache_pos, mask])`` ->
    ``(logits, new_caches)``. Batch shards over ``dp``; heads/FFN over
    ``tp``; logits are replicated (psum'd partials after row-parallel
    layers happen inside).
    """
    tp = mesh.shape["tp"]
    cfg_local = local_config(cfg, tp)
    cache_spec = P("dp", None, "tp", None)  # [b, t, heads, hd]

    if not with_cache:
        def local_fn(params, input_ids):
            logits, _ = llama.forward(params, cfg_local, input_ids,
                                      psum_axis="tp")
            return logits

        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_spec, P("dp", None)),
            out_specs=P("dp", None, None),
            check_vma=False)
        return jax.jit(fn)

    def local_step(params, token, pos, kv_caches):
        max_len = kv_caches[0][0].shape[1]
        b = token.shape[0]
        positions = jnp.broadcast_to(pos, (b, 1))
        mask = llama.decode_mask(max_len, pos)
        logits, caches = llama.forward(
            params, cfg_local, token[:, None], positions=positions,
            kv_caches=kv_caches, cache_pos=pos, mask=mask, psum_axis="tp")
        return logits[:, -1, :], caches

    n_layers = cfg.num_hidden_layers
    caches_spec = [(cache_spec, cache_spec) for _ in range(n_layers)]
    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(param_spec, P("dp"), P(), caches_spec),
        out_specs=(P("dp", None), caches_spec),
        check_vma=False)
    return jax.jit(fn)
