"""Save/load parameter pytrees (dense or quantized) to disk.

The reference persists quantized models via ``--save-weights`` (torch
state_dict .pth) and ``--save-model`` (HF save_pretrained) in
eval.py:179-210. Here: a directory with one ``params.npz`` (flat
dotted-name -> array) plus ``meta.json`` describing QuantizedTensor leaves
and the model config, so a quantized checkpoint round-trips exactly.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.linear import QuantizedTensor
from ..quant.api import _copy_tree, _walk
from . import llama


def _to_np(a) -> tuple:
    """numpy's npz format cannot store bf16; persist its raw bits as uint16
    and record the true dtype."""
    a = np.asarray(a)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def save_params(path: str, params: Dict, cfg=None):
    os.makedirs(path, exist_ok=True)
    arrays = {}
    dtypes = {}
    qt_meta = {}

    def put(name, a):
        arrays[name], dtypes[name] = _to_np(a)

    for name, leaf, _ in _walk(params):
        if isinstance(leaf, QuantizedTensor):
            put(f"{name}.packed", leaf.packed)
            put(f"{name}.scales", leaf.scales)
            put(f"{name}.zeros", leaf.zeros)
            if leaf.lut is not None:
                put(f"{name}.lut", leaf.lut)
            qt_meta[name] = {
                "fmt": leaf.fmt, "group_size": leaf.group_size,
                "shape": list(leaf.shape), "dtype": str(leaf.dtype),
                "has_lut": leaf.lut is not None,
                # per-shard k-padding geometry: reloading without it would
                # reinterpret shard-padded words as contiguous columns
                "row_shards": leaf.row_shards,
            }
        elif leaf is not None:
            put(name, leaf)
    np.savez(os.path.join(path, "params.npz"), **arrays)
    meta = {"quantized": qt_meta, "dtypes": dtypes}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
        meta["config"]["dtype"] = str(cfg.dtype.__name__) \
            if hasattr(cfg.dtype, "__name__") else str(cfg.dtype)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_params(path: str) -> Tuple[Dict, "llama.LlamaConfig"]:
    raw = np.load(os.path.join(path, "params.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    qt_meta = meta.get("quantized", {})
    dtypes = meta.get("dtypes", {})

    class _Data:
        files = raw.files

        def __getitem__(self, name):
            a = raw[name]
            if dtypes.get(name) == "bfloat16":
                a = a.view(jnp.bfloat16)
            return a

    data = _Data()

    # rebuild the nested structure from dotted names
    tree: Dict = {}

    def ensure(parts):
        node = tree
        for i, p in enumerate(parts[:-1]):
            key = int(p) if p.isdigit() else p
            nxt_is_idx = parts[i + 1].isdigit()
            if isinstance(node, dict):
                if key not in node:
                    node[key] = [] if nxt_is_idx else {}
                node = node[key]
            else:  # list
                while len(node) <= key:
                    node.append({} if not nxt_is_idx else [])
                node = node[key]
        return node, parts[-1]

    def setleaf(name, value):
        parts = name.split(".")
        node, last = ensure(parts)
        key = int(last) if last.isdigit() else last
        if isinstance(node, list):
            while len(node) <= key:
                node.append(None)
            node[key] = value
        else:
            node[key] = value

    consumed = set()
    for qname, m in qt_meta.items():
        lut = jnp.asarray(data[f"{qname}.lut"]) if m["has_lut"] else None
        qt = QuantizedTensor(
            jnp.asarray(data[f"{qname}.packed"]),
            jnp.asarray(data[f"{qname}.scales"]),
            jnp.asarray(data[f"{qname}.zeros"]), lut,
            m["fmt"], m["group_size"], tuple(m["shape"]),
            jnp.dtype(m["dtype"].replace("bfloat16", "bfloat16")),
            m.get("row_shards", 1))
        setleaf(qname, qt)
        for suffix in ("packed", "scales", "zeros", "lut"):
            consumed.add(f"{qname}.{suffix}")
    for name in data.files:
        if name not in consumed:
            setleaf(name, jnp.asarray(data[name]))

    cfg = None
    if "config" in meta:
        c = dict(meta["config"])
        c["dtype"] = jnp.bfloat16 if "bfloat16" in str(c.get("dtype")) \
            else jnp.float32
        cfg = llama.LlamaConfig(**c)
    return tree, cfg
