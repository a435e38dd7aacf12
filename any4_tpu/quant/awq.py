"""AWQ-style activation-aware pre-quantization (scale search + clipping).

TPU-native re-derivation of the reference's pre_process/awq pipeline:
``run_awq`` grid-searches, per decoder block, a per-input-channel scaling
``s = x_max^ratio`` (20 ratios) that minimizes the quantized block-output
MSE, folds the winning scales into the preceding layernorm/linear
(auto_scale.py:34-156), then grid-searches per-row weight clipping
(auto_clip.py:11-101). Scaling is mathematically neutral in fp
(``(x / s) @ (W * s)^T == x @ W^T``) but moves quantization error away from
channels with large activations.

Here the model is a functional param pytree, so "apply scale" is a pure
pytree edit and the searched objective uses the framework's own
pseudo-quantizers. Four scale groups per Llama block (mirroring the
reference's llama adapter, pre_process/awq/auto_scale.py llama branches):

  1. input_layernorm -> {q,k,v}_proj
  2. v_proj -> o_proj           (fold into v rows)
  3. post_attention_layernorm -> {gate,up}_proj
  4. up_proj -> down_proj       (fold into up rows)
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quant


def pseudo_quantize(w: jax.Array, n_bit: int = 4,
                    group_size: int = 128) -> jax.Array:
    """Fake-quantize a weight with the framework's uniform grouped
    quantizer (the AWQ search objective's inner quantizer; reference
    quantizer.py pseudo_quantize_tensor)."""
    codes, scales, zeros = quant.group_quantize(w, n_bit, group_size)
    return quant.group_dequantize(codes, scales, zeros, n_bit,
                                  group_size).astype(w.dtype)


def _group_output(x: jax.Array, ws: List[jax.Array]) -> jax.Array:
    return jnp.concatenate([x @ w.T.astype(x.dtype) for w in ws], axis=-1)


def search_scale(x: jax.Array, weights: List[jax.Array], n_grid: int = 20,
                 n_bit: int = 4, group_size: int = 128
                 ) -> Tuple[jax.Array, float]:
    """Grid-search the best per-channel scale for a group of linears that
    share the input ``x`` [t, k]. Returns (scales [k], best_ratio).

    Candidate scales are ``x_max^ratio`` normalized to unit geometric mean
    (reference auto_scale.py:109-156).
    """
    x = x.astype(jnp.float32)
    x_max = jnp.mean(jnp.abs(x), axis=tuple(range(x.ndim - 1))) + 1e-8
    y_ref = _group_output(x, [w.astype(jnp.float32) for w in weights])
    best = (jnp.ones_like(x_max), float("inf"), 0.0)
    for i in range(n_grid):
        ratio = i / n_grid
        s = jnp.power(x_max, ratio)
        s = s / jnp.sqrt(s.max() * s.min())
        s = jnp.clip(s, 1e-4, 1e4)
        ws_q = [pseudo_quantize(w.astype(jnp.float32) * s[None, :],
                                n_bit, group_size) / s[None, :]
                for w in weights]
        y = _group_output(x, ws_q)
        mse = float(jnp.mean((y - y_ref) ** 2))
        if mse < best[1]:
            best = (s, mse, ratio)
    return best[0], best[2]


def search_clip(x: jax.Array, w: jax.Array, n_grid: int = 20,
                min_ratio: float = 0.5, n_bit: int = 4,
                group_size: int = 128) -> jax.Array:
    """Grid-search per-row max-magnitude clipping minimizing output MSE
    (reference auto_clip.py:11-66). Returns clipped weight."""
    x = x.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    y_ref = x @ w32.T
    absmax = jnp.abs(w32).max(axis=1, keepdims=True)
    best_w = w32
    best_mse = float("inf")
    for i in range(n_grid):
        ratio = 1.0 - (1.0 - min_ratio) * i / n_grid
        clipped = jnp.clip(w32, -absmax * ratio, absmax * ratio)
        wq = pseudo_quantize(clipped, n_bit, group_size)
        mse = float(jnp.mean((x @ wq.T - y_ref) ** 2))
        if mse < best_mse:
            best_mse = mse
            best_w = clipped
    return best_w.astype(w.dtype)


def run_awq(params: Dict, cfg, input_ids: jax.Array, n_bit: int = 4,
            group_size: int = 128, n_grid: int = 20,
            do_clip: bool = True, calib_tokens: Optional[int] = None,
            progress: bool = False) -> Tuple[Dict, Dict]:
    """Run the AWQ search over every decoder layer.

    Calibration inputs come from the model's own capture mechanism (one
    forward pass records per-linear mean-input statistics AND we re-run per
    layer to get actual activations via a second capture of raw inputs).
    Returns ``(awq_results, new_params)`` where awq_results records scales
    and clip ratios per layer (the reference's ``--dump_awq`` artifact).
    """
    from ..models import llama, opt as opt_mod

    # capture each linear's input activations: rerun forward with a raw
    # store (memory-heavy for big models; calibration inputs are small)
    acts: Dict[str, list] = {}
    orig_capture = llama._capture

    def capture_raw(store, name, x):
        orig_capture(store, name, x)
        acts.setdefault(name, []).append(
            np.asarray(x.reshape(-1, x.shape[-1]), np.float32))

    is_opt = "fc1" in params["layers"][0]
    fwd = opt_mod.forward if is_opt else llama.forward
    llama._capture = capture_raw
    try:
        fwd(params, cfg, input_ids, capture={})
    finally:
        llama._capture = orig_capture

    from .api import _copy_tree
    out = _copy_tree(params)
    results = {"scales": {}, "clip": {}}

    for i, layer in enumerate(out["layers"]):
        def act(nm):
            return jnp.asarray(np.concatenate(acts[f"layers.{i}.{nm}"]))

        if is_opt:
            # OPT schema (reference pre_quant.py opt adapter)
            groups = [
                ("self_attn_layer_norm", ("q_proj", "k_proj", "v_proj"),
                 act("q_proj")),
                ("v_proj", ("out_proj",), act("out_proj")),
                ("final_layer_norm", ("fc1",), act("fc1")),
                ("fc1", ("fc2",), act("fc2")),
            ]
            clip_targets = ("out_proj", "fc1", "fc2", "v_proj")
        else:
            groups = [
                ("input_layernorm", ("q_proj", "k_proj", "v_proj"),
                 act("q_proj")),
                ("v_proj", ("o_proj",), act("o_proj")),
                ("post_attention_layernorm", ("gate_proj", "up_proj"),
                 act("gate_proj")),
                ("up_proj", ("down_proj",), act("down_proj")),
            ]
            clip_targets = ("o_proj", "gate_proj", "up_proj", "down_proj",
                            "v_proj")
        for prev, targets, x in groups:
            s, ratio = search_scale(x, [layer[t] for t in targets],
                                    n_grid=n_grid, n_bit=n_bit,
                                    group_size=group_size)
            s_prev = s
            if prev == "v_proj" and not is_opt:
                # GQA: o_proj's input channels repeat each kv head `rep`
                # times, so an exact fold needs the scale shared within
                # each repeated-head block (geometric mean)
                hd = cfg.head_dim_
                rep = cfg.num_attention_heads // cfg.num_key_value_heads
                if rep > 1:
                    s_kv = jnp.exp(jnp.mean(
                        jnp.log(s.reshape(cfg.num_key_value_heads, rep,
                                          hd)), axis=1))
                    s = jnp.repeat(s_kv, rep, axis=0).reshape(-1)
                    s_prev = s_kv.reshape(-1)
            # scale target weights up; fold 1/s into the producer
            for t in targets:
                layer[t] = (layer[t].astype(jnp.float32)
                            * s[None, :]).astype(layer[t].dtype)
            if prev.endswith(("layernorm", "layer_norm")):
                layer[prev] = _fold_norm(layer[prev], s_prev)
            else:  # fold into the producing linear's output rows
                layer[prev] = (layer[prev].astype(jnp.float32)
                               / s_prev[:, None]).astype(layer[prev].dtype)
                bkey = prev.replace("_proj", "_bias") \
                    if prev.endswith("_proj") else prev + "_bias"
                if bkey in layer:  # bias scales with its rows (OPT fc1)
                    layer[bkey] = (layer[bkey].astype(jnp.float32)
                                   / s_prev).astype(layer[bkey].dtype)
            results["scales"][f"layers.{i}.{prev}"] = {
                "ratio": ratio, "scales": np.asarray(s),
                "scales_prev": np.asarray(s_prev)}
            if progress:
                print(f"  awq layer {i} {prev}->{targets}: ratio {ratio:.2f}")

        if do_clip:
            # clip non-qk weights (reference skips q/k, auto_clip usage)
            for nm in clip_targets:
                x = act(nm)
                layer[nm] = search_clip(x[:min(len(x), 512)], layer[nm],
                                        n_grid=max(4, n_grid // 4),
                                        n_bit=n_bit, group_size=group_size)
    return results, out


def _fold_norm(norm, s):
    """Fold 1/s into a normalization producer: rms weight (array) or
    LayerNorm dict {weight, bias} (both scale, since LN output is
    w*x_hat + b)."""
    if isinstance(norm, dict):
        return {"weight": (norm["weight"].astype(jnp.float32)
                           / s).astype(norm["weight"].dtype),
                "bias": (norm["bias"].astype(jnp.float32)
                         / s).astype(norm["bias"].dtype)}
    return (norm.astype(jnp.float32) / s).astype(norm.dtype)


def apply_awq(params: Dict, awq_results: Dict) -> Dict:
    """Re-apply previously-searched AWQ scales to a fresh model (the
    reference's ``--load_awq`` path, pre_process/pre_quant.py:44-55)."""
    from .api import _copy_tree
    out = _copy_tree(params)
    groups = {
        "input_layernorm": ("q_proj", "k_proj", "v_proj"),
        "v_proj": ("o_proj",),
        "post_attention_layernorm": ("gate_proj", "up_proj"),
        "up_proj": ("down_proj",),
        # OPT schema
        "self_attn_layer_norm": ("q_proj", "k_proj", "v_proj"),
        "final_layer_norm": ("fc1",),
        "fc1": ("fc2",),
    }
    if "fc1" in out["layers"][0]:
        groups = dict(groups)
        groups["v_proj"] = ("out_proj",)
    for key, info in awq_results.get("scales", {}).items():
        parts = key.split(".")
        layer = out["layers"][int(parts[1])]
        prev = parts[2]
        s = jnp.asarray(info["scales"])
        s_prev = jnp.asarray(info.get("scales_prev", info["scales"]))
        for t in groups[prev]:
            layer[t] = (layer[t].astype(jnp.float32)
                        * s[None, :]).astype(layer[t].dtype)
        if prev.endswith(("layernorm", "layer_norm")):
            layer[prev] = _fold_norm(layer[prev], s_prev)
        else:
            layer[prev] = (layer[prev].astype(jnp.float32)
                           / s_prev[:, None]).astype(layer[prev].dtype)
            bkey = prev.replace("_proj", "_bias") \
                if prev.endswith("_proj") else prev + "_bias"
            if bkey in layer:
                layer[bkey] = (layer[bkey].astype(jnp.float32)
                               / s_prev).astype(layer[bkey].dtype)
    return out


pre_quant_methods = {"awq": run_awq}
