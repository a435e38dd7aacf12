"""Activation calibration: per-layer mean |input| magnitudes.

The reference registers forward hooks on every nn.Linear and accumulates the
mean absolute input activation per input feature over a prompt or dataset
(calibrate.py:41-185); the result feeds any4's weighted k-means
(``sample_weight``). Functionally in JAX: the model's forward takes a
``capture`` dict and accumulates (sum, count) per linear input under names
matching the parameter tree (see models/llama.py), so calibration is just a
forward pass.

The reference found a single handwritten multi-domain prompt calibrates as
well as 128x2048 C4 samples (README.md:361-371); :data:`default_prompt` is
this framework's equivalent.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import llama

# A handwritten multi-domain calibration prompt (fiction, news, code, math,
# facts) -- same *spirit* as the reference's default_prompt
# (calibrate.py:27-33), independently written.
default_prompt = """Calibration passage spanning several domains.
Story: The lighthouse keeper climbed the spiral stairs at dusk, counting
each step while the storm gathered over the bay, and wondered whether the
supply boat would arrive before the lamp oil ran out.
News: Markets rallied on Tuesday after the central bank signalled a pause
in rate hikes; analysts cautioned that inflation data due Friday could
reverse the gains.
Code: def fib(n):\n    a, b = 0, 1\n    for _ in range(n):\n        a, b = b, a + b\n    return a
Math: (12.5 * 3.2 - 7.75) / 4.05 + 18 % 5 = approximately 9.9
Facts: Water boils at 100 degrees Celsius at sea level. Mount Everest rises
8,849 metres above sea level. The mitochondrion is the powerhouse of the
cell."""


def calibrate(
    params: Dict,
    cfg: "llama.LlamaConfig",
    input_ids: jax.Array,
    layers: Optional[List[str]] = None,
    use_abs: bool = True,
    batch_size: int = 1,
    forward_fn: Callable = None,
) -> Dict[str, jax.Array]:
    """Run forward passes over ``input_ids`` ``[num_seqs, seq_len]`` and
    return ``{linear_name: mean |input| [k]}``.

    ``layers`` optionally restricts capture to specific names (the
    reference's per-layer online-calibration mode, calibrate.py:110).
    ``use_abs=False`` averages signed activations (reference ``abs`` flag).
    """
    forward_fn = forward_fn or llama.forward
    capture: Dict[str, tuple] = {}
    n = input_ids.shape[0]
    for i in range(0, n, batch_size):
        batch = input_ids[i:i + batch_size]
        store: Dict[str, tuple] = {}
        forward_fn(params, cfg, batch, capture=store)
        for name, (sa, ss, c) in store.items():
            if layers is not None and name not in layers:
                continue
            if name in capture:
                pa, ps, pc = capture[name]
                capture[name] = (pa + sa, ps + ss, pc + c)
            else:
                capture[name] = (sa, ss, c)
    out = {}
    for name, (sa, ss, c) in capture.items():
        out[name] = (sa if use_abs else ss) / c
    return out


def make_calibrate_fn(params, cfg, input_ids, **kwargs):
    """Bind a calibrate callable usable as ``quantize_model(calibrate_fn=...)``
    (the per-layer online mode; reference quantize.py:56-63)."""

    def fn(layers: Optional[List[str]] = None, seed: int = 0):
        acts = calibrate(params, cfg, input_ids, layers=layers, **kwargs)
        if layers is not None and len(layers) == 1:
            return acts.get(layers[0])
        return acts

    return fn


def save_calibration(acts: Dict[str, jax.Array], path: str):
    np.savez(path, **{k: np.asarray(v) for k, v in acts.items()})


def load_calibration(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}
