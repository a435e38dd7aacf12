"""any4-tpu: TPU-native 4-bit LLM quantization and inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/any4 (ICML 2025): learned per-row 16-entry LUT quantization
(any4) plus int4/int8/nf4/fp4/MX4 group formats, fused low-latency
dequant+matmul Pallas kernels for GEMV-shaped decode workloads, a vectorized
on-device quantization pipeline, an evaluation harness, and a sharded serving
path over TPU meshes.
"""

__version__ = "0.1.0"

from .ops import packing, quant, formats  # noqa: F401
from .quant import kmeans, anyq  # noqa: F401
