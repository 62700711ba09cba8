"""Int8 MXU matmul path (W8A8, dynamic per-token activation scales).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 vs 197
TOPS), and the UNet's feed-forward / projection matmuls are precision-tolerant
enough for post-training quantization (the reference itself ships fp16
inference; SmoothQuant/AWQ-style W8A8 on transformer FFNs is standard
practice). This module implements:

  * symmetric per-output-channel weight quantization (done once per call;
    the weight is loop-invariant inside the denoise `lax.scan`, so XLA's
    while-loop invariant code motion hoists it out of the 25-step loop),
  * symmetric dynamic per-token activation quantization in fp32,
  * int8 x int8 -> int32 `dot_general` with a fused dequant epilogue.

Quantized execution is OPT-IN (PipelineConfig.quant="int8_ffn"): it changes
numerics vs the bf16 reference path (relative output error ~1-2% per layer),
so the default product path and the official parity tests stay bf16/fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# keep a symmetric range; -128 would be asymmetric and risks int8 overflow
# in the MXU's signed accumulate
_QMAX = 127.0


def quantize_weight(w):
    """Symmetric per-output-channel int8 quantization of a [K, N] weight.

    Returns (w_q int8 [K, N], scale fp32 [N])."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / _QMAX
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w32 / s), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, s


def int8_matmul(x, w_q, w_scale):
    """x [..., K] (bf16/fp32) @ int8 weight with dynamic per-token act quant.

    Activation scales are max(|x|)/127 per token in fp32; the int32
    accumulator is dequantized by s_x * s_w in one fused epilogue. Output in
    x.dtype."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / _QMAX
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x32 / s_x), -_QMAX, _QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (s_x * w_scale)
    return out.astype(x.dtype)


def int8_dense(x, kernel, bias=None):
    """Drop-in for `x @ kernel + bias` through the int8 MXU path.

    kernel: [K, N] float param (quantized on the fly — loop-invariant, so
    hoisted out of scan loops by XLA); bias added in x.dtype."""
    wq, ws = quantize_weight(kernel)
    out = int8_matmul(x, wq, ws)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def int8_geglu(x, kernel, bias=None):
    """GEGLU projection through the int8 MXU path: kernel [K, 2N] holds
    [W_value | W_gate]; returns (xWv + bv) * gelu_exact(xWg + bg), shape
    [..., N] (models/layers.py::GEGLU split order)."""
    wq, ws = quantize_weight(kernel)
    out = int8_matmul(x, wq, ws)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    value, gate = jnp.split(out, 2, axis=-1)
    return value * jax.nn.gelu(gate, approximate=False)
