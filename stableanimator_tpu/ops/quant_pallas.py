"""Pallas kernel: fused W8A8 matmul (in-kernel dynamic activation quant).

The XLA formulation of the int8 path (ops/quant.py::int8_matmul) measured
only 1.19x over bf16 at FF shapes on a v5e despite the MXU's 2x int8 peak:
the dynamic per-token quantization is three extra HBM passes over the
activations (fp32 |x| row-max reduce, the round/clip/cast write of xq, and
the matmul's re-read of xq), and XLA does not fuse reductions into matmul
prologues.

This kernel fuses the whole W8A8 pipeline into the matmul's VMEM tiles:

  grid (N-panels, M-panels), M innermost.  Per step:
    x tile   [bm, K]  bf16  -> fp32, row max -> s_x, round/clip -> int8
    w tile   [K, bn]  int8  (pre-quantized; resident across the inner loop)
    acc      int8 x int8 -> int32 MXU dot
    out tile [bm, bn] = acc * s_x * w_scale, cast to x.dtype

so the activations cross HBM exactly once per N-panel in bf16, xq never
exists in HBM, and the quant VPU work overlaps the MXU. Numerics: the
same round/clip/dequant formulas, fp32 scales, int32 accumulate as
ops/quant.py::int8_matmul. Outputs can differ from the XLA formulation by
at most ONE quantization step on rows where the compilers round the
`max|x|/127` scale to different 1-ulp neighbours (XLA rewrites the
constant division differently under jit vs inside Mosaic) — the parity
test bounds every element by 1.5 quant steps and requires the vast
majority to be bit-equal.

The weight stays quantized by ops/quant.py::quantize_weight in plain XLA:
it is loop-invariant inside the denoise scan, so XLA hoists it; fusing it
here would re-quantize per M-panel.

Backward: custom VJP through the XLA formulation (exact same math). The
int8 path is an inference-time opt-in, but grads must not crash.

Reference: the quantized path replaces the fp16 GEMMs the reference runs
through cuBLAS inside xformers/torch (animation/modules/unet.py:744-825);
there is no reference int8 mode — this is TPU-first headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu importable only on TPU builds; CPU tests run interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_QMAX = 127.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(m: int, k_pad: int, n_pad: int, x_bytes: int,
                 out_bytes: int, n_weights: int = 1) -> tuple[int, int]:
    """VMEM-budgeted (bm, bn). Accounts for pallas double-buffering of all
    operand blocks plus the kernel body's fp32 x copy, xq, and int32 acc.
    8 MB leaves headroom in the ~16 MB scoped VMEM for Mosaic relayouts
    (same empirical margin as the flash/temporal kernels). n_weights=2 for
    the GEGLU variant (value + gate panels resident together)."""
    budget = 8 * 1024 * 1024

    def est(bm, bn):
        operands = 2 * (bm * k_pad * x_bytes) \
            + n_weights * 2 * (k_pad * bn) \
            + 2 * (bm * bn * out_bytes) + n_weights * 4 * (bn * 4)
        body = bm * k_pad * 4 + bm * k_pad + n_weights * bm * bn * 4
        return operands + body

    # Mosaic block constraint: last dim a multiple of 128 (or the full
    # array), second-minor a multiple of 8 — keep bn on the 128 lattice
    # and bm on the 32 lattice through every shrink step
    bm = min(256, _round_up(m, 32))
    bn = min(2048, n_pad)
    while est(bm, bn) > budget and (bm > 32 or bn > 128):
        if bn * out_bytes >= bm * x_bytes and bn > 128:
            bn = max(128, bn // 2 // 128 * 128)
        elif bm > 32:
            bm = max(32, bm // 2 // 32 * 32)
        else:
            bn = max(128, bn // 2 // 128 * 128)
    # shrink each block to balance its panels: round_up(2560, bn=2048)
    # would compute a 4096-wide output (+60% MXU work and HBM traffic);
    # two 1280 panels cover it exactly. Shrinking never violates the
    # budget.
    n_panels = -(-n_pad // bn)
    bn = min(bn, _round_up(-(-n_pad // n_panels), 128))
    m_rows = -(-m // bm)
    bm = min(bm, _round_up(-(-m // m_rows), 32))
    return bm, bn


def _kernel(x_ref, wq_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                       # [bm, K]
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / _QMAX
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x / s_x), -_QMAX, _QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # [bm, bn] int32
    o_ref[...] = (acc.astype(jnp.float32) * (s_x * ws_ref[...])
                  ).astype(o_ref.dtype)


def _fwd_impl(x, w_q, w_scale, interpret):
    *lead, k = x.shape
    n = w_q.shape[1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)

    # K is the x-block lane axis AND the contraction: pad it explicitly so
    # out-of-bounds lanes are true zeros (zero columns never win the row
    # max; zero rows of w contribute 0 to the int32 accumulate)
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    bm, bn = _pick_blocks(m, k_pad, n_pad, x2.dtype.itemsize,
                          x2.dtype.itemsize)
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n_pad, bn)

    x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k)))
    wqp = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    wsp = jnp.pad(w_scale.reshape(1, n).astype(jnp.float32),
                  ((0, 0), (0, n_pad - n)), constant_values=1.0)

    sk = {"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}
    # N-panels outermost: the weight panel [K, bn] stays VMEM-resident
    # across the whole inner M sweep; activations stream
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda j, i: (i, 0), **sk),
            pl.BlockSpec((k_pad, bn), lambda j, i: (0, j), **sk),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), **sk),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j), **sk),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        interpret=interpret,
    )(x2, wqp, wsp)
    return out[:m, :n].reshape(*lead, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _int8_matmul_core(x, w_q, w_scale, interpret):
    return _fwd_impl(x, w_q, w_scale, interpret)


def _xla_formulation(x, w_q, w_scale):
    from stableanimator_tpu.ops.quant import int8_matmul

    return int8_matmul(x, w_q, w_scale)


def _core_fwd(x, w_q, w_scale, interpret):
    return _fwd_impl(x, w_q, w_scale, interpret), (x, w_q, w_scale)


def _core_bwd(interpret, res, g):
    x, w_q, w_scale = res
    _, vjp = jax.vjp(_xla_formulation, x, w_q, w_scale)
    return vjp(g)


_int8_matmul_core.defvjp(_core_fwd, _core_bwd)


def int8_matmul_pallas(x, w_q, w_scale, *, interpret: bool = False):
    """x [..., K] (bf16/fp32) @ int8 weight [K, N] with per-output-channel
    scales [N]; dynamic per-token activation quant fused into the matmul.
    Bit-matches ops/quant.py::int8_matmul."""
    return _int8_matmul_core(x, w_q, w_scale, interpret)


# ---------------------------------------------------------------------------
# GEGLU variant: out = (xWv + bv) * gelu(xWg + bg) with [Wv | Wg] the two
# halves of the GEGLU projection (models/layers.py::GEGLU, reference
# unet.py:859-870). Fusing the epilogue halves the first FF matmul's HBM
# output traffic (write N instead of 2N) and removes the separate
# split+gelu+mul elementwise pass entirely. Both int8 dots reuse the same
# in-VMEM xq; bias and activation run in fp32 before the single output cast
# (the unfused path rounds the projection to bf16 first — covered by the
# parity test's tolerance).
# ---------------------------------------------------------------------------


def _erf_as(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs error 1.5e-7), from
    primitives Mosaic can lower (abs/sign/exp/fma)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_kernel(x_ref, wv_ref, wg_ref, sv_ref, sg_ref, bv_ref, bg_ref,
                  o_ref):
    x = x_ref[...].astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / _QMAX
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x / s_x), -_QMAX, _QMAX).astype(jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    accv = jax.lax.dot_general(xq, wv_ref[...], dims,
                               preferred_element_type=jnp.int32)
    accg = jax.lax.dot_general(xq, wg_ref[...], dims,
                               preferred_element_type=jnp.int32)
    v = accv.astype(jnp.float32) * (s_x * sv_ref[...]) + bv_ref[...]
    g = accg.astype(jnp.float32) * (s_x * sg_ref[...]) + bg_ref[...]
    # exact-erf gelu. Mosaic lowers neither erfc (jax.nn.gelu's stable
    # form) nor erf itself, so erf comes from the Abramowitz-Stegun
    # 7.1.26 rational approximation: max abs error 1.5e-7 — fp32-eps
    # level, far below both bf16 resolution and the int8 quant noise.
    gelu_g = 0.5 * g * (1.0 + _erf_as(g * 0.7071067811865476))
    o_ref[...] = (v * gelu_g).astype(o_ref.dtype)


def _geglu_fwd_impl(x, w_q, w_scale, bias, interpret):
    *lead, k = x.shape
    n2 = w_q.shape[1]
    n = n2 // 2
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)

    wv, wg = w_q[:, :n], w_q[:, n:]
    sv, sg = w_scale[:n], w_scale[n:]
    if bias is None:
        bias = jnp.zeros((n2,), jnp.float32)
    bv, bg = bias[:n].astype(jnp.float32), bias[n:].astype(jnp.float32)

    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    bm, bn = _pick_blocks(m, k_pad, n_pad, x2.dtype.itemsize,
                          x2.dtype.itemsize, n_weights=2)
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n_pad, bn)

    x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k)))

    def padw(w):
        return jnp.pad(w, ((0, k_pad - k), (0, n_pad - n)))

    def padr(r, fill):
        return jnp.pad(r.reshape(1, n).astype(jnp.float32),
                       ((0, 0), (0, n_pad - n)), constant_values=fill)

    sk = {"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}
    row = pl.BlockSpec((1, bn), lambda j, i: (0, j), **sk)
    out = pl.pallas_call(
        _geglu_kernel,
        grid=(n_pad // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda j, i: (i, 0), **sk),
            pl.BlockSpec((k_pad, bn), lambda j, i: (0, j), **sk),
            pl.BlockSpec((k_pad, bn), lambda j, i: (0, j), **sk),
            row, row, row, row,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j), **sk),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        interpret=interpret,
    )(x2, padw(wv), padw(wg), padr(sv, 1.0), padr(sg, 1.0),
      padr(bv, 0.0), padr(bg, 0.0))
    return out[:m, :n].reshape(*lead, n)


def _geglu_xla(x, w_q, w_scale, bias):
    """The unfused formulation (ops/quant.py path + split/gelu/mul) — VJP
    recompute target and test oracle."""
    from stableanimator_tpu.ops.quant import int8_matmul

    out = int8_matmul(x, w_q, w_scale)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    value, gate = jnp.split(out, 2, axis=-1)
    return value * jax.nn.gelu(gate, approximate=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _int8_geglu_core(x, w_q, w_scale, bias, interpret):
    return _geglu_fwd_impl(x, w_q, w_scale, bias, interpret)


def _geglu_core_fwd(x, w_q, w_scale, bias, interpret):
    return (_geglu_fwd_impl(x, w_q, w_scale, bias, interpret),
            (x, w_q, w_scale, bias))


def _geglu_core_bwd(interpret, res, g):
    x, w_q, w_scale, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda a, wq, ws: _geglu_xla(a, wq, ws, None),
                         x, w_q, w_scale)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_geglu_xla, x, w_q, w_scale, bias)
    return vjp(g)


_int8_geglu_core.defvjp(_geglu_core_fwd, _geglu_core_bwd)


def int8_geglu_pallas(x, w_q, w_scale, bias=None, *, interpret: bool = False):
    """Fused W8A8 GEGLU: (x @ Wv + bv) * gelu(x @ Wg + bg), with
    [Wv | Wg] = w_q [K, 2N] and per-channel scales/bias laid out the same
    way (value half first, models/layers.py::GEGLU split order)."""
    return _int8_geglu_core(x, w_q, w_scale, bias, interpret)
