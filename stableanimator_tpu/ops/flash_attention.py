"""Pallas TPU flash-attention (forward) kernel.

Replaces the reference's xformers CUDA `memory_efficient_attention`
(reference animation/modules/unet.py:1841,1900,1990,2010) for the hot
spatial self-attention: sequences of H*W tokens (4096 at 512^2, 9216 at
576x1024) with head_dim 64.

Design:
  * grid over (batch*heads, q-blocks); each program holds its q block plus
    the full K/V for that (batch, head) in VMEM (<= ~2.5 MB at 9216x64 bf16)
    and streams K/V in `block_k` chunks through the MXU with an online
    softmax (running max / normaliser), accumulating in float32.
  * arbitrary (non-multiple) sequence lengths handled by zero-padding plus
    an iota mask on the key axis.
  * no attention bias / mask / dropout — the model never uses them
    (reference unet.py:823 asserts attention_mask is None).

The backward pass is provided via jax.custom_vjp: dq/dk/dv are computed by
Pallas kernels that recompute the probabilities blockwise (flash-attention-2
style), so the [S, S] matrix is never materialised in HBM in either
direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable on TPU-enabled builds; guard for CPU tests
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len, kv_pad):
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, d]
    block_q, d = q.shape
    num_kv = kv_pad // block_k

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(q_len: int, kv_len: int):
    block_q = min(512, _round_up(q_len, 128))
    block_k = min(1024, _round_up(kv_len, 128))
    return block_q, block_k


def _flash_fwd(q, k, v, scale, interpret=False):
    """q: [BH, Sq, D]; k/v: [BH, Sk, D] -> o: [BH, Sq, D]."""
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    block_q, block_k = _pick_blocks(q_len, kv_len)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    if q_pad != q_len:
        q = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, kv_len=kv_len, kv_pad=kv_pad
    )
    grid = (bh, q_pad // block_q)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    spec_kwargs = {"memory_space": mem} if mem is not None else {}
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    if q_pad != q_len:
        out = out[:, :q_len]
    return out


# ---------------------------------------------------------------------------
# Backward kernels (flash-attention-2 recompute style)
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, aux_ref, do_ref, dk_ref, dv_ref, *,
                    scale, block_q, q_len, q_pad):
    """One program per (batch*head, kv-block): accumulate dk, dv over all q.

    Probabilities are recomputed blockwise against the stored row
    log-sum-exp:  p_ij = exp(s_ij - lse_i).  `aux` packs per-row scalars into
    one well-tiled [q, d] operand: delta_i = sum(do_i * o_i) in column 0 and
    lse_i in column d-1 (see _flash_bwd)."""
    k = k_ref[0].astype(jnp.float32)  # [block_k, d]
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    num_q = q_pad // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        aux = aux_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
        s = jnp.where(row < q_len, s, NEG_INF)
        lse = aux[:, d - 1:d]
        p = jnp.exp(s - lse)
        delta = aux[:, :1]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk0 = jnp.zeros((block_k, d), dtype=jnp.float32)
    dv0 = jnp.zeros((block_k, d), dtype=jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    # q was pre-multiplied by `scale` inside the loop, so dk = ds^T (scale*q)
    # already carries the scale factor — no extra multiply here.
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, aux_ref, do_ref, dq_ref, *,
                   scale, block_k, kv_len, kv_pad):
    """One program per (batch*head, q-block): accumulate dq over all kv."""
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    aux = aux_ref[0].astype(jnp.float32)  # [block_q, d]: col0=delta, col d-1=lse
    block_q, d = q.shape
    lse = aux[:, d - 1:d]
    delta = aux[:, :1]
    num_kv = kv_pad // block_k

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((block_q, d), dtype=jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _fwd_kernel_with_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                         scale, block_k, kv_len, kv_pad):
    """Forward that additionally writes the row log-sum-exp (for backward)."""
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kv = kv_pad // block_k

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (block_q, d)).astype(lse_ref.dtype)


def _flash_fwd_res(q, k, v, scale, interpret=False):
    """Forward returning (o, lse) for the custom-vjp residuals."""
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    block_q, block_k = _pick_blocks(q_len, kv_len)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    if q_pad != q_len:
        q = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    kernel = functools.partial(
        _fwd_kernel_with_lse, scale=scale, block_k=block_k, kv_len=kv_len, kv_pad=kv_pad
    )
    grid = (bh, q_pad // block_q)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    spec_kwargs = {"memory_space": mem} if mem is not None else {}
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad, d), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    return o[:, :q_len], lse[:, :q_len, :1]


def _flash_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    block_q, block_k = _pick_blocks(q_len, kv_len)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * o.astype(jnp.float32), axis=-1, keepdims=True)  # [bh,Sq,1]
    # aux carries (delta | ... | lse) in one [bh, Sq, d] tensor so the kernels
    # read a single well-tiled operand instead of two skinny ones.
    aux = jnp.zeros((bh, q_len, d), jnp.float32)
    aux = aux.at[:, :, 0:1].set(delta).at[:, :, d - 1:d].set(lse)

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, q_pad - q_len), (0, 0))) if q_pad != q_len else x

    def pad_kv(x):
        return jnp.pad(x, ((0, 0), (0, kv_pad - kv_len), (0, 0))) if kv_pad != kv_len else x

    qp, gp, auxp = pad_q(q), pad_q(g), pad_q(aux)
    kp, vp = pad_kv(k), pad_kv(v)

    mem = pltpu.VMEM if _HAS_PLTPU else None
    spec_kwargs = {"memory_space": mem} if mem is not None else {}

    # dk/dv: grid over kv blocks; o_ref operand is replaced by aux (delta+lse)
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_q=block_q, q_len=q_len, q_pad=q_pad
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, kv_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, q_pad, d), lambda b, j: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), **spec_kwargs),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), **spec_kwargs),
            pl.BlockSpec((1, q_pad, d), lambda b, j: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, q_pad, d), lambda b, j: (b, 0, 0), **spec_kwargs),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), **spec_kwargs),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), **spec_kwargs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, kv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, kv_pad, d), v.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, auxp, gp)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, block_k=block_k, kv_len=kv_len, kv_pad=kv_pad
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), **spec_kwargs),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, auxp, gp)

    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_bh(q, k, v, scale, interpret):
    return _flash_fwd(q, k, v, scale, interpret)


def _flash_attention_bh_fwd(q, k, v, scale, interpret):
    o, lse = _flash_fwd_res(q, k, v, scale, interpret)
    return o, (q, k, v, o, lse)


_flash_attention_bh.defvjp(_flash_attention_bh_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: float | None = None, interpret: bool = False):
    """Flash attention over [B, S, H, D] inputs (jax.nn layout).

    Differentiable (custom VJP with Pallas backward kernels). Falls back to
    the caller to decide when XLA attention is preferable (tiny kv).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    o = _flash_attention_bh(qt, kt, vt, float(scale), interpret)
    return o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
