"""Pallas TPU flash-attention kernel.

Replaces the reference's xformers CUDA `memory_efficient_attention`
(reference animation/modules/unet.py:1841,1900,1990,2010) for the hot
spatial self-attention: sequences of H*W tokens (4096 at 512^2, 9216 at
576x1024) with head_dim 64.

Design (informed by device profiles):
  * operates directly on the model's [B, S, H, D] layout — the grid maps
    (batch, head, q-block) and BlockSpecs slice the head axis, so no
    transposes are materialised around the kernel (transpose copies were
    ~9% of UNet device time),
  * K/V for one (batch, head) live in VMEM (<= ~2.5 MB at 9216x64 bf16)
    and stream through the MXU in `block_k` chunks with an online softmax,
  * probabilities are cast back to the input dtype for the P.V matmul
    (fp32 matmuls run at half MXU rate); accumulation stays fp32,
  * arbitrary sequence lengths via zero-padding + iota masks,
  * no bias/mask/dropout — the model never uses them (unet.py:823).

Backward (training) uses flash-2-style blockwise-recompute kernels through
a custom VJP; dq/dk/dv never materialise the [S, S] matrix either.
"""

from __future__ import annotations

import functools
import os
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(q_len: int, kv_len: int, hd: int = 64):
    """VMEM-budgeted tiles. The streamed forward fuses every head on the
    feature axis, so per-block VMEM scales with hd = H*D: double-buffered
    K/V (2*2*block_k*hd*2B) + fp32 accumulator (block_q*hd*4B) + logits
    (block_q*block_k*4B) + q/o blocks must stay inside the ~16 MB scoped
    VMEM limit. 512/1024 measured fastest at hd<=512 (one v5e chip);
    wider fused-head widths (576x1024 levels: hd=640, 1280) halve the
    tiles — at hd=640 the old tiles hit 20.7 MB and failed to compile."""
    if hd <= 512:
        bq, bk = 512, 1024
    elif hd <= 1024:
        # swept on-chip at hd=640 (S=1024 and 2304): 256:1024 beats
        # 512:512 / 256:512 / 512:1024 at both lengths and stays ~11 MB
        bq, bk = 256, 1024
    else:
        bq, bk = 256, 512
    block_q = min(bq, _round_up(q_len, 128))
    block_k = min(bk, _round_up(kv_len, 128))
    return block_q, block_k


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale, num_heads, block_k, kv_len, with_lse):
    """Grid (batch, q-block, kv-block); kv innermost. Blocks carry all heads
    fused on the last axis ([1, block_q, H*d]) - static column slices per
    head, so no layout copies outside the kernel. The running max /
    normaliser and the fp32 accumulator live in scratch that persists
    across the kv grid axis (canonical streamed flash), so VMEM stays a few
    MB for any sequence length."""
    hd = q_ref.shape[-1]
    d = hd // num_heads
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for hi in range(num_heads):
        lo = hi * d
        q = q_ref[0, :, lo:lo + d]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        k_blk = k_ref[0, :, lo:lo + d]
        v_blk = v_ref[0, :, lo:lo + d]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k] fp32
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_prev = m_ref[:, hi:hi + 1]
        l_prev = l_ref[:, hi:hi + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, hi:hi + 1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, hi:hi + 1] = m_new
        # cast P to the value dtype: bf16 x bf16 runs at full MXU rate
        acc_ref[:, lo:lo + d] = acc_ref[:, lo:lo + d] * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv - 1)
    def _emit():
        for hi in range(num_heads):
            lo = hi * d
            l = l_ref[:, hi:hi + 1]
            o_ref[0, :, lo:lo + d] = (acc_ref[:, lo:lo + d] / l).astype(o_ref.dtype)
            if with_lse:
                lse = m_ref[:, hi:hi + 1] + jnp.log(l)
                lse_ref[0, :, lo:lo + d] = jnp.broadcast_to(
                    lse, (lse_ref.shape[1], d)).astype(lse_ref.dtype)


def _fwd_kernel_resident(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                         scale, heads_per_step, block_k, kv_len, with_lse):
    """Resident-KV forward: grid (batch, head-pair, q-block). K/V columns for
    `heads_per_step` heads live in VMEM for the whole q sweep (their
    index_map is constant along the q axis, so Pallas fetches them once per
    (batch, head-pair)), eliminating the K/V re-streaming of the streamed
    kernel (~8x less HBM traffic at S=4096). Online softmax runs in an
    internal fori_loop over kv chunks; no cross-step scratch needed."""
    hpd = q_ref.shape[-1]              # heads_per_step * d
    d = hpd // heads_per_step
    kv_pad = k_ref.shape[1]
    num_kv = kv_pad // block_k
    block_q = q_ref.shape[1]

    for hi in range(heads_per_step):
        lo = hi * d
        q = q_ref[0, :, lo:lo + d]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

        def body(j, carry):
            acc, m_prev, l_prev = carry
            k_blk = k_ref[0, pl.ds(j * block_k, block_k), lo:lo + d]
            v_blk = v_ref[0, pl.ds(j * block_k, block_k), lo:lo + d]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [block_q, block_k]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col < kv_len, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_new, m_new, l_new

        acc, m, l = jax.lax.fori_loop(
            0, num_kv, body,
            (jnp.zeros((block_q, d), jnp.float32),
             jnp.full((block_q, 1), NEG_INF, jnp.float32),
             jnp.zeros((block_q, 1), jnp.float32)))
        o_ref[0, :, lo:lo + d] = (acc / l).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0, :, lo:lo + d] = jnp.broadcast_to(
                m + jnp.log(l), (block_q, d)).astype(lse_ref.dtype)


def _resident_heads_per_step(h: int, d: int):
    """(heads_per_step, padded_head_count) for the resident kernel. Mosaic
    requires the lane-axis block size to be a multiple of 128 (or the whole
    array dim), so for d=64 heads are processed in pairs and an odd head
    count is zero-padded up to even — the padded head's outputs are sliced
    away; its K/V zeros never mix into real heads (per-head softmax)."""
    if d % 128 == 0:
        return 1, h
    if 128 % d == 0:
        per = 128 // d
        return per, -(-h // per) * per
    return h, h  # full fused head axis == whole array dim (always legal)


def _flash_fwd_resident(q, k, v, scale, interpret, with_lse):
    """Forward via the resident-KV kernel. Used when one head-step's K/V
    column slice fits comfortably in VMEM (always true for this model's
    shapes). Heads are processed `heads_per_step` at a time so the lane
    axis stays a full 128 (d=64)."""
    b, q_len, h, d = q.shape
    kv_len = k.shape[1]
    heads_per_step, h_pad = _resident_heads_per_step(h, d)
    hsteps = h_pad // heads_per_step
    block_q, block_k = _pick_blocks(q_len, kv_len, heads_per_step * d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def prep(x, target):
        if h_pad != h:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h_pad - h), (0, 0)))
        x = x.reshape(x.shape[0], x.shape[1], h_pad * d)
        if target != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
        return x

    qf, kf, vf = prep(q, q_pad), prep(k, kv_pad), prep(v, kv_pad)

    hpd = heads_per_step * d
    grid = (b, hsteps, q_pad // block_q)
    sk = _spec_kwargs()
    q_spec = pl.BlockSpec((1, block_q, hpd),
                          lambda bi, hi, i: (bi, i, hi), **sk)
    kv_spec = pl.BlockSpec((1, kv_pad, hpd),
                           lambda bi, hi, i: (bi, 0, hi), **sk)

    kernel = functools.partial(
        _fwd_kernel_resident, scale=scale, heads_per_step=heads_per_step,
        block_k=block_k, kv_len=kv_len, with_lse=with_lse)
    lse_rows = q_pad if with_lse else block_q
    lse_spec = pl.BlockSpec((1, block_q, hpd),
                            (lambda bi, hi, i: (bi, i, hi)) if with_lse
                            else (lambda bi, hi, i: (bi, 0, hi)), **sk)
    o, lse = pl.pallas_call(
        kernel, grid=grid, in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((b, q_pad, h_pad * d), q.dtype),
                   jax.ShapeDtypeStruct((b, lse_rows, h_pad * d), jnp.float32)),
        interpret=interpret,
    )(qf, kf, vf)
    o = o[:, :q_len].reshape(b, q_len, h_pad, d)[:, :, :h]
    if with_lse:
        return o, lse[:, :q_len].reshape(b, q_len, h_pad, d)[:, :, :h, :1]
    return o


# one head-pair's K/V column slice (double-buffered by pallas) + per-head
# temporaries must fit VMEM; 4 MB of K/V columns leaves ample headroom.
# Default 0 = resident kernel DISABLED. A/B on a real v5e chip (512^2 x 16f
# e2e): streamed 10.87 s vs resident 11.50 s — the streamed kernel's
# grid-pipelined K/V DMAs beat the resident kernel's fori_loop even though
# the latter re-streams nothing. Kept selectable for future shapes where
# K/V re-streaming dominates (very long kv with small q).
_RESIDENT_KV_MAX_BYTES = int(os.environ.get(
    "SA_TPU_RESIDENT_KV_MAX_BYTES", 0))


def _use_resident(q, k):
    d = q.shape[-1]
    heads_per_step, _ = _resident_heads_per_step(q.shape[2], d)
    kv_pad = _round_up(
        k.shape[1],
        _pick_blocks(q.shape[1], k.shape[1], heads_per_step * d)[1])
    return (kv_pad * heads_per_step * d * q.dtype.itemsize
            <= _RESIDENT_KV_MAX_BYTES)


def _spec_kwargs():
    return {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}


def _scratch_shapes(block_q, hd):
    if _HAS_PLTPU:
        return [pltpu.VMEM((block_q, hd), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32)]
    # interpret mode (CPU tests): plain array scratch
    return [pl.MemoryRef((block_q, hd), jnp.float32),
            pl.MemoryRef((block_q, 128), jnp.float32),
            pl.MemoryRef((block_q, 128), jnp.float32)]


def _flash_fwd_bshd(q, k, v, scale, interpret, with_lse):
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D]. Zero-copy: the head axis is
    fused into the feature axis (a contiguous reshape) and sliced inside
    the kernel; the lse output is only materialised on the training path."""
    b, q_len, h, d = q.shape
    kv_len = k.shape[1]
    block_q, block_k = _pick_blocks(q_len, kv_len, h * d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def prep(x, target):
        x = x.reshape(x.shape[0], x.shape[1], h * d)
        if target != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
        return x

    qf, kf, vf = prep(q, q_pad), prep(k, kv_pad), prep(v, kv_pad)

    grid = (b, q_pad // block_q, kv_pad // block_k)
    sk = _spec_kwargs()
    q_spec = pl.BlockSpec((1, block_q, h * d), lambda bi, i, j: (bi, i, 0), **sk)
    kv_spec = pl.BlockSpec((1, block_k, h * d), lambda bi, i, j: (bi, j, 0), **sk)

    kernel = functools.partial(_fwd_kernel, scale=scale, num_heads=h,
                               block_k=block_k, kv_len=kv_len,
                               with_lse=with_lse)
    # the lse slot always exists in the kernel signature; without lse it is
    # a 1-row dummy so no bandwidth is wasted
    lse_rows = q_pad if with_lse else block_q
    lse_spec = pl.BlockSpec((1, block_q, h * d),
                            (lambda bi, i, j: (bi, i, 0)) if with_lse
                            else (lambda bi, i, j: (bi, 0, 0)), **sk)
    o, lse = pl.pallas_call(
        kernel, grid=grid, in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((b, q_pad, h * d), q.dtype),
                   jax.ShapeDtypeStruct((b, lse_rows, h * d), jnp.float32)),
        scratch_shapes=_scratch_shapes(block_q, h * d),
        interpret=interpret,
    )(qf, kf, vf)
    o = o[:, :q_len].reshape(b, q_len, h, d)
    if with_lse:
        return o, lse[:, :q_len].reshape(b, q_len, h, d)[..., :1]
    return o


# ---------------------------------------------------------------------------
# Backward kernels (flash-attention-2 recompute style) — operate on the
# flattened [B*H, S, D] layout; the transposes only exist on the training
# path.
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, aux_ref, do_ref, dk_ref, dv_ref, *,
                    scale, block_q, q_len, q_pad):
    """One program per (batch*head, kv-block): accumulate dk, dv over all q.

    p_ij = exp(s_ij - lse_i); `aux` packs per-row scalars into one
    well-tiled [q, d] operand: delta_i = sum(do_i * o_i) in column 0 and
    lse_i in column d-1."""
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


def _flash_bwd(scale, interpret, res, g):
    q_bshd, k_bshd, v_bshd, o_bshd, lse_bshd = res
    b, q_len, h, d = q_bshd.shape
    kv_len = k_bshd.shape[1]

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], x.shape[-1])

    q, k, v, o, g2 = (to_bh(x) for x in (q_bshd, k_bshd, v_bshd, o_bshd, g))
    lse = to_bh(lse_bshd)  # [bh, Sq, 1]
    bh = b * h

    block_q, block_k = _pick_blocks(q_len, kv_len, d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    delta = jnp.sum(g2.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [bh, Sq, 1]
    # aux packs (delta | ... | lse) into one well-tiled [bh, Sq, d] tensor
    aux = jnp.zeros((bh, q_len, d), jnp.float32)
    aux = aux.at[:, :, 0:1].set(delta).at[:, :, d - 1:d].set(lse)

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, q_pad - q_len), (0, 0))) if q_pad != q_len else x

    def pad_kv(x):
        return jnp.pad(x, ((0, 0), (0, kv_pad - kv_len), (0, 0))) if kv_pad != kv_len else x

    qp, gp, auxp = pad_q(q), pad_q(g2), pad_q(aux)
    kp, vp = pad_kv(k), pad_kv(v)
    sk = _spec_kwargs()

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_q=block_q, q_len=q_len, q_pad=q_pad
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, kv_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, q_pad, d), lambda bi, j: (bi, 0, 0), **sk),
            pl.BlockSpec((1, block_k, d), lambda bi, j: (bi, j, 0), **sk),
            pl.BlockSpec((1, block_k, d), lambda bi, j: (bi, j, 0), **sk),
            pl.BlockSpec((1, q_pad, d), lambda bi, j: (bi, 0, 0), **sk),
            pl.BlockSpec((1, q_pad, d), lambda bi, j: (bi, 0, 0), **sk),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bi, j: (bi, j, 0), **sk),
            pl.BlockSpec((1, block_k, d), lambda bi, j: (bi, j, 0), **sk),
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
            pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0), **sk),
            pl.BlockSpec((1, kv_pad, d), lambda bi, i: (bi, 0, 0), **sk),
            pl.BlockSpec((1, kv_pad, d), lambda bi, i: (bi, 0, 0), **sk),
            pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0), **sk),
            pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0), **sk),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0), **sk),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, auxp, gp)

    def from_bh(x, s_len):
        return x[:, :s_len].reshape(b, h, s_len, d).transpose(0, 2, 1, 3)

    return from_bh(dq, q_len), from_bh(dk, kv_len), from_bh(dv, kv_len)


def _flash_fwd_dispatch(q, k, v, scale, interpret, with_lse):
    if _use_resident(q, k):
        return _flash_fwd_resident(q, k, v, scale, interpret, with_lse)
    return _flash_fwd_bshd(q, k, v, scale, interpret, with_lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_core(q, k, v, scale, interpret):
    return _flash_fwd_dispatch(q, k, v, scale, interpret, with_lse=False)


def _flash_attention_fwd(q, k, v, scale, interpret):
    o, lse = _flash_fwd_dispatch(q, k, v, scale, interpret, with_lse=True)
    return o, (q, k, v, o, lse)


_flash_attention_core.defvjp(_flash_attention_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: float | None = None, interpret: bool = False):
    """Flash attention over [B, S, H, D] inputs (jax.nn layout).

    Differentiable (custom VJP with Pallas backward kernels); the forward
    pass runs directly on the BSHD layout with zero transposes.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_attention_core(q, k, v, float(scale), interpret)
