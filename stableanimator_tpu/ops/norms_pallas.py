"""Fused Pallas TPU kernels for LayerNorm / GroupNorm (stats + affine apply
in one VMEM-resident pass).

Why these exist: the corrected generate profile (tools/profile_unet.py,
round 3) shows the norm stats/apply fusions are the LARGEST cost bucket of
the 512^2 x 16f pipeline — ~3.5 s of a 10.1 s run (~35%), running at ~10%
of HBM bandwidth. XLA splits every norm into a stats fusion (which also
re-lays-out the activation for the next consumer) plus a separate apply
fusion, so each norm costs 2 strided reads + 2 writes of the activation.
The kernels here do ONE read + ONE write in the standard layout.

Numerics are kept bit-close to ops/norms.py (the single source of truth and
the kernels' VJP recompute target): fp32 mean / mean-of-squares, var
clamped at 0, rsqrt(var+eps), then a per-channel fused multiply-add with
a/b cast to the input dtype BEFORE the apply — exactly the XLA
formulation's order of rounding.

GroupNorm group reductions avoid in-kernel reshapes (C -> [G, C/G] with
C/G = 10/20/40 is Mosaic-hostile: non-128 minor dims) by contracting the
per-channel sums with a [C, G] one-hot group-assignment matrix on the MXU,
and broadcasting group stats back per channel with its transpose.

Reference parity anchors: torch.nn.GroupNorm semantics used throughout
reference animation/modules/unet.py and vae.py; LayerNorm per
reference unet.py BasicTransformerBlock / TemporalBasicTransformerBlock.
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

# largest activation slab (bytes) one GroupNorm grid step may stage in
# VMEM. Mosaic double-buffers the in+out blocks and materialises fp32
# temporaries, so usable slab ~ VMEM/5: chipless AOT compiles (aot_check
# --what norms) pass at 2.6 MB (4096x320 bf16, the 512^2 level-0 slab) and
# RESOURCE_EXHAUST at 4.2 MB. Bigger slabs (576x1024 level 0, VAE decode)
# keep the XLA path until a two-phase (stats kernel + XLA apply) variant
# exists.
_GN_SLAB_LIMIT = 3 * 1024 * 1024


def _vmem(interpret, **kw):
    if _HAS_PLTPU and not interpret:
        kw["memory_space"] = pltpu.VMEM
    return kw


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...]                                     # [BR, C] input dtype
    xf = x.astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c     # [BR, 1] fp32
    mean_sq = jnp.sum(xf * xf, axis=-1, keepdims=True) / c
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * s_ref[...].astype(jnp.float32)           # [BR, C] fp32
    b = -mean * a + b_ref[...].astype(jnp.float32)
    o_ref[...] = x * a.astype(x.dtype) + b.astype(x.dtype)


def _ln_fwd_impl(x2d, scale, bias, eps, interpret):
    r, c = x2d.shape
    br = 512
    while br > 8 and r % br != 0:
        br //= 2
    if r % br != 0:  # odd row count: single block
        br = r
    grid = (r // br,)
    vm = functools.partial(_vmem, interpret)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), **vm()),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vm()),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vm()),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0), **vm()),
        out_shape=jax.ShapeDtypeStruct((r, c), x2d.dtype),
        interpret=interpret,
    )(x2d, scale.reshape(1, c), bias.reshape(1, c))
    return out


# ---------------------------------------------------------------------------
# GroupNorm
# ---------------------------------------------------------------------------

def _gn_kernel(x_ref, s_ref, b_ref, m_ref, mt_ref, o_ref, *, eps, denom):
    x = x_ref[0]                                       # [S, C] input dtype
    xf = x.astype(jnp.float32)
    sums = jnp.sum(xf, axis=0, keepdims=True)          # [1, C] fp32
    sumsq = jnp.sum(xf * xf, axis=0, keepdims=True)
    m = m_ref[...]                                     # [C, G] one-hot fp32
    mt = mt_ref[...]                                   # [G, C]
    sum_g = jnp.dot(sums, m, preferred_element_type=jnp.float32)    # [1, G]
    sumsq_g = jnp.dot(sumsq, m, preferred_element_type=jnp.float32)
    mean_g = sum_g / denom
    var_g = jnp.maximum(sumsq_g / denom - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back per channel on the MXU: [1,G] x [G,C]
    inv_c = jnp.dot(inv_g, mt, preferred_element_type=jnp.float32)  # [1, C]
    mean_c = jnp.dot(mean_g, mt, preferred_element_type=jnp.float32)
    a = inv_c * s_ref[...].astype(jnp.float32)         # [1, C] fp32
    b = b_ref[...].astype(jnp.float32) - mean_c * a
    o_ref[0] = x * a.astype(x.dtype) + b.astype(x.dtype)


def _gn_fwd_impl(x3d, scale, bias, num_groups, eps, interpret):
    n, s, c = x3d.shape
    cpg = c // num_groups
    # [C, G] group one-hot; tiny constant, folded by XLA
    m = (jnp.arange(c)[:, None] // cpg ==
         jnp.arange(num_groups)[None, :]).astype(jnp.float32)
    vm = functools.partial(_vmem, interpret)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, denom=float(s * cpg)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), **vm()),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vm()),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vm()),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), **vm()),
            pl.BlockSpec((num_groups, c), lambda i: (0, 0), **vm()),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), **vm()),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x3d.dtype),
        interpret=interpret,
    )(x3d, scale.reshape(1, c), bias.reshape(1, c), m, m.T)
    return out


# ---------------------------------------------------------------------------
# public entry points (custom VJP: backward recomputes through the XLA
# formulation in ops/norms.py — the single source of truth for the math)
# ---------------------------------------------------------------------------

def ln_supported(x) -> bool:
    """Rows collapse to 2D; any C the lane padder accepts (>= 1 tile row)."""
    if x.ndim < 2 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return c >= 128 and rows >= 8


def gn_supported(x, num_groups) -> bool:
    if x.ndim < 3 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    c = x.shape[-1]
    if c % num_groups != 0 or c < 128:
        return False
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    if s < 8:
        return False
    slab = s * c * x.dtype.itemsize
    return slab <= _GN_SLAB_LIMIT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x, scale, bias, eps: float = 1e-5,
                      interpret: bool = False):
    """Fused LayerNorm over the last axis. x: [..., C]; scale/bias: [C]."""
    shape = x.shape
    out = _ln_fwd_impl(x.reshape(-1, shape[-1]), scale, bias, eps, interpret)
    return out.reshape(shape)


def _ln_fwd(x, scale, bias, eps, interpret):
    return layer_norm_pallas(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    from stableanimator_tpu.ops.norms import _layer_norm_xla

    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _layer_norm_xla(x_, s_, b_, eps=eps),
                     x, scale, bias)
    return vjp(g)


layer_norm_pallas.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_pallas(x, scale, bias, num_groups: int = 32,
                      eps: float = 1e-5, interpret: bool = False):
    """Fused GroupNorm. x: [N, *spatial, C]; scale/bias: [C]."""
    shape = x.shape
    x3d = x.reshape(shape[0], -1, shape[-1])
    out = _gn_fwd_impl(x3d, scale, bias, num_groups, eps, interpret)
    return out.reshape(shape)


def _gn_fwd(x, scale, bias, num_groups, eps, interpret):
    return (group_norm_pallas(x, scale, bias, num_groups, eps, interpret),
            (x, scale, bias))


def _gn_bwd(num_groups, eps, interpret, res, g):
    from stableanimator_tpu.ops.norms import _group_norm_xla

    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_xla(x_, s_, b_, num_groups=num_groups,
                                           eps=eps), x, scale, bias)
    return vjp(g)


group_norm_pallas.defvjp(_gn_fwd, _gn_bwd)
