#!/usr/bin/env python
"""Component-level timing ablation on the real chip.

Methodology (the axon tunnel cost model, NOTES_ROUND3.md):
  * every component is timed as an in-graph `lax.scan` chain of ITERS
    invocations — one dispatch costs ~35-40 ms through the tunnel, so
    single-call timings are dispatch-dominated lies;
  * the chain carry is perturbed by a per-run scalar so the remote
    platform's result memoization can never return a cached answer;
  * sync is a host fetch of a small slice (block_until_ready returns at
    dispatch on this platform).

Components: unet (full fwd, flash on/off), attn (flash vs XLA at model
shapes), temporal (one TemporalBasicTransformerBlock), resnet (one
SpatioTemporalResBlock), vae (decode/encode).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 8


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:8])  # pure transfer: true sync, no compile


def timed_chain(chain_fn, n=3):
    """chain_fn(i) -> output; i perturbs the input. Returns s/iteration."""
    sync(chain_fn(0))  # compile + warmup
    ts = []
    for i in range(n):
        t0 = time.time()
        sync(chain_fn(1 + i))
        ts.append(time.time() - t0)
    return min(ts) / ITERS


def fill_like_shapes(shapes, seed=0):
    @jax.jit
    def fill(key):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(treedef, [
            jax.random.uniform(k, s.shape, jnp.float32, -0.05, 0.05).astype(s.dtype)
            for k, s in zip(keys, leaves)])

    return fill(jax.random.PRNGKey(seed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--what", type=str, default="unet,attn,temporal,resnet,vae")
    args = ap.parse_args()
    what = set(args.what.split(","))

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from stableanimator_tpu.core.config import UNetConfig, VAEConfig
    from stableanimator_tpu.models.unet import UNetSpatioTemporal
    from stableanimator_tpu.models.vae import AutoencoderKLTemporalDecoder

    h8 = args.height // 8
    b, f = 2, args.frames
    sync(jnp.zeros((8,)) + 1.0)  # pay the per-process session init here

    if "attn" in what:
        from stableanimator_tpu.ops.attention import xla_attention
        from stableanimator_tpu.ops.flash_attention import flash_attention

        for s, heads in ((h8 * h8, 5), ((h8 // 2) ** 2, 10)):
            q0 = jnp.full((b * f, s, heads, 64), 0.1, jnp.bfloat16)

            def chain(i, attn):
                @jax.jit
                def run(q, di):
                    def body(c, _):
                        o = attn(c, c, c)
                        return (o + di).astype(c.dtype), ()

                    return jax.lax.scan(body, q, None, length=ITERS)[0]

                return run(q0, jnp.bfloat16(i * 1e-3))

            tf_ = timed_chain(lambda i: chain(i, flash_attention))
            tx = timed_chain(lambda i: chain(i, xla_attention))
            flops = 2 * 2 * (b * f) * heads * s * s * 64
            print(f"attn seq={s} heads={heads}: flash={tf_*1e3:7.2f}ms "
                  f"({flops/tf_/1e12:5.1f} TF/s)  xla={tx*1e3:7.2f}ms "
                  f"({flops/tx/1e12:5.1f} TF/s)", flush=True)

    if "temporal" in what or "resnet" in what:
        from stableanimator_tpu.models.transformer import (
            TemporalBasicTransformerBlock)
        from stableanimator_tpu.models.layers import SpatioTemporalResBlock

        for ch, heads, hw in ((320, 5, h8), (640, 10, h8 // 2)):
            n, s = b * f, hw * hw
            if "temporal" in what:
                blk = TemporalBasicTransformerBlock(heads, 64, num_frames=f,
                                                    dtype=jnp.bfloat16)
                x0 = jnp.full((n, s, ch), 0.1, jnp.bfloat16)
                tc = jnp.full((n, 1, 1024), 0.1, jnp.bfloat16)
                p = fill_like_shapes(jax.eval_shape(
                    lambda k: blk.init(k, x0, tc), jax.random.PRNGKey(0)))

                def chain(i):
                    @jax.jit
                    def run(x, di):
                        def body(c, _):
                            return (blk.apply(p, c, tc) * jnp.bfloat16(0.9)
                                    + di), ()

                        return jax.lax.scan(body, x, None, length=ITERS)[0]

                    return run(x0, jnp.bfloat16(i * 1e-3))

                t = timed_chain(chain)
                print(f"temporal block ch={ch} s={s}: {t*1e3:7.2f}ms", flush=True)

            if "resnet" in what:
                rb = SpatioTemporalResBlock(ch, f, dtype=jnp.bfloat16)
                xr = jnp.full((n, hw, hw, ch), 0.1, jnp.bfloat16)
                temb = jnp.full((n, 1280), 0.1, jnp.bfloat16)
                pr = fill_like_shapes(jax.eval_shape(
                    lambda k: rb.init(k, xr, temb), jax.random.PRNGKey(0)))

                def chain_r(i):
                    @jax.jit
                    def run(x, di):
                        def body(c, _):
                            return (rb.apply(pr, c, temb) * jnp.bfloat16(0.5)
                                    + di), ()

                        return jax.lax.scan(body, x, None, length=ITERS)[0]

                    return run(xr, jnp.bfloat16(i * 1e-3))

                t = timed_chain(chain_r)
                conv_flops = 2 * n * hw * hw * 9 * ch * ch * 2  # 2 spatial convs
                print(f"resnet block ch={ch} hw={hw}: {t*1e3:7.2f}ms "
                      f"(spatial-conv roofline {conv_flops/197e12*1e3:.2f}ms)",
                      flush=True)

    if "unet" in what:
        cfg = UNetConfig()
        sample0 = jnp.full((b, f, h8, h8, cfg.in_channels), 0.1, jnp.bfloat16)
        ctx = jnp.full((b, 5, 1024), 0.1, jnp.bfloat16)
        ids = jnp.ones((b, 3), jnp.float32)
        pose = jnp.full((b * f, h8, h8, 320), 0.1, jnp.bfloat16)

        for flash in (True, False):
            model = UNetSpatioTemporal(cfg, use_flash=flash, dtype=jnp.bfloat16)
            params = fill_like_shapes(jax.eval_shape(
                lambda k: model.init(k, sample0, jnp.float32(0), ctx, ids, pose),
                jax.random.PRNGKey(0)))

            def chain_u(i):
                @jax.jit
                def run(s0, di):
                    def body(c, _):
                        out = model.apply(params, c, jnp.float32(0.5), ctx,
                                          ids, pose)
                        nxt = jnp.concatenate(
                            [out * jnp.bfloat16(0.9) + di, c[..., 4:]], -1)
                        return nxt.astype(c.dtype), ()

                    return jax.lax.scan(body, s0, None, length=ITERS)[0]

                return run(sample0, jnp.bfloat16(i * 1e-3))

            t = timed_chain(chain_u)
            print(f"unet fwd (b={b} f={f} latent={h8}) flash={flash}: "
                  f"{t*1e3:7.1f}ms/call", flush=True)

    if "vae" in what:
        vcfg = VAEConfig()
        vae = AutoencoderKLTemporalDecoder(vcfg, dtype=jnp.bfloat16)
        z0 = jnp.full((4, h8, h8, 4), 0.1, jnp.bfloat16)
        vp = fill_like_shapes(jax.eval_shape(
            lambda k: vae.init(k, jnp.zeros((1, args.height, args.height, 3)),
                               num_frames=1), jax.random.PRNGKey(0)))

        def chain_v(i):
            @jax.jit
            def run(z, di):
                def body(c, _):
                    frames = vae.apply(vp, c, num_frames=4, method=vae.decode)
                    m = jnp.mean(frames, dtype=jnp.float32).astype(c.dtype)
                    return c * jnp.bfloat16(0.999) + m * jnp.bfloat16(1e-3) + di, ()

                return jax.lax.scan(body, z, None, length=ITERS)[0]

            return run(z0, jnp.bfloat16(i * 1e-4))

        t = timed_chain(chain_v)
        print(f"vae decode (4-frame chunk @ {args.height}): {t*1e3:7.1f}ms "
              f"(x4 chunks = {4*t:.2f}s per 16f video)", flush=True)


if __name__ == "__main__":
    main()
