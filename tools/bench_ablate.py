#!/usr/bin/env python
"""Component-level timing ablation on the real chip.

Times (with true host-fetch sync — block_until_ready does not wait on the
remote platform): UNet forward variants, the VAE decode, PoseNet, and the
attention kernels in isolation. Guides the performance pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, n=3, **kw):
    fn(*args, **kw)  # compile + warmup
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn(*args, **kw)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--what", type=str, default="unet,attn,vae",
                    help="comma list: unet, attn, vae, pose")
    args = ap.parse_args()
    what = set(args.what.split(","))

    from stableanimator_tpu.core.config import UNetConfig, VAEConfig
    from stableanimator_tpu.models.unet import UNetSpatioTemporal
    from stableanimator_tpu.models.vae import AutoencoderKLTemporalDecoder

    h8 = args.height // 8
    b, f = 2, args.frames

    if "attn" in what:
        from stableanimator_tpu.ops.attention import xla_attention
        from stableanimator_tpu.ops.flash_attention import flash_attention

        for s, heads in ((h8 * h8, 5), ((h8 // 2) ** 2, 10)):
            q = jnp.ones((b * f, s, heads, 64), jnp.bfloat16)

            @jax.jit
            def run_flash(q):
                return flash_attention(q, q, q)

            @jax.jit
            def run_xla_chunked(q):
                # chunk the batch so the fp32 logits fit (the full UNet
                # avoids this path via flash)
                outs = [xla_attention(q[i:i + 4], q[i:i + 4], q[i:i + 4])
                        for i in range(0, q.shape[0], 4)]
                return jnp.concatenate(outs)

            tf_ = timeit(lambda q: sync(run_flash(q)), q)
            tx = timeit(lambda q: sync(run_xla_chunked(q)), q)
            print(f"attn seq={s} heads={heads} bh={b*f*heads}: "
                  f"flash={tf_*1e3:.1f}ms xla={tx*1e3:.1f}ms", flush=True)

    if "unet" in what:
        cfg = UNetConfig()
        sample = jnp.zeros((b, f, h8, h8, cfg.in_channels), jnp.bfloat16)
        ctx = jnp.zeros((b, 5, 1024), jnp.bfloat16)
        ids = jnp.ones((b, 3), jnp.float32)
        pose = jnp.zeros((b * f, h8, h8, 320), jnp.bfloat16)

        for flash in (True, False):
            model = UNetSpatioTemporal(cfg, use_flash=flash, dtype=jnp.bfloat16)
            params = jax.jit(lambda k: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16),
                model.init(k, sample, jnp.float32(0), ctx, ids, pose)))(
                jax.random.PRNGKey(0))

            @jax.jit
            def fwd(p, s):
                return model.apply(p, s, jnp.float32(0.5), ctx, ids, pose)

            t = timeit(lambda s: sync(fwd(params, s)), sample)
            print(f"unet fwd (b={b} f={f} latent={h8}) flash={flash}: {t:.3f}s", flush=True)

    if "vae" in what:
        vcfg = VAEConfig()
        vae = AutoencoderKLTemporalDecoder(vcfg, dtype=jnp.bfloat16)
        z = jnp.zeros((f, h8, h8, 4), jnp.bfloat16)
        vp = jax.jit(lambda k: vae.init(k, jnp.zeros((1, args.height, args.height, 3)),
                                        num_frames=1))(jax.random.PRNGKey(0))

        @jax.jit
        def dec(p, z):
            return vae.apply(p, z, num_frames=4, method=vae.decode)

        t = timeit(lambda z: sync(dec(vp, z)), z)
        print(f"vae decode ({f} frames @ {args.height}): {t:.3f}s", flush=True)

        x = jnp.zeros((1, args.height, args.height, 3), jnp.float32)

        @jax.jit
        def enc(p, x):
            return vae.apply(p, x, method=vae.encode).mean

        t = timeit(lambda x: sync(enc(vp, x)), x)
        print(f"vae encode (1 frame @ {args.height}): {t:.3f}s")


if __name__ == "__main__":
    main()
