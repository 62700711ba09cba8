#!/usr/bin/env python
"""Flash-attention kernel micro-bench on the real chip.

RTT to the remote chip (~1 s) swamps a ~15 ms kernel, so each variant runs
as a jitted scan of `iters` chained kernel calls (output feeds the next
query) and reports per-call time. Sweeps (block_q, block_k) via the
private test hook in ops.flash_attention.

  python tools/bench_flash.py --shape 32,4096,5,64 --iters 50
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32,4096,5,64")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--blocks", default="512:1024,256:1024,1024:1024,512:512,512:2048")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import stableanimator_tpu.ops.flash_attention as fa

    b, s, h, d = (int(x) for x in args.shape.split(","))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)

    flops = 2 * 2 * b * h * s * s * d  # QK^T + PV
    results = {}
    orig = fa._pick_blocks
    for pair in args.blocks.split(","):
        bq, bk = (int(x) for x in pair.split(":"))
        fa._pick_blocks = lambda ql, kl, hd=64, _bq=bq, _bk=bk: (
            min(_bq, fa._round_up(ql, 128)), min(_bk, fa._round_up(kl, 128)))

        def chain(q0):
            def body(carry, _):
                o = fa.flash_attention(carry, k, v)
                return o.astype(carry.dtype), ()

            out, _ = jax.lax.scan(body, q0, (), length=args.iters)
            return out

        fn = jax.jit(chain)
        np.asarray(fn(q))  # compile + warmup (transfer-sync)
        t0 = time.time()
        np.asarray(fn(q))
        dt = (time.time() - t0) / args.iters
        results[pair] = {"ms_per_call": round(dt * 1e3, 3),
                         "tflops": round(flops / dt / 1e12, 1)}
        print(pair, results[pair], flush=True)
    fa._pick_blocks = orig
    print(json.dumps({"shape": args.shape, "results": results}))


if __name__ == "__main__":
    main()
