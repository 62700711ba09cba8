#!/usr/bin/env python
"""Flash-attention kernel micro-bench on the real chip.

Compares attention implementations at the UNet's real shapes and sweeps
(block_q, block_k) for the first-party kernel:

  ours     — ops/flash_attention.py ([B, S, H, D] layout, fused heads)
  jaxlib   — jax.experimental.pallas.ops.tpu.flash_attention ([B, H, S, D])
  xla      — plain einsum attention, fp32 softmax (feasible at small S)

Methodology (the round-2 version of this tool got BOTH of these wrong,
which is how a mis-tuned block pair survived: identical inputs let the
remote platform return memoized results, and syncing via np.asarray of
the full output dragged ~84 MB through the ~7-65 MB/s tunnel):
  * every timed run perturbs the input (defeats result memoization),
  * sync fetches an 8-element slice, never the full output,
  * per-call time = min over runs of (chain wall / iters).

  python tools/bench_flash.py --shape 32,4096,5,64 --iters 32
  python tools/bench_flash.py --impls ours,jaxlib --blocks 512:1024
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


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:8])


def timed_chain(fn, q, k, v, iters, runs=3):
    # k/v are ARGUMENTS, not closures: a closed-over [64,4096,5,64] bf16
    # pair becomes 320 MB of inline constants and the remote compile
    # service rejects the request (HTTP 413, observed r5)
    sync(fn(q, k, v, jnp.bfloat16(0.0)))  # compile + warmup
    ts = []
    for i in range(runs):
        t0 = time.time()
        sync(fn(q, k, v, jnp.bfloat16(1e-3 * (i + 1))))  # perturbed: no memo hit
        ts.append(time.time() - t0)
    return min(ts) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32,4096,5,64")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--impls", default="ours,jaxlib")
    ap.add_argument("--blocks",
                    default="512:1024,256:1024,1024:1024,512:512,256:256")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import stableanimator_tpu.ops.flash_attention as fa

    b, s, h, d = (int(x) for x in args.shape.split(","))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    sync(jnp.zeros((8,)) + 1.0)  # absorb per-process session init

    flops = 2 * 2 * b * h * s * s * d  # QK^T + PV
    results = {}
    impls = args.impls.split(",")

    def report(name, dt):
        results[name] = {"ms_per_call": round(dt * 1e3, 3),
                         "tflops": round(flops / dt / 1e12, 1)}
        print(name, results[name], flush=True)

    if "ours" in impls:
        orig = fa._pick_blocks
        for pair in args.blocks.split(","):
            bq, bk = (int(x) for x in pair.split(":"))
            fa._pick_blocks = lambda ql, kl, hd=64, _bq=bq, _bk=bk: (
                min(_bq, fa._round_up(ql, 128)),
                min(_bk, fa._round_up(kl, 128)))

            @jax.jit
            def chain(q0, kk, vv, di):
                def body(carry, _):
                    o = fa.flash_attention(carry + di, kk, vv)
                    return o.astype(carry.dtype), ()

                return jax.lax.scan(body, q0, (), length=args.iters)[0]

            try:
                report(f"ours {pair}", timed_chain(chain, q, k, v, args.iters))
            except Exception as e:
                print(f"ours {pair} FAIL {type(e).__name__}", flush=True)
        fa._pick_blocks = orig

    if "jaxlib" in impls:
        from jax.experimental.pallas.ops.tpu import flash_attention as fl

        # jax's kernel wants [B, H, S, D]
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        scale = 1.0 / (d ** 0.5)

        @jax.jit
        def chain_lib(q0, kk, vv, di):
            def body(carry, _):
                qt = jnp.transpose(carry + di, (0, 2, 1, 3))
                o = fl.flash_attention(qt, kk, vv, sm_scale=scale)
                return jnp.transpose(o, (0, 2, 1, 3)).astype(carry.dtype), ()

            return jax.lax.scan(body, q0, (), length=args.iters)[0]

        try:
            report("jaxlib(+transposes)",
                   timed_chain(chain_lib, q, kt, vt, args.iters))
        except Exception as e:
            print(f"jaxlib FAIL {type(e).__name__}: {e}", flush=True)

        # and without the layout conversions (kernel-only cost)
        @jax.jit
        def chain_lib_raw(q0, kk, vv, di):
            qt = jnp.transpose(q0, (0, 2, 1, 3))

            def body(carry, _):
                o = fl.flash_attention(carry + di, kk, vv, sm_scale=scale)
                return o.astype(carry.dtype), ()

            return jax.lax.scan(body, qt, (), length=args.iters)[0]

        try:
            report("jaxlib(raw)",
                   timed_chain(chain_lib_raw, q, kt, vt, args.iters))
        except Exception as e:
            print(f"jaxlib raw FAIL {type(e).__name__}: {e}", flush=True)

    if "xla" in impls and s <= 1024:
        from stableanimator_tpu.ops.attention import xla_attention

        @jax.jit
        def chain_xla(q0, kk, vv, di):
            def body(carry, _):
                o = xla_attention(carry + di, kk, vv)
                return o.astype(carry.dtype), ()

            return jax.lax.scan(body, q0, (), length=args.iters)[0]

        report("xla", timed_chain(chain_xla, q, k, v, args.iters))

    print(json.dumps({"shape": args.shape, "results": results}))


if __name__ == "__main__":
    main()
