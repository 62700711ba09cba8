#!/usr/bin/env python
"""Conv-formulation sweep at the UNet's real shapes (VERDICT r2 item 4:
"conv layout experiments on the conv bucket").

Verdict (one v5e chip, --iters 32): XLA's direct emitter is already the
right choice — 53-90 TF/s at every UNet 3x3 shape; im2col/shift9/tapmajor/
padN are within noise or worse. (Earlier --iters 8 runs were dominated by
the ~40 ms per-dispatch tunnel floor and mis-read as 8-17% MFU.) The tool
stays for regression checks on new shapes. Formulations:

  direct   — lax.conv_general_dilated, NHWC x HWIO (the model's path)
  im2col   — explicit patch extraction + one [N*H*W, 9*Cin]x[9*Cin, Cout]
             matmul (what the MXU ultimately runs; makes the GEMM shape
             explicit at the cost of a 9x activation blow-up in HBM)
  shift9   — 9 shifted 1x1 convs (matmuls) accumulated in fp32: no 9x
             blow-up, but 9 passes over the output accumulator
  fp32acc  — direct conv with preferred_element_type=float32 (checks
             whether the bf16-accumulate default is what buys the speed)

Methodology identical to tools/bench_ablate.py: in-graph scan chains
(single dispatches are ~35-40 ms tunnel-dominated), per-run input
perturbation (server-side result memoization), slice-fetch sync.

Run:  python tools/bench_conv.py [--height 512] [--frames 16]
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

ITERS = 8  # overridden by --iters


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:8])


def timed_chain(chain_fn, n=3):
    sync(chain_fn(0))
    ts = []
    for i in range(n):
        t0 = time.time()
        sync(chain_fn(1 + i))
        ts.append(time.time() - t0)
    return min(ts) / ITERS


DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def conv_direct(x, w, acc_dtype=None):
    kw = {"preferred_element_type": acc_dtype} if acc_dtype else {}
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=DN, **kw)


def conv_im2col(x, w):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + wd, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)            # [N,H,W,9*Cin]
    out = patches.reshape(n * h * wd, 9 * cin) @ w.reshape(9 * cin, cout)
    return out.reshape(n, h, wd, cout).astype(x.dtype)


def conv_shift9(x, w):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy:dy + h, dx:dx + wd, :]
            acc = acc + (tap.reshape(-1, cin) @ w[dy, dx]).reshape(
                n, h, wd, cout).astype(jnp.float32)
    return acc.astype(x.dtype)


def conv_tapmajor(x, w):
    """One [M, Cin] x [Cin, 9*Cout] matmul (MXU-friendly big N), then the
    9 taps are combined by shifted slice-adds over the matmul output —
    XLA fuses the 9 adds into a single output-stationary elementwise pass.
    Dual of shift9: the blow-up lives on the OUTPUT side where it is
    consumed once, instead of 9 strided input reads per output tile."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    y = (x.reshape(-1, cin) @ w2).reshape(n, h, wd, 9, cout)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((n, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            k = dy * 3 + dx
            acc = acc + yp[:, dy:dy + h, dx:dx + wd, k, :].astype(jnp.float32)
    return acc.astype(x.dtype)


def conv_padN(x, w):
    """Direct conv with Cout zero-padded up to a lane multiple (128): does
    XLA's conv emitter recover the padding loss itself or not?"""
    cout = w.shape[-1]
    pad = (-cout) % 128
    if pad == 0:
        return conv_direct(x, w)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return conv_direct(x, wp)[..., :cout]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=32,
                    help="scan-chain length; long chains amortise the "
                         "~40 ms per-dispatch tunnel floor that polluted "
                         "the ITERS=8 runs")
    args = ap.parse_args()
    global ITERS
    ITERS = args.iters

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    h8 = args.height // 8
    b, f = 2, args.frames
    sync(jnp.zeros((8,)) + 1.0)  # per-process session init

    # (spatial, Cin, Cout): every distinct 3x3 conv shape of the 512^2 step
    shapes = [
        (h8, 320, 320),        # level-0 resnets
        (h8 // 2, 640, 640),   # level-1
        (h8 // 4, 1280, 1280), # level-2/3 + mid
        (h8, 640, 320),        # up-path skip-concat convs
        (h8 // 2, 1280, 640),
    ]
    variants = [
        ("direct", lambda x, w: conv_direct(x, w)),
        ("im2col", conv_im2col),
        ("shift9", conv_shift9),
        ("fp32acc", lambda x, w: conv_direct(x, w, jnp.float32)),
        ("tapmajor", conv_tapmajor),
        ("padN", conv_padN),
    ]

    for hw, cin, cout in shapes:
        n = b * f
        x0 = jnp.full((n, hw, hw, cin), 0.1, jnp.bfloat16)
        w0 = jnp.full((3, 3, cin, cout), 0.01, jnp.bfloat16)
        flops = 2 * n * hw * hw * 9 * cin * cout
        line = [f"conv {hw}x{hw} {cin}->{cout}:"]
        for name, impl in variants:
            def chain(i, impl=impl):
                @jax.jit
                def run(x, w, di):
                    def body(c, _):
                        o = impl(c, w)
                        # keep the carry shape across Cout != Cin: slice
                        # down or tile up (both up-path shapes are 2:1)
                        ci = c.shape[-1]
                        if o.shape[-1] > ci:
                            o = o[..., :ci]
                        elif o.shape[-1] < ci:
                            o = jnp.concatenate([o] * (ci // o.shape[-1]),
                                                axis=-1)
                        return (o + di).astype(c.dtype), ()

                    return jax.lax.scan(body, x, None, length=ITERS)[0]

                return run(x0, w0, jnp.bfloat16(i * 1e-3))

            try:
                t = timed_chain(chain)
                line.append(f"{name}={t*1e3:7.2f}ms({flops/t/1e12:5.1f}TF/s)")
            except Exception as e:
                line.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
