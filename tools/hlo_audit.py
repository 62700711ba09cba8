#!/usr/bin/env python
"""Chipless HLO fusion audit of the UNet forward at model shapes.

Compiles the full-size UNet forward against libtpu's compile-only v5e
topology (no chip needed) and reports, per HLO opcode bucket, the total
bytes each fusion touches — a static stand-in for a device profile when
the chip is unreachable. Big standalone `copy`/`transpose`/`bitcast`
fusions are the smoking gun for layout problems; convolution/dot counts
sanity-check what actually reaches the MXU.

  python tools/hlo_audit.py [--height 512] [--frames 16] [--quant]
  python tools/hlo_audit.py --temporal-kernel   # SA_TPU_TEMPORAL_ATTN=1

Caveat: full-GENERATE graphs segfault libtpu locally (NOTES_ROUND3.md);
the UNet forward alone compiles fine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

import argparse
import collections
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--temporal-kernel", action="store_true")
    ap.add_argument("--dump", type=str, default="",
                    help="also write the full HLO text here")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.temporal_kernel:
        os.environ["SA_TPU_TEMPORAL_ATTN"] = "1"

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    del topo  # initialises the plugin; compile target comes from devices

    from stableanimator_tpu.core.config import UNetConfig
    from stableanimator_tpu.models.unet import UNetSpatioTemporal

    cfg = UNetConfig()
    model = UNetSpatioTemporal(cfg, dtype=jnp.bfloat16, quant=args.quant)
    b, f = 2, args.frames
    h8, w8 = args.height // 8, args.width // 8
    sample = jax.ShapeDtypeStruct((b, f, h8, w8, cfg.in_channels), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((b, 1 + cfg.num_id_tokens,
                                cfg.cross_attention_dim), jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((b, 3), jnp.float32)
    pose = jax.ShapeDtypeStruct((b * f, h8, w8, cfg.block_out_channels[0]),
                                jnp.float32)
    params = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros(sample.shape, sample.dtype),
        jnp.float32(1.0), jnp.zeros(ctx.shape, ctx.dtype),
        jnp.zeros(ids.shape, ids.dtype), jnp.zeros(pose.shape, pose.dtype)))
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        params)

    def fwd(p, s, c, i, po):
        return model.apply(p, s, jnp.float32(1.0), c, i, po)

    print("lowering...", file=sys.stderr, flush=True)
    lowered = jax.jit(fwd).lower(params, sample, ctx, ids, pose)
    print("compiling (compile-only topology)...", file=sys.stderr, flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as fh:
            fh.write(txt)

    # ---- opcode x bytes audit --------------------------------------------
    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
                   "u8": 1, "pred": 1, "f16": 2, "s64": 8, "u64": 8}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")

    def line_bytes(line: str) -> int:
        total = 0
        for dt, dims in shape_re.findall(line):
            if dt not in dtype_bytes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes[dt]
        return total

    op_re = re.compile(r"=\s*(?:\w+\[[\d,]*\]\{?[\d,]*\}?\s+)?(\w+)\(")
    buckets = collections.Counter()
    bytes_by_op = collections.Counter()
    fusion_kinds = collections.Counter()
    for line in txt.splitlines():
        mm = op_re.search(line)
        if not mm:
            continue
        op = mm.group(1)
        buckets[op] += 1
        bytes_by_op[op] += line_bytes(line)
        if op == "fusion" and "kind=" in line:
            fusion_kinds[line.split("kind=")[1].split(",")[0]] += 1

    print(f"\n== opcode buckets (top {args.top} by bytes touched) ==")
    for op, nb in bytes_by_op.most_common(args.top):
        print(f"{op:24s} n={buckets[op]:5d}  {nb/1e6:10.1f} MB")
    if fusion_kinds:
        print("\n== fusion kinds ==")
        for k, n in fusion_kinds.most_common():
            print(f"{k:24s} {n}")
    # standalone copies/transposes at the top level are layout smells
    smell = sum(bytes_by_op[o] for o in ("copy", "transpose", "bitcast"))
    print(f"\nlayout-smell bytes (copy+transpose+bitcast): {smell/1e6:.1f} MB")


if __name__ == "__main__":
    main()
