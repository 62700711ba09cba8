#!/usr/bin/env python
"""Chipless HLO fusion audit of the UNet forward at model shapes.

Compiles the full-size UNet forward against libtpu's compile-only v5e
topology (no chip needed) and reports, per HLO opcode bucket, the total
bytes each fusion touches — a static stand-in for a device profile when
the chip is unreachable. Big standalone `copy`/`transpose`/`bitcast`
fusions are the smoking gun for layout problems; convolution/dot counts
sanity-check what actually reaches the MXU.

  python tools/hlo_audit.py [--height 512] [--frames 16] [--quant]

Caveats (this zero-egress dev box's libtpu, not the tool): the full UNet
forward takes >30 min to compile locally, and large-spatial block graphs
(512^2-level convs) can segfault libtpu's local compiler — the same
graphs compile fine through the remote service. Use small
--height/--width here for structural audits; confirm timings on-chip
with tools/bench_ablate.py.
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
    ap.add_argument("--dump", type=str, default="",
                    help="also write the full HLO text here")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--scope", choices=["unet", "block"], default="block",
                    help="'block' = one level-0 CrossAttnDownBlock at real "
                         "shapes (compiles in ~1 min locally); 'unet' = the "
                         "full forward (libtpu takes >30 min locally — use "
                         "only when that budget is acceptable)")
    args = ap.parse_args()

    import jax

    # eager jnp constants during tracing (PRNGKey inside eval_shape etc.)
    # land on the DEFAULT backend — which here is the remote axon tunnel;
    # a wedged tunnel then hangs the tool before it ever lowers
    # (NOTES_ROUND3.md). Keep the default platform CPU; the compile still
    # targets the TPU topology through the mesh below.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    # compile target must be the compile-only topology's devices — a bare
    # jit().lower() would target the ambient (axon) backend and hang on a
    # dead tunnel
    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    mesh = Mesh(topo.devices, ("x",))

    from stableanimator_tpu.core.config import UNetConfig

    cfg = UNetConfig()
    b, f = 2, args.frames
    h8, w8 = args.height // 8, args.width // 8

    def shape_params(init_fn):
        p = jax.eval_shape(init_fn)
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            p)

    if args.scope == "unet":
        from stableanimator_tpu.models.unet import UNetSpatioTemporal

        model = UNetSpatioTemporal(cfg, dtype=jnp.bfloat16, quant=args.quant)
        sample = jax.ShapeDtypeStruct((b, f, h8, w8, cfg.in_channels),
                                      jnp.bfloat16)
        ctx = jax.ShapeDtypeStruct((b, 1 + cfg.num_id_tokens,
                                    cfg.cross_attention_dim), jnp.bfloat16)
        ids = jax.ShapeDtypeStruct((b, 3), jnp.float32)
        pose = jax.ShapeDtypeStruct(
            (b * f, h8, w8, cfg.block_out_channels[0]), jnp.float32)
        params = shape_params(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros(sample.shape, sample.dtype),
            jnp.float32(1.0), jnp.zeros(ctx.shape, ctx.dtype),
            jnp.zeros(ids.shape, ids.dtype),
            jnp.zeros(pose.shape, pose.dtype)))

        def fwd(p, s, c, i, po):
            return model.apply(p, s, jnp.float32(1.0), c, i, po)

        args_ = (params, sample, ctx, ids, pose)
    else:
        # one level-0 CrossAttnDownBlock at the real hot shapes: all the
        # per-step layout structure (resnet convs, spatial flash attention,
        # temporal blocks, ID cross-attention) in a graph libtpu compiles
        # locally in about a minute
        from stableanimator_tpu.models.unet import CrossAttnDownBlock

        ch = cfg.block_out_channels[0]
        model = CrossAttnDownBlock(
            out_channels=ch, heads=cfg.num_attention_heads[0], num_frames=f,
            num_id_tokens=cfg.num_id_tokens, dtype=jnp.bfloat16,
            quant=args.quant)
        x = jax.ShapeDtypeStruct((b * f, h8, w8, ch), jnp.bfloat16)
        temb = jax.ShapeDtypeStruct((b * f, 1280), jnp.bfloat16)
        ctx = jax.ShapeDtypeStruct((b * f, 1 + cfg.num_id_tokens,
                                    cfg.cross_attention_dim), jnp.bfloat16)
        params = shape_params(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros(x.shape, x.dtype),
            jnp.zeros(temb.shape, temb.dtype), jnp.zeros(ctx.shape, ctx.dtype)))

        def fwd(p, xx, t, c):
            return model.apply(p, xx, t, c)

        args_ = (params, x, temb, ctx)

    print("lowering...", file=sys.stderr, flush=True)
    wrapped = shard_map(fwd, mesh=mesh,
                        in_specs=tuple(P() for _ in args_), out_specs=P(),
                        check_rep=False)
    lowered = jax.jit(wrapped).lower(*args_)
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

    # TPU HLO lines look like:
    #   %name = f32[2,16]{1,0:T(8,128)} fusion(%a, %b), kind=kLoop, ...
    # the opcode is the first lowercase identifier followed by '(' on the
    # right-hand side (tiling markers like T(8,128)/S(6) are uppercase)
    op_re = re.compile(r"([a-z][a-z0-9-]*)\(")
    buckets = collections.Counter()
    bytes_by_op = collections.Counter()
    fusion_kinds = collections.Counter()
    # only count instructions OUTSIDE %fused_computation bodies: ops inside
    # a fusion execute from registers/VMEM — the schedulable units (and the
    # copies that actually cross HBM) live in the entry/while computations
    in_fusion_body = False
    for line in txt.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") and "(" in stripped and "=" not in stripped:
            in_fusion_body = stripped.startswith(
                ("%fused_computation", "fused_computation", "%region",
                 "region"))
            continue
        if " = " not in line or in_fusion_body:
            continue
        mm = op_re.search(line.split(" = ", 1)[1])
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
