#!/usr/bin/env python
"""v5e-8 scaling estimate for the pro-config generate (576x1024 x 16f).

Real multi-chip hardware is not reachable from this environment (one v5e
chip via the tunnel), so the scaling story is built from two measured
ingredients plus one documented assumption:

  1. measured single-chip compute: tools/bench_e2e.py --height 576
     --width 1024 => generate+decode seconds (pass via --single_chip_s),
  2. the ACTUAL collective traffic of the mesh-sharded program: this tool
     compiles the real 576x1024 generate on a virtual (data=2, frame=4)
     8-device CPU mesh (same lowering the slow-tier test validates) and
     sums the bytes moved by every all-reduce / all-gather /
     collective-permute / all-to-all, multiplying ops inside the denoise
     while-body by the step count,
  3. assumed ICI effective bandwidth per chip (default 90 GB/s — v5e has
     4 ICI links at ~186 GB/s/direction aggregate; 90 GB/s is a
     conservative achieved figure for mixed all-reduce/permute traffic on
     a 2x4 torus slice).

  estimate = single_chip_s / 8 + collective_bytes_per_chip / ici_bw

This is an ESTIMATE, clearly labelled as such in the output. It ignores
exposed-latency effects and compute/communication overlap (which cut in
opposite directions).

Run (CPU, no chip needed; ~1-2 min with a warm compile cache):
  python tools/estimate_multichip.py --single_chip_s 33.4
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import argparse
import functools
import json
import re

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "all-to-all", "reduce-scatter")


def _shape_bytes(sh: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", sh)
    if not m:
        return 0
    n = _DTYPE_BYTES.get(m.group(1), 0)
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n


def collective_bytes(hlo_text: str, steps_in_loop: int):
    """Sum output bytes per collective kind; while-body ops count once per
    denoise step. Reuses the profiler's computation/body parser."""
    from tools.profile_unet import build_fusion_classifier

    _, in_loop = build_fusion_classifier(hlo_text)
    per_kind = {k: 0 for k in _COLLECTIVES}
    counts = {k: 0 for k in _COLLECTIVES}
    for ln in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%(\S+) = (\(?[^ ]+) ([\w-]+)\(", ln)
        if not m:
            continue
        kind = m.group(3)
        if kind not in _COLLECTIVES:
            continue
        shapes = re.findall(r"\w+\[[\d,]*\]", m.group(2))
        nbytes = sum(_shape_bytes(s) for s in shapes)
        mult = steps_in_loop if in_loop(m.group(1)) else 1
        per_kind[kind] += nbytes * mult
        counts[kind] += mult
    return per_kind, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--single_chip_s", type=float, default=33.4,
                    help="measured single-chip generate+decode seconds "
                         "(tools/bench_e2e.py pro config, r3: 33.38)")
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="assumed effective ICI GB/s per chip")
    ap.add_argument("--workload", default="pro", choices=["pro", "longvid"],
                    help="pro: 576x1024 x 16f generate. longvid: the "
                         "450-frame demo's denoise-segment program at 512^2 "
                         "(the unit production dispatches 25x; single-chip "
                         "measured 410-413 s generate+decode, "
                         "E2E_LONGVID_r03_450f.json)")
    args = ap.parse_args()
    if args.workload == "longvid":
        args.height, args.width, args.frames = 512, 512, 450
        if args.single_chip_s == 33.4:  # the pro default was not overridden
            # SA_PHASE_TIMING device phases of the measured 450f run
            # (E2E_LONGVID_r03_450f.json): prep 3.3 + denoise 374.8 +
            # decode 11.4 (excludes the ~20 s tunnel fetch, which a real
            # pod host would not pay)
            args.single_chip_s = 389.5

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.parallel.mesh import make_mesh
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.pipeline.animation import _generate_impl, init_params

    models = build_models(dtype=jnp.bfloat16)
    h, w, f = args.height, args.width, args.frames
    # 2 steps in the traced scan is enough: the while body is identical per
    # trip; executed-collective accounting scales body ops by --steps
    cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=16,
                         tile_overlap=4, num_inference_steps=2,
                         decode_chunk_size=4)
    mesh = make_mesh(data=2, frame=4)
    rep = NamedSharding(mesh, P())
    shapes = jax.eval_shape(lambda: init_params(
        models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype,
            sharding=rep),
        shapes)
    if args.workload == "longvid":
        # the production dispatch unit at 450f: one grouped-denoise step
        # (38 groups x 1 tile under a mesh; see pipeline.denoise); its
        # scan-body collectives scale by --steps
        from stableanimator_tpu.ops.gate import ACTIVE_MESH
        from stableanimator_tpu.pipeline.animation import _denoise_segment

        cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=16,
                             tile_overlap=4, num_inference_steps=args.steps,
                             decode_chunk_size=4)
        h8, w8 = h // 8, w // 8
        fn = jax.jit(functools.partial(_denoise_segment, models, cfg=cfg,
                                       num_steps=1, mesh=mesh))
        print("[est] compiling sharded 450f denoise segment on the virtual "
              "8-device mesh ...", file=sys.stderr, flush=True)
        tok = ACTIVE_MESH.set(mesh)
        try:
            compiled = fn.lower(
                params,
                jax.ShapeDtypeStruct((1, f, h8, w8, 4), jnp.float32,
                                     sharding=rep),
                jax.ShapeDtypeStruct((2, 5, 1024), jnp.float32, sharding=rep),
                jax.ShapeDtypeStruct((2, h8, w8, 4), jnp.float32,
                                     sharding=rep),
                jax.ShapeDtypeStruct((2, 3), jnp.float32, sharding=rep),
                jax.ShapeDtypeStruct((f, h8, w8, 320), jnp.float32,
                                     sharding=rep),
                step_start=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
            ).compile()
        finally:
            ACTIVE_MESH.reset(tok)
        # the segment program IS one step; its inner while loop is the
        # GROUP scan (19 trips at 450f), so while-body ops scale by the
        # group count, and the whole segment then runs once per step
        from stableanimator_tpu.diffusion.tiling import (
            auto_tile_batch,
            tile_indices,
        )

        n_tiles = tile_indices(f, cfg.tile_size, cfg.tile_overlap).shape[0]
        # under a mesh the pipeline forces groups of ONE tile (the CFG axis
        # must match the data mesh axis — see pipeline.denoise)
        n_groups = n_tiles
        per_kind, counts = collective_bytes(compiled.as_text(), n_groups)
        per_kind = {k: v * args.steps for k, v in per_kind.items()}
        counts = {k: v * args.steps for k, v in counts.items()}
    else:
        fn = jax.jit(functools.partial(_generate_impl, models, face_opt=None,
                                       mesh=mesh, clip_image=None),
                     static_argnums=(4,))
        print("[est] compiling sharded pro-config generate on the virtual "
              "8-device mesh ...", file=sys.stderr, flush=True)
        compiled = fn.lower(
            params,
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((1, 512), jnp.float32, sharding=rep),
            cfg,
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        ).compile()
        per_kind, counts = collective_bytes(compiled.as_text(), args.steps)

    total_bytes = sum(per_kind.values())
    # bytes above are program-wide tensor sizes; per-chip wire traffic for
    # ring all-reduce is ~2x(n-1)/n of the tensor, all-gather (n-1)/n,
    # permute 1x its shard — approximate all kinds at 1x per chip, which
    # overcounts permutes (they already move shards) and undercounts
    # all-reduce's 2x; documented wash.
    comm_s = total_bytes / (args.ici_gbps * 1e9)
    compute_s = args.single_chip_s / 8.0
    est = compute_s + comm_s
    out = {
        "metric": ("ESTIMATED_v5e8_450f_demo_generate_seconds"
                   if args.workload == "longvid"
                   else "ESTIMATED_v5e8_pro_generate_seconds"),
        "value": round(est, 2),
        "unit": "seconds (estimate, not a measurement)",
        "detail": {
            "basis": "measured 1-chip generate+decode / 8 + lowered "
                     "collective bytes / assumed ICI bandwidth",
            "single_chip_generate_s_measured": args.single_chip_s,
            "ideal_compute_s": round(compute_s, 2),
            "collective_bytes_total": total_bytes,
            "collective_s_at_%dGBps" % int(args.ici_gbps): round(comm_s, 2),
            "bytes_per_kind": {k: v for k, v in per_kind.items() if v},
            "executed_ops_per_kind": {k: v for k, v in counts.items() if v},
            "mesh": "data=2 x frame=4",
            "denoise_steps": args.steps,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
