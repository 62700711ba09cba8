#!/usr/bin/env python
"""Device-time profile of the flagship UNet forward (or full generate).

Runs under jax.profiler.trace and parses the captured .xplane.pb directly
(tensorboard_plugin_profile protobuf), aggregating device time by op
category so the perf work targets the real bottlenecks.

Usage:
  python tools/profile_unet.py                 # UNet forward, 512^2 x 16f
  python tools/profile_unet.py --what generate # full e2e pipeline
  python tools/profile_unet.py --top 40
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(out):
    # fetch the first leaf to host: a pure transfer is the only true sync on
    # the remote platform that does NOT trigger a (slow) remote compile the
    # way an eager reduce would
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def run_traced(fn, logdir):
    _sync(fn())  # compile + warmup
    t0 = time.time()
    _sync(fn())
    wall = time.time() - t0
    with jax.profiler.trace(logdir):
        _sync(fn())
    return wall


def build_fusion_classifier(hlo_text):
    """Map each fusion instruction to the op kinds its fused computation
    CONTAINS (recursing through nested kLoop fusions). Classifying by the
    instruction NAME alone mislabels TPU fusions: XLA's output fusions put
    the convolution + bias + residual adds + the next norm's stats reduces
    in ONE fusion whose root is the reduce tuple, so a name-based pass
    files most of the conv time under "elementwise" (that artifact produced
    both the round-2 "57% conv" and the round-3 "56% elementwise" stories).
    """
    comps = {}
    instr_comp = {}  # instruction name -> defining computation
    cur = None
    for ln in hlo_text.splitlines():
        m = re.match(r"%(\S+) \(.*\) -> .* \{", ln)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif ln.startswith("ENTRY"):
            cur = "__entry__"
            comps[cur] = []
        elif cur is not None:
            if ln.startswith("}"):
                cur = None
            else:
                comps[cur].append(ln)
                mi = re.match(r"\s*(?:ROOT )?%(\S+) = ", ln)
                if mi:
                    instr_comp[mi.group(1)] = cur
    calls = {}
    for m in re.finditer(r"%(\S+) = [^\n]*? fusion\((?:[^()]|\([^)]*\))*\),"
                         r"[^\n]*?calls=%(\S+)", hlo_text):
        calls[m.group(1)] = m.group(2).rstrip(",")

    # computations referenced as a while BODY: instructions defined there
    # execute once PER TRIP (the denoise scan runs 25x), so their profile
    # totals are sums over the loop — annotate rather than let the reader
    # mistake them for single-execution costs
    bodies = {m.group(1).rstrip(",")
              for m in re.finditer(r"body=%(\S+)", hlo_text)}

    def in_loop(instr_name):
        return instr_comp.get(instr_name) in bodies

    def classify(fusion_name):
        kinds = set()
        seen = set()
        stack = [calls.get(fusion_name)]
        while stack:
            c = stack.pop()
            if not c or c in seen:
                continue
            seen.add(c)
            for ln in comps.get(c, ()):
                if "convolution-base-dilated" in ln or "lhs_dilate" in ln:
                    kinds.add("dilated")
                elif " convolution(" in ln:
                    kinds.add("conv")
                if " reduce(" in ln:
                    kinds.add("reduce")
                if "custom-call" in ln:
                    kinds.add("custom")
                m2 = re.search(r"calls=%(\S+)", ln)
                if m2:
                    stack.append(m2.group(1).rstrip(","))
        return kinds

    return classify, in_loop


def parse_xplane(logdir, top=30, hlo_text=None, bucket=None):
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:  # proto moved into tensorflow's tsl tree
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    # The TPU device plane has three lines: 'XLA Modules' (whole-executable
    # spans), 'XLA Ops' (the compute timeline — events NEST: a fusion span
    # contains its constituent op spans), and 'Async XLA Ops' (DMA spans
    # that OVERLAP compute; summing them inflates copy time ~4x and is how
    # an earlier version of this tool mis-read 54% "copy/transpose" out of
    # a 10.1s run whose union cover was 100% accounted by compute). Here:
    # ONLY the 'XLA Ops' line, with SELF time via a nesting sweep, so
    # per-category shares sum to the true device-busy total.
    by_name = collections.Counter()
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
            # sort by start asc, end desc => parents precede their children
            evs.sort(key=lambda t: (t[0], -t[1]))
            stack = []  # [end_ps, name, dur_ps, child_dur_ps]

            def close(frame):
                _, nm, dur, child = frame
                by_name[nm] += max((dur - child) / 1e9, 0.0)
                if stack:
                    stack[-1][3] += dur

            for start, end, name in evs:
                while stack and stack[-1][0] <= start:
                    close(stack.pop())
                stack.append([end, name, end - start, 0])
            while stack:
                close(stack.pop())
        if by_name:
            total = sum(by_name.values())
            break  # first device plane with op events

    def _op_kind(name):
        """Parse the HLO mnemonic out of '<lhs> = <type> <opname>(...)'.
        Substring checks over the whole text are wrong: operand NAMES (e.g.
        '%fusion.18477' feeding a custom-call) would classify the consumer
        as a fusion."""
        if " = " not in name:
            return name.lstrip("%").rstrip("0123456789.").lower()
        lhs, rhs = name.split(" = ", 1)
        if rhs.startswith("("):  # tuple result type: scan to its close
            depth = 0
            for i, ch in enumerate(rhs):
                depth += (ch == "(") - (ch == ")")
                if depth == 0:
                    rhs = rhs[i + 1:].lstrip()
                    break
        else:  # single shape (no spaces inside), then the mnemonic
            parts = rhs.split(None, 1)
            rhs = parts[1] if len(parts) > 1 else parts[0]
        return lhs.lstrip("%"), rhs.split("(", 1)[0].strip().lower()

    classify, in_loop = (build_fusion_classifier(hlo_text)
                         if hlo_text else (None, None))

    def category(name):
        parsed = _op_kind(name)
        lhs, kind = parsed if isinstance(parsed, tuple) else (parsed, parsed)
        lhs = lhs.lower()
        if kind == "fusion":
            if classify is not None:
                kinds = classify(lhs)
                if "conv" in kinds:
                    return "conv-containing fusion"
                if "dilated" in kinds:
                    return "temporal-matmul (dilated-conv) fusion"
                if "custom" in kinds:
                    return "pallas/custom"
                if "reduce" in kinds:
                    return "stats/reduce fusion"
                return "elementwise fusion"
            if "conv" in lhs or "dot" in lhs or "gemm" in lhs:
                return "matmul/conv fusion"
            return "elementwise fusion"
        if kind.startswith("copy") or kind in ("transpose", "bitcast",
                                               "reshape", "dynamic-slice",
                                               "dynamic-update-slice"):
            return "copy/transpose"
        if kind in ("convolution", "dot") or "conv" in kind:
            return "matmul/conv"
        if kind == "custom-call":
            return "pallas/custom"
        if kind.startswith(("all-", "collective", "reduce-scatter")):
            return "collective"
        if kind.startswith("reduce"):
            return "reduce"
        return "other"

    by_cat = collections.Counter()
    for name, dur in by_name.items():
        by_cat[category(name)] += dur

    print(f"\n=== device total: {total:.1f} ms ===")
    for cat, dur in by_cat.most_common():
        print(f"{dur:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {cat}")
    names = by_name.most_common()
    if bucket:
        names = [(n, d) for n, d in names if category(n) == bucket]
        print(f"\n=== top {top} ops in bucket '{bucket}' "
              f"({sum(d for _, d in names):.1f} ms total) ===")
    else:
        print(f"\n=== top {top} ops ===")
    for name, dur in names[:top]:
        tag = ""
        if in_loop is not None and " = " in name:
            lhs = name.split(" = ", 1)[0].lstrip("%")
            if in_loop(lhs):
                tag = "[xN in scan] "
        print(f"{dur:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {tag}{name[:140]}")
    return by_name, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="unet",
                    choices=["unet", "generate", "segment"])
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=25,
                    help="denoise steps for --what generate. Keep the single "
                         "program under the ~35-60 s remote-worker watchdog: "
                         "a 64-frame 25-step generate (~55 s) crashes the "
                         "worker; 5 steps (~11 s) profiles the same buckets")
    ap.add_argument("--bucket", default=None,
                    help="only list ops whose category matches, e.g. "
                         "'copy/transpose'")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    logdir = args.logdir or tempfile.mkdtemp(prefix="prof_")

    from stableanimator_tpu.core.config import PipelineConfig, UNetConfig
    from stableanimator_tpu.models.unet import UNetSpatioTemporal

    h8, w8 = args.height // 8, args.width // 8
    b, f = 2, args.frames

    if args.what == "unet":
        cfg = UNetConfig()
        model = UNetSpatioTemporal(cfg, dtype=jnp.bfloat16)
        sample = jnp.zeros((b, f, h8, w8, cfg.in_channels), jnp.bfloat16)
        t = jnp.float32(1.6377)
        ctx = jnp.zeros((b, 5, 1024), jnp.bfloat16)
        ids = jnp.asarray([[6.0, 127.0, 0.02]] * b, jnp.float32)
        pose = jnp.zeros((b * f, h8, w8, 320), jnp.bfloat16)

        shapes = jax.eval_shape(
            lambda k: model.init(k, sample, t, ctx, ids, pose),
            jax.random.PRNGKey(0))

        # fill ON DEVICE: a host tree is ~700 leaves x ~0.3s tunnel RTT each
        @jax.jit
        def fill_tree(key):
            leaves, treedef = jax.tree_util.tree_flatten(shapes)
            keys = jax.random.split(key, len(leaves))
            filled = [
                (jax.random.uniform(k, s.shape, jnp.float32, -0.05, 0.05)
                 .astype(s.dtype))
                for k, s in zip(keys, leaves)]
            return jax.tree_util.tree_unflatten(treedef, filled)

        params = fill_tree(jax.random.PRNGKey(0))

        @jax.jit
        def fwd():
            return model.apply(params, sample, t, ctx, ids, pose)

        wall = run_traced(fwd, logdir)
        print(f"UNet fwd wall: {wall*1e3:.1f} ms")
        hlo_text = fwd.lower().compile().as_text()
    elif args.what == "segment":
        # the GROUPED long-video dispatch unit: one 1-step denoise segment
        # over n_tiles/group tile groups — the program the 450f demo
        # dispatches 25x. Profiling THIS (not the flat 16f graph) is what
        # attributes the measured ~5% grouped-path excess (NOTES r3d6:
        # grouped ~386 ms/call vs flat ~368 ms at the same batch shape).
        from stableanimator_tpu.pipeline import build_models, device_fill_params
        from stableanimator_tpu.pipeline.animation import (
            _denoise_segment,
            _prep_jit,
        )

        models = build_models(dtype=jnp.bfloat16)
        params = device_fill_params(models, height=args.height,
                                    width=args.width,
                                    cast_fp32_to=jnp.bfloat16)
        pcfg = PipelineConfig(height=args.height, width=args.width,
                              num_frames=f, tile_size=16, tile_overlap=4,
                              num_inference_steps=args.steps,
                              decode_chunk_size=4)
        ref = jnp.full((1, args.height, args.width, 3), 0.5, jnp.float32)
        pose = jnp.full((f, args.height, args.width, 3), -1.0, jnp.float32)
        face = jnp.zeros((1, 512), jnp.float32)
        state = _prep_jit(models, params, ref, pose, face, pcfg,
                          jax.random.PRNGKey(1), None)
        latents, context, image_latents, add_time_ids, pose_lat = state

        import functools

        seg = jax.jit(functools.partial(_denoise_segment, models, cfg=pcfg,
                                        num_steps=1, mesh=None))
        offset = jnp.zeros((), jnp.int32)

        def fwd():
            return seg(params, latents, context, image_latents, add_time_ids,
                       pose_lat, step_start=offset)[0]

        wall = run_traced(fwd, logdir)
        from stableanimator_tpu.diffusion.tiling import tile_indices

        n_tiles = tile_indices(f, pcfg.tile_size, pcfg.tile_overlap).shape[0]
        print(f"segment wall (1 step, {n_tiles} tiles): {wall*1e3:.1f} ms "
              f"= {wall*1e3/max(n_tiles,1):.1f} ms/tile-slot")
        hlo_text = seg.lower(params, latents, context, image_latents,
                             add_time_ids, pose_lat,
                             step_start=offset).compile().as_text()
    else:
        from stableanimator_tpu.pipeline import build_models, device_fill_params
        from stableanimator_tpu.pipeline.animation import _generate_impl

        models = build_models(dtype=jnp.bfloat16)
        # fill params ON DEVICE: a host tree is ~700 leaves x ~0.3s of
        # tunnel RTT each (minutes); one jitted RNG graph is seconds
        params = device_fill_params(models, height=args.height,
                                    width=args.width,
                                    cast_fp32_to=jnp.bfloat16)
        pcfg = PipelineConfig(height=args.height, width=args.width,
                              num_frames=f, tile_size=16, tile_overlap=4,
                              num_inference_steps=args.steps,
                              decode_chunk_size=4)
        ref = jnp.full((1, args.height, args.width, 3), 0.5, jnp.float32)
        pose = jnp.full((f, args.height, args.width, 3), -1.0, jnp.float32)
        face = jnp.zeros((1, 512), jnp.float32)

        # jit the impl directly (not pipeline.generate, whose module-level
        # jit we cannot introspect) so the PROFILED executable and the HLO
        # handed to the classifier are the same program; cfg is bound in
        # the closure (it is a dataclass, not a traceable array)
        gen = jax.jit(lambda p, r, po, fa_, k:
                      _generate_impl(models, p, r, po, fa_, pcfg, k))
        key = jax.random.PRNGKey(1)

        def fwd():
            return gen(params, ref, pose, face, key)

        wall = run_traced(fwd, logdir)
        print(f"generate wall: {wall*1e3:.1f} ms")
        hlo_text = gen.lower(params, ref, pose, face, key).compile().as_text()

    parse_xplane(logdir, args.top, hlo_text=hlo_text, bucket=args.bucket)
    print(f"\ntrace: {logdir}")


if __name__ == "__main__":
    main()
