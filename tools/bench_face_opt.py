#!/usr/bin/env python
"""On-chip overhead of the HJB face optimizer at full 512^2 x 16f size
(VERDICT r4 item 6; capability per reference README.md:40,59 — the paper's
face optimization, unreleased in the reference repo).

Measures the full-size generate (25 steps) with face_opt off / steps=1 /
steps=3, identical seeds and shapes, and reports seconds/denoise-step of
overhead. The recogniser is a glintr100-SHAPED ONNX stand-in (the real
checkpoint is an external artifact): the dominant face-opt cost — the
differentiable temporal-VAE crop decode + backprop through it each inner
step — is the REAL production compute; only the (much smaller) recogniser
forward/backward is approximated, so the number is labeled standin.

Also measures the 64f SEGMENTED path with face_opt (steps=1): the
composed configuration test_face_opt.py pins for equality, timed on chip.

  python tools/bench_face_opt.py --out FACEOPT_BENCH_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync_scalar(arr):
    """Fetch one element — the only true sync on the remote platform."""
    np.asarray(arr[(0,) * arr.ndim])


def make_standin_arcface(td):
    import torch
    import torch.nn as nn

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = (
        lambda model_bytes, custom_opsets: model_bytes)

    class ArcStandin(nn.Module):
        """glintr100-shaped IO (112^2 in, 512-d out), shallow body."""

        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 32, 3, stride=2, padding=1)
            self.c2 = nn.Conv2d(32, 64, 3, stride=2, padding=1)
            self.c3 = nn.Conv2d(64, 128, 3, stride=2, padding=1)
            self.fc = nn.Linear(128 * 14 * 14, 512)

        def forward(self, x):
            h = torch.relu(self.c1(x))
            h = torch.relu(self.c2(h))
            h = torch.relu(self.c3(h))
            return self.fc(h.flatten(1))

    path = os.path.join(td, "glintr100_standin.onnx")
    with torch.no_grad():
        torch.onnx.export(ArcStandin().eval(), (torch.zeros(1, 3, 112, 112),),
                          path, opset_version=17, dynamo=False)
    return path


def timed_generate(models, params, cfg, face_opt, pose, tag, runs=2):
    from stableanimator_tpu.pipeline import generate

    rng0 = np.random.default_rng(3)
    ref = jnp.asarray(rng0.uniform(size=(1, cfg.height, cfg.width, 3)),
                      jnp.float32)
    emb = jnp.asarray(rng0.normal(size=(1, 512)), jnp.float32)
    # warm/compile execution (not timed)
    out = generate(models, params, ref, pose, emb, cfg,
                   rng=jax.random.PRNGKey(0), face_opt=face_opt)
    _sync_scalar(out if isinstance(out, np.ndarray) else np.asarray(out))
    ts = []
    for i in range(runs):
        t0 = time.time()
        out = generate(models, params, ref, pose, emb, cfg,
                       rng=jax.random.PRNGKey(i + 1), face_opt=face_opt)
        _sync_scalar(out if isinstance(out, np.ndarray) else np.asarray(out))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"[face_opt bench] {tag}: {best:.2f}s (runs {[round(t,2) for t in ts]})",
          file=sys.stderr, flush=True)
    return best, ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="FACEOPT_BENCH_r05.json")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip_segmented", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import build_models, device_fill_params
    from stableanimator_tpu.pipeline.face_opt import (
        FaceOptConfig, make_face_optimizer)
    from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function

    td = tempfile.mkdtemp(prefix="face_opt_bench_")
    arc_path = make_standin_arcface(td)

    models = build_models(dtype=jnp.bfloat16)
    params = device_fill_params(models, height=args.height, width=args.width,
                                cast_fp32_to=jnp.bfloat16)
    h8, w8 = args.height // 8, args.width // 8
    cfg = PipelineConfig(height=args.height, width=args.width,
                         num_frames=args.frames, tile_size=16, tile_overlap=4,
                         num_inference_steps=args.steps, decode_chunk_size=4,
                         output_uint8=True)
    rng0 = np.random.default_rng(1)
    pose = jnp.asarray(rng0.uniform(-1, 1,
                                    (args.frames, args.height, args.width, 3)),
                       jnp.float32)
    emb = np.random.default_rng(2).normal(size=(512,)).astype(np.float32)

    def opt_for(steps):
        if steps == 0:
            return None
        return make_face_optimizer(
            models, params, FaceOptConfig(steps=steps, lr=0.1, start_step=8),
            load_onnx_function(arc_path), emb, None, h8, w8,
            channel_order="standard", num_frames=args.frames)

    result = {"what": "HJB face-opt on-chip overhead, full-size UNet+VAE, "
                      "stand-in recogniser (glintr100-shaped IO; crop-decode "
                      "+ backprop through the real temporal VAE)",
              "config": {"height": args.height, "width": args.width,
                         "frames": args.frames, "steps": args.steps},
              "standin_arcface": True, "runs": {}}
    base, base_all = timed_generate(models, params, cfg, None, pose, "base",
                                    runs=args.runs)
    result["runs"]["base"] = {"best_s": round(base, 2),
                              "all_s": [round(t, 2) for t in base_all]}
    for steps in (1, 3):
        sec, all_s = timed_generate(models, params, cfg, opt_for(steps), pose,
                                    f"face_opt_steps{steps}", runs=args.runs)
        # the optimizer only runs from start_step=8 -> over (25-8)=17 steps
        active = max(args.steps - 8, 1)
        result["runs"][f"face_opt_steps{steps}"] = {
            "best_s": round(sec, 2),
            "all_s": [round(t, 2) for t in all_s],
            "overhead_s": round(sec - base, 2),
            "overhead_s_per_active_denoise_step": round((sec - base) / active, 3),
        }

    if not args.skip_segmented:
        # composed with the segmented long-video path: 64f, auto spd
        # (halved slot budget under face_opt)
        f64 = 64
        cfg64 = PipelineConfig(height=args.height, width=args.width,
                               num_frames=f64, tile_size=16, tile_overlap=4,
                               num_inference_steps=args.steps,
                               decode_chunk_size=4, output_uint8=True)
        pose64 = jnp.asarray(
            np.random.default_rng(4).uniform(
                -1, 1, (f64, args.height, args.width, 3)), jnp.float32)
        b64, b64_all = timed_generate(models, params, cfg64, None, pose64,
                                      "base_64f_segmented", runs=1)
        def opt64(steps):
            return make_face_optimizer(
                models, params,
                FaceOptConfig(steps=steps, lr=0.1, start_step=8),
                load_onnx_function(arc_path), emb, None, h8, w8,
                channel_order="standard", num_frames=f64)
        s64, s64_all = timed_generate(models, params, cfg64, opt64(1), pose64,
                                      "face_opt_64f_segmented", runs=1)
        result["runs"]["segmented_64f"] = {
            "base_s": round(b64, 2), "face_opt_steps1_s": round(s64, 2),
            "overhead_s": round(s64 - b64, 2)}

    with open(args.out, "w") as fjson:
        json.dump(result, fjson, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
