#!/usr/bin/env python
"""Day-0 evaluation drill: prove the WHOLE quality-evaluation path executes
end-to-end (VERDICT r4 item 7) and record the JSON it emits.

Real CSIM/FVD parity with the paper (arXiv:2411.17697 Tab. 1) is gated on
the released checkpoints + antelopev2 + an I3D export, none of which are in
this environment — so this drill runs the identical code path on labeled
STAND-INS:

  1. generate two micro videos with the REAL inference CLI
     (cli/animate.py --allow_random_init, 64x64, the verify-skill smoke
     configuration) — seeds differ, so frames differ;
  2. synthesize antelopev2-shaped ONNX stand-ins (SCRFD multi-scale heads +
     glintr100-shaped recogniser) and an I3D-shaped Conv3d network;
  3. run tools/evaluate.py (the production entry) on video A vs video B:
     CSIM through the SCRFD->ArcFace chain, PSNR/L1, FVD through the
     ONNX->XLA executor;
  4. write EVAL_r05-style JSON with standin_weights: true.

Swap real .onnx/.npz files in and the same two commands produce the real
numbers — that is the day-0 drill this rehearses.

  python tools/eval_drill.py --out EVAL_r05.json [--height 64 --frames 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_inputs(td, frames, h, w):
    rng = np.random.default_rng(0)
    ref = os.path.join(td, "reference.png")
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(ref)
    poses = os.path.join(td, "poses")
    os.makedirs(poses)
    for i in range(frames):
        img = np.zeros((h, w, 3), np.uint8)
        img[(10 + i * 3) % (h - 20):(30 + i * 3) % h, w // 3:2 * w // 3] = 255
        Image.fromarray(img).save(os.path.join(poses, f"frame_{i}.png"))
    return ref, poses


def make_standins(td):
    """antelopev2-shaped + I3D-shaped ONNX stand-ins (test_preproc.py /
    test_misc.py patterns)."""
    import torch
    import torch.nn as nn

    # torch's legacy exporter only needs the `onnx` package for onnxscript
    # custom-function injection, which these plain models never use; bypass
    # it so export works without the (absent) onnx package (same shim as
    # tests/test_onnx.py).
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = (
        lambda model_bytes, custom_opsets: model_bytes)

    av2 = os.path.join(td, "antelopev2")
    os.makedirs(av2)
    torch.manual_seed(2)

    class ScrfdStandin(nn.Module):
        def __init__(self):
            super().__init__()
            self.heads = nn.ModuleList([
                nn.Conv2d(3, 2 * (1 + 4 + 10), s, stride=s)
                for s in (8, 16, 32)])

        def forward(self, x):
            outs_s, outs_b, outs_k = [], [], []
            for head in self.heads:
                y = head(x)
                b, c, hh, ww = y.shape
                y = y.reshape(1, 2, 15, hh, ww).permute(0, 3, 4, 1, 2)
                y = y.reshape(1, hh * ww * 2, 15)
                outs_s.append(y[..., :1].sigmoid().reshape(-1, 1))
                outs_b.append(y[..., 1:5].abs().reshape(-1, 4))
                outs_k.append(y[..., 5:].reshape(-1, 10))
            return tuple(outs_s) + tuple(outs_b) + tuple(outs_k)

    class ArcStandin(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 16, stride=16)
            self.fc = nn.Linear(4 * 7 * 7, 512)

        def forward(self, x):
            return self.fc(self.conv(x).flatten(1))

    class I3DStandin(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv3d(3, 8, (7, 7, 7), stride=(2, 8, 8), padding=3)
            self.head = nn.Conv3d(8, 16, 1)

        def forward(self, x):
            h = torch.relu(self.conv(x))
            h = torch.nn.functional.avg_pool3d(h, (2, 4, 4), stride=2)
            return self.head(h).mean(dim=(2, 3, 4))

    def export(model, example, path):
        torch.onnx.export(model.eval(), example, path, opset_version=17,
                          dynamo=False)
        return path

    export(ScrfdStandin(), torch.randn(1, 3, 640, 640),
           os.path.join(av2, "scrfd_10g_bnkps.onnx"))
    export(ArcStandin(), torch.randn(1, 3, 112, 112),
           os.path.join(av2, "glintr100.onnx"))
    i3d = export(I3DStandin(), torch.zeros(1, 3, 16, 224, 224),
                 os.path.join(td, "i3d.onnx"))
    return av2, i3d


def run_animate(td, tag, seed, ref, poses, h, w, frames):
    out_dir = os.path.join(td, f"out_{tag}")
    cmd = [sys.executable, "-m", "stableanimator_tpu.cli.animate",
           "--checkpoint_dir", os.path.join(td, "ckpt"),
           "--reference_image", ref, "--pose_control_folder", poses,
           "--output_dir", out_dir, "--height", str(h), "--width", str(w),
           "--tile_size", str(min(4, frames)), "--frames_overlap", "1",
           "--num_inference_steps", "2", "--decode_chunk_size", "2",
           "--allow_random_init", "--seed", str(seed)]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                          timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(f"animate {tag} failed:\n{proc.stderr[-2000:]}")
    frames_dir = os.path.join(out_dir, "animated_images")
    n = len([f for f in os.listdir(frames_dir) if f.endswith(".png")])
    return frames_dir, n, round(time.time() - t0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_r05.json")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    td = tempfile.mkdtemp(prefix="eval_drill_")
    os.makedirs(os.path.join(td, "ckpt"))
    ref, poses = make_inputs(td, args.frames, args.height, args.width)
    av2, i3d = make_standins(td)

    gen_a, n_a, t_a = run_animate(td, "a", 1, ref, poses, args.height,
                                  args.width, args.frames)
    gen_b, n_b, t_b = run_animate(td, "b", 2, ref, poses, args.height,
                                  args.width, args.frames)

    cmd = [sys.executable, "tools/evaluate.py", "--frames_dir", gen_a,
           "--reference", ref, "--antelopev2", av2, "--gt_dir", gen_b,
           "--fvd_i3d", i3d, "--fvd_clip_len", str(min(16, args.frames))]
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                          timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(f"evaluate.py failed:\n{proc.stderr[-2000:]}")
    metrics = json.loads(proc.stdout)

    result = {
        "what": "day-0 evaluation drill: cli/animate (2 seeds) -> "
                "tools/evaluate.py CSIM+PSNR/L1+FVD, ALL STAND-IN WEIGHTS "
                "(diffusion random-init, antelopev2/I3D synthesized) — "
                "proves the path executes, not quality parity",
        "standin_weights": True,
        "config": {"height": args.height, "width": args.width,
                   "frames": args.frames, "steps": 2},
        "generate_seconds": [t_a, t_b],
        "frames_generated": [n_a, n_b],
        "metrics": metrics,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
