#!/usr/bin/env python
"""Quality evaluation: CSIM (identity preservation) + reconstruction metrics.

CSIM is the paper's headline identity metric (arXiv:2411.17697): mean cosine
similarity between the ArcFace embedding of the reference face and of each
generated frame's face. Requires the antelopev2 ONNX pair.

  python tools/evaluate.py --frames_dir out/animated_images \\
      --reference reference.png --antelopev2 checkpoints/antelopev2
  python tools/evaluate.py --frames_dir out --gt_dir ground_truth   # +PSNR/L1

FVD needs an I3D video model that is not part of the reference artifact set;
it is intentionally out of scope here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np
from PIL import Image


def load_frames(folder):
    import re

    def key(n):
        m = re.findall(r"\d+", n)
        return int(m[-1]) if m else 0

    files = sorted((f for f in os.listdir(folder) if f.endswith(".png")), key=key)
    return [np.asarray(Image.open(os.path.join(folder, f)).convert("RGB"))
            for f in files]


def csim(frames, reference, antelopev2_dir):
    from stableanimator_tpu.preproc.face import FaceModel

    model = FaceModel(os.path.join(antelopev2_dir, "scrfd_10g_bnkps.onnx"),
                      os.path.join(antelopev2_dir, "glintr100.onnx"))
    ref_emb = model.get_id_embedding(reference)
    if ref_emb is None:
        raise ValueError("no face found in the reference image")
    ref_emb = ref_emb / np.linalg.norm(ref_emb)
    sims, missing = [], 0
    for frame in frames:
        emb = model.get_id_embedding(frame)
        if emb is None:
            missing += 1
            continue
        emb = emb / np.linalg.norm(emb)
        sims.append(float(ref_emb @ emb))
    return {
        "csim_mean": float(np.mean(sims)) if sims else None,
        "csim_min": float(np.min(sims)) if sims else None,
        "frames_with_face": len(sims),
        "frames_without_face": missing,
    }


def reconstruction(frames, gt_frames):
    n = min(len(frames), len(gt_frames))
    l1s, psnrs = [], []
    for a, b in zip(frames[:n], gt_frames[:n]):
        a = a.astype(np.float32) / 255.0
        b = b.astype(np.float32) / 255.0
        l1s.append(float(np.abs(a - b).mean()))
        mse = float(np.square(a - b).mean())
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-10)))
    return {"l1_mean": float(np.mean(l1s)), "psnr_mean": float(np.mean(psnrs)),
            "num_frames": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames_dir", required=True)
    ap.add_argument("--reference", default=None)
    ap.add_argument("--antelopev2", default=None)
    ap.add_argument("--gt_dir", default=None)
    args = ap.parse_args()

    frames = load_frames(args.frames_dir)
    result = {"num_frames": len(frames)}
    if args.reference and args.antelopev2:
        ref = np.asarray(Image.open(args.reference).convert("RGB"))
        result.update(csim(frames, ref, args.antelopev2))
    if args.gt_dir:
        result.update(reconstruction(frames, load_frames(args.gt_dir)))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
