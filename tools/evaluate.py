#!/usr/bin/env python
"""Quality evaluation: CSIM (identity), FVD (video quality), PSNR/L1.

CSIM is the paper's headline identity metric (arXiv:2411.17697): mean cosine
similarity between the ArcFace embedding of the reference face and of each
generated frame's face. Requires the antelopev2 ONNX pair.

FVD (the paper's video-quality metric) is the Fréchet distance between I3D
features of generated and real clips, computed through the self-contained
ONNX->XLA executor. The I3D checkpoint is an external artifact (point
--fvd_i3d at any I3D .onnx, e.g. the standard rgb-Kinetics-400 export);
clips shorter than the window are rejected, longer ones are split into
non-overlapping windows.

  python tools/evaluate.py --frames_dir out/animated_images \\
      --reference reference.png --antelopev2 checkpoints/antelopev2
  python tools/evaluate.py --frames_dir out --gt_dir ground_truth   # +PSNR/L1
  python tools/evaluate.py --frames_dir out --gt_dir gt \\
      --fvd_i3d i3d_rgb.onnx                                        # +FVD
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


def _i3d_features(clips, i3d_fn, size=224):
    """I3D features for a list of [T, H, W, 3] uint8 clips.
    Preprocess follows the standard FVD recipe: resize to 224, scale to
    [-1, 1], NCTHW layout. Output of any head shape is flattened to [D]."""
    import cv2

    feats = []
    for clip in clips:
        frames = np.stack([
            cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
            for f in clip])
        x = frames.astype(np.float32) / 127.5 - 1.0         # [T,H,W,3]
        x = x.transpose(3, 0, 1, 2)[None]                    # [1,3,T,H,W]
        out = i3d_fn(x)
        out = out[0] if isinstance(out, (tuple, list)) else out
        feats.append(np.asarray(out).reshape(-1))
    return np.stack(feats)


def frechet_distance(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """Fréchet distance between two Gaussian feature fits
    (FVD / FID formula: |mu_a-mu_b|^2 + Tr(Sa + Sb - 2 sqrtm(Sa Sb)))."""
    from scipy.linalg import sqrtm

    mu_a, mu_b = feat_a.mean(0), feat_b.mean(0)
    sa = np.cov(feat_a, rowvar=False)
    sb = np.cov(feat_b, rowvar=False)
    sa = np.atleast_2d(sa)
    sb = np.atleast_2d(sb)
    covmean = sqrtm(sa @ sb)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(sa) + np.trace(sb)
                 - 2.0 * np.trace(covmean))


def _windows(frames, clip_len):
    """Split a frame list into non-overlapping [clip_len, H, W, 3] windows."""
    out = []
    for start in range(0, len(frames) - clip_len + 1, clip_len):
        out.append(np.stack(frames[start:start + clip_len]))
    return out


def fvd(gen_frames, real_frames, i3d_onnx_path, clip_len=16):
    """FVD between generated and real frame sequences through the
    ONNX->XLA executor (paper metric, arXiv:2411.17697 Tab. 1)."""
    import jax

    from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function

    fn = load_onnx_function(i3d_onnx_path).jitted()
    gen_clips = _windows(gen_frames, clip_len)
    real_clips = _windows(real_frames, clip_len)
    if not gen_clips or not real_clips:
        raise ValueError(
            f"need at least {clip_len} frames per side for FVD "
            f"(got {len(gen_frames)} gen / {len(real_frames)} real)")
    return {
        "fvd": frechet_distance(_i3d_features(gen_clips, fn),
                                _i3d_features(real_clips, fn)),
        "fvd_gen_clips": len(gen_clips),
        "fvd_real_clips": len(real_clips),
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
    ap.add_argument("--fvd_i3d", default=None,
                    help="path to an I3D .onnx (external artifact); "
                         "enables FVD against --gt_dir")
    ap.add_argument("--fvd_clip_len", type=int, default=16)
    args = ap.parse_args()

    frames = load_frames(args.frames_dir)
    result = {"num_frames": len(frames)}
    if args.reference and args.antelopev2:
        ref = np.asarray(Image.open(args.reference).convert("RGB"))
        result.update(csim(frames, ref, args.antelopev2))
    if args.gt_dir:
        gt = load_frames(args.gt_dir)
        result.update(reconstruction(frames, gt))
        if args.fvd_i3d:
            result.update(fvd(frames, gt, args.fvd_i3d,
                              clip_len=args.fvd_clip_len))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
