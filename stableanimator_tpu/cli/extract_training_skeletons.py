"""Training-path skeleton extraction (reference
DWPose/training_skeleton_extraction.py:126-167): walk dataset folders
`{root}/{name}/images` and write unaligned pose renderings to a sibling
`poses/` folder, skipping frames that already exist (idempotent)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from stableanimator_tpu.utils.image import (
    read_image_rgb,
    write_image_bgr_convention,
)


def parse_args():
    p = argparse.ArgumentParser(description="Batch skeleton extraction for training data.")
    p.add_argument("--video_folder", type=str, required=True,
                   help="root containing {name}/images subfolders")
    p.add_argument("--dwpose_dir", type=str, default="checkpoints/DWPose")
    p.add_argument("--max_persons", type=int, default=None,
                   help="per-frame person cap (default 10; the reference "
                        "keeps every box — raise for crowd frames)")
    return p.parse_args()


def main():
    args = parse_args()
    from stableanimator_tpu.preproc.skeleton_extraction import render_training_pose
    from stableanimator_tpu.preproc.wholebody import WholebodyDetector

    detector = WholebodyDetector(
        os.path.join(args.dwpose_dir, "yolox_l.onnx"),
        os.path.join(args.dwpose_dir, "dw-ll_ucoco_384.onnx"),
        max_det=args.max_persons)

    for name in sorted(os.listdir(args.video_folder)):
        images_dir = os.path.join(args.video_folder, name, "images")
        if not os.path.isdir(images_dir):
            continue
        poses_dir = os.path.join(args.video_folder, name, "poses")
        os.makedirs(poses_dir, exist_ok=True)
        for fname in sorted(os.listdir(images_dir)):
            if not fname.endswith(".png"):
                continue
            out_path = os.path.join(poses_dir, fname)
            if os.path.exists(out_path):
                continue
            img = read_image_rgb(os.path.join(images_dir, fname))
            pose_img = render_training_pose(detector, img)
            # channel-swap write convention: the data contract the released
            # checkpoints were trained on (reference
            # training_skeleton_extraction.py:165-167); matches the
            # inference-path extractor (extract_skeleton.py)
            write_image_bgr_convention(out_path,
                                       np.transpose(pose_img, (1, 2, 0)))
            print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
