"""Skeleton-extraction CLI (reference DWPose/skeleton_extraction.py:189-205).

Detects DWPose skeletons on a reference image and every target frame,
aligns the target skeletons to the reference body shape, and writes
OpenPose-style renderings as frame_{i}.png.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Skeleton extraction from images.")
    p.add_argument("--target_image_folder_path", type=str, required=True)
    p.add_argument("--ref_image_path", type=str, required=True)
    p.add_argument("--poses_folder_path", type=str, required=True)
    p.add_argument("--dwpose_dir", type=str, default="checkpoints/DWPose",
                   help="directory with yolox_l.onnx and dw-ll_ucoco_384.onnx")
    p.add_argument("--max_persons", type=int, default=None,
                   help="per-frame person cap (default 10; the reference "
                        "keeps every box — raise for crowd frames)")
    return p.parse_args()


def main():
    args = parse_args()
    from stableanimator_tpu.preproc.skeleton_extraction import get_video_pose
    from stableanimator_tpu.preproc.wholebody import WholebodyDetector
    from stableanimator_tpu.utils.image import (
        _frame_sort_key,
        read_image_rgb,
        write_image_bgr_convention,
    )

    detector = WholebodyDetector(
        os.path.join(args.dwpose_dir, "yolox_l.onnx"),
        os.path.join(args.dwpose_dir, "dw-ll_ucoco_384.onnx"),
        max_det=args.max_persons)

    ref = read_image_rgb(args.ref_image_path)
    files = sorted((f for f in os.listdir(args.target_image_folder_path)
                    if f.endswith(".png")), key=_frame_sort_key)
    frames = [read_image_rgb(
        os.path.join(args.target_image_folder_path, f)) for f in files]

    maps = get_video_pose(detector, frames, ref)  # [F, 3, H, W]
    os.makedirs(args.poses_folder_path, exist_ok=True)
    for i in range(maps.shape[0]):
        path = os.path.join(args.poses_folder_path, f"frame_{i}.png")
        write_image_bgr_convention(path, np.transpose(maps[i], (1, 2, 0)))
        print(f"save the pose image in {path}")


if __name__ == "__main__":
    main()
