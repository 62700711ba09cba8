"""Host-side image/video IO (reference inference_basic.py:36-79)."""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np
from PIL import Image


def _frame_sort_key(name: str):
    """Sort frame_0.png, frame_10.png ... numerically; robust to other
    naming by falling back to the first integer in the name."""
    m = re.findall(r"\d+", name)
    return int(m[-1]) if m else name


def load_images_from_folder(folder: str, width: int, height: int) -> List[Image.Image]:
    files = sorted((f for f in os.listdir(folder) if f.endswith(".png")),
                   key=_frame_sort_key)
    return [Image.open(os.path.join(folder, f)).convert("RGB").resize((width, height))
            for f in files]


def pil_to_unit_array(img: Image.Image) -> np.ndarray:
    """PIL -> [1, H, W, 3] float32 in [0, 1]."""
    return np.asarray(img, np.float32)[None] / 255.0


def poses_to_array(images: List[Image.Image]) -> np.ndarray:
    """PIL pose frames -> [F, H, W, 3] float32 in [-1, 1]
    (reference inference_pipeline_animation.py:618-624)."""
    arr = np.stack([np.asarray(im, np.float32) for im in images])
    return arr / 127.5 - 1.0


def pil_to_u8_array(img: Image.Image) -> np.ndarray:
    """PIL -> [1, H, W, 3] uint8. pipeline.generate converts on device —
    ship this across the host->device boundary instead of
    pil_to_unit_array's fp32 (4x the bytes, same values)."""
    return np.asarray(img, np.uint8)[None]


def poses_to_u8_array(images: List[Image.Image]) -> np.ndarray:
    """PIL pose frames -> [F, H, W, 3] uint8 (device-side [-1,1] mapping
    in pipeline.generate; same values as poses_to_array)."""
    return np.stack([np.asarray(im, np.uint8) for im in images])


def frames_to_uint8(frames: np.ndarray) -> List[np.ndarray]:
    """[F, H, W, 3] float in [0,1] -> list of uint8 HWC arrays. uint8 input
    (from PipelineConfig.output_uint8 device-side conversion) passes
    through."""
    frames = np.asarray(frames)
    if frames.dtype == np.uint8:
        return list(frames)
    return [np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8) for f in frames]


def export_to_gif(frames: List[np.ndarray], output_path: str, duration_ms: int = 125):
    pil = [Image.fromarray(f) for f in frames]
    if output_path.endswith(".mp4"):
        output_path = output_path.replace(".mp4", ".gif")
    pil[0].save(output_path, format="GIF", append_images=pil[1:],
                save_all=True, duration=duration_ms, loop=0)


def save_frames_as_png(frames: List[np.ndarray], output_dir: str):
    os.makedirs(output_dir, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(output_dir, f"frame_{i}.png"))


def export_to_mp4(frames: List[np.ndarray], output_path: str, fps: int = 8):
    import cv2

    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    out.release()
