"""End-to-end test of the inference CLI itself (cli/animate.py main) — the
full user contract: checkpoint-dir handling, pose-folder load, face-model
fallback warnings, generate, and the gif/mp4/png export set, with
--model_scale micro on CPU. Mirrors tests/test_train_cli.py (round-1
lesson: every driver/user-facing entry point needs a test that calls it
exactly as a user would). The TPU smoke drive (.claude/skills/verify)
covers the full-size model; this covers the CLI wiring without a chip.

Reference surface: inference_basic.py:81-213 flags;
animation_video.{gif,mp4} + animated_images/ outputs
(inference_basic.py:56-64, 560-562)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_animate_cli_end_to_end_micro(tmp_path, monkeypatch):
    from PIL import Image

    rng = np.random.default_rng(0)
    ckpt = tmp_path / "ckpt"
    poses = tmp_path / "poses"
    out = tmp_path / "out"
    ckpt.mkdir()
    poses.mkdir()

    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        tmp_path / "reference.png")
    n_frames = 4
    for i in range(n_frames):
        img = np.zeros((64, 64, 3), np.uint8)
        img[10 + i * 5:30 + i * 5, 20:40] = 255
        Image.fromarray(img).save(poses / f"frame_{i}.png")

    from stableanimator_tpu.cli import animate as cli

    monkeypatch.setattr("sys.argv", ["animate.py",
        "--checkpoint_dir", str(ckpt),
        "--reference_image", str(tmp_path / "reference.png"),
        "--pose_control_folder", str(poses),
        "--output_dir", str(out),
        "--height", "64", "--width", "64",
        "--tile_size", "4", "--frames_overlap", "1",
        "--num_inference_steps", "2", "--decode_chunk_size", "2",
        "--allow_random_init", "--model_scale", "micro"])
    cli.main()

    assert (out / "animation_video.gif").exists()
    assert (out / "animation_video.mp4").exists()
    pngs = sorted(os.listdir(out / "animated_images"))
    assert len(pngs) == n_frames
    # non-degenerate pixels (random weights, but the VAE decode + [-1,1]
    # un-normalisation must not collapse to a constant or NaN-poison)
    frame = np.asarray(Image.open(out / "animated_images" / pngs[0]))
    assert frame.shape == (64, 64, 3)
    assert frame.std() > 0
