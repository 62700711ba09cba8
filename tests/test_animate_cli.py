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


def test_animate_cli_driving_video_inline_dwpose(tmp_path, monkeypatch):
    """--driving_video_folder: raw frames in, DWPose skeleton extraction
    runs inline (stand-in ONNX) overlapped with the generate-graph warm —
    the reference's skeleton_extraction.py + inference_basic.py flow in one
    command."""
    from PIL import Image

    from tools.bench_preproc import _standin_paths

    rng = np.random.default_rng(1)
    ckpt = tmp_path / "ckpt"
    driving = tmp_path / "driving"
    out = tmp_path / "out"
    ckpt.mkdir()
    driving.mkdir()
    dwpose = ckpt / "DWPose"
    dwpose.mkdir()
    standin = tmp_path / "standin"
    standin.mkdir()
    det, pose = _standin_paths(str(standin))
    os.replace(det, dwpose / "yolox_l.onnx")
    os.replace(pose, dwpose / "dw-ll_ucoco_384.onnx")

    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        tmp_path / "reference.png")
    for i in range(4):  # zeros: stand-in detector finds nothing -> full-img
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
            driving / f"frame_{i}.png")

    from stableanimator_tpu.cli import animate as cli

    monkeypatch.setattr("sys.argv", ["animate.py",
        "--checkpoint_dir", str(ckpt),
        "--reference_image", str(tmp_path / "reference.png"),
        "--driving_video_folder", str(driving),
        "--output_dir", str(out),
        "--height", "64", "--width", "64",
        "--tile_size", "4", "--frames_overlap", "1",
        "--num_inference_steps", "2", "--decode_chunk_size", "2",
        "--allow_random_init", "--model_scale", "micro"])
    cli.main()

    assert (out / "animation_video.mp4").exists()
    assert len(os.listdir(out / "animated_images")) == 4


def test_animate_cli_rejects_both_pose_sources(tmp_path, monkeypatch):
    from stableanimator_tpu.cli import animate as cli

    monkeypatch.setattr("sys.argv", ["animate.py",
        "--checkpoint_dir", str(tmp_path), "--reference_image", "r.png",
        "--output_dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main()
