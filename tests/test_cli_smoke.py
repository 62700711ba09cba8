"""One end-to-end smoke per CLI entry point (VERDICT r4 item 2): every
`cli/*.py` main must run on a tiny synthetic input so no entry point can
ship broken (round 4 shipped extract_face_masks with a NameError that no
test imported). animate/serve/train have dedicated CLI tests
(test_animate_cli.py, test_serve.py, test_train_cli.py); the extraction
CLIs are driven here. Reference contracts: face_mask_extraction.py:41-85,
DWPose/skeleton_extraction.py:189-205."""

import numpy as np
import pytest
from PIL import Image


def _write_frames(folder, n=2, h=64, w=48, seed=0):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        p = folder / f"frame_{i}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    return paths


class _FakeWholebody:
    """18-joint stand-in detector (pattern from test_preproc.py)."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, image_rgb):
        n = 18
        xs = np.linspace(0.2, 0.8, n)
        ys = np.linspace(0.1, 0.9, n)
        bodies = np.stack([xs, ys], axis=1)[None]  # [1, 18, 2]
        return {
            "bodies": {"candidate": bodies.reshape(-1, 2),
                       "subset": np.arange(n, dtype=np.float32)[None],
                       "score": np.full((1, n), 0.9, np.float32)},
            "faces": np.full((1, 68, 2), 0.5, np.float32),
            "faces_score": np.full((1, 68), 0.9, np.float32),
            "hands": np.full((2, 21, 2), 0.5, np.float32),
            "hands_score": np.full((2, 21), 0.9, np.float32),
        }


def test_extract_face_masks_cli(tmp_path, monkeypatch, capsys):
    """No detector ONNX present -> every mask falls back to all-white
    (reference face_mask_extraction.py:34-38); the CLI must still read and
    write images (the round-4 NameError repro)."""
    from stableanimator_tpu.cli import extract_face_masks as cli

    images = tmp_path / "images"
    _write_frames(images, n=2)
    monkeypatch.setattr("sys.argv", [
        "prog", "--image_folder", str(images),
        "--scrfd_onnx", str(tmp_path / "missing_scrfd.onnx"),
        "--retinaface_onnx", str(tmp_path / "missing_retina.onnx")])
    cli.main()

    out = tmp_path / "faces"
    files = sorted(out.glob("*.png"))
    assert len(files) == 2
    for f in files:
        mask = np.asarray(Image.open(f))
        assert mask.shape == (64, 48)
        assert (mask == 255).all()  # all-white fallback tier

    # idempotent skip-if-exists (reference face_mask_extraction.py:52-55)
    cli.main()
    assert "already exists" in capsys.readouterr().out


def test_extract_skeleton_cli(tmp_path, monkeypatch):
    """Inference-path skeleton CLI end-to-end with a stand-in detector:
    reads ref + target frames, writes one aligned pose render per frame."""
    from stableanimator_tpu.cli import extract_skeleton as cli

    monkeypatch.setattr(
        "stableanimator_tpu.preproc.wholebody.WholebodyDetector",
        _FakeWholebody)

    targets = tmp_path / "targets"
    _write_frames(targets, n=3)
    ref = tmp_path / "ref.png"
    Image.fromarray(np.zeros((64, 48, 3), np.uint8)).save(ref)

    poses = tmp_path / "poses"
    monkeypatch.setattr("sys.argv", [
        "prog", "--target_image_folder_path", str(targets),
        "--ref_image_path", str(ref),
        "--poses_folder_path", str(poses),
        "--dwpose_dir", str(tmp_path)])
    cli.main()

    files = sorted(poses.glob("frame_*.png"))
    assert len(files) == 3
    for f in files:
        img = np.asarray(Image.open(f))
        assert img.shape == (64, 48, 3)
        assert img.any()  # a skeleton was actually rasterized


def test_extract_training_skeletons_cli(tmp_path, monkeypatch):
    """Training-path batch walker: {root}/{name}/images -> poses/
    (reference training_skeleton_extraction.py:126-167)."""
    from stableanimator_tpu.cli import extract_training_skeletons as cli

    monkeypatch.setattr(
        "stableanimator_tpu.preproc.wholebody.WholebodyDetector",
        _FakeWholebody)

    images = tmp_path / "clip0" / "images"
    _write_frames(images, n=2)
    monkeypatch.setattr("sys.argv", [
        "prog", "--video_folder", str(tmp_path), "--dwpose_dir", "unused"])
    cli.main()

    files = sorted((tmp_path / "clip0" / "poses").glob("*.png"))
    assert len(files) == 2


def test_every_cli_module_imports():
    """Import every cli module (catches module-level breakage: bad imports,
    syntax errors) — the per-main smokes above catch runtime breakage."""
    import importlib
    import pkgutil

    import stableanimator_tpu.cli as cli_pkg

    mods = [m.name for m in pkgutil.iter_modules(cli_pkg.__path__)]
    assert {"animate", "extract_face_masks", "extract_skeleton",
            "extract_training_skeletons", "serve", "train"} <= set(mods)
    for m in mods:
        importlib.import_module(f"stableanimator_tpu.cli.{m}")
