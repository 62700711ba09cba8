"""Coverage for small subsystems: tiling tables, image utils, trace dumps."""

import io
import os
import sys

import numpy as np
import pytest

from stableanimator_tpu.diffusion.tiling import tile_blend_weight, tile_indices


class TestTiling:
    def test_single_tile(self):
        idx = tile_indices(16, 16, 4)
        assert idx.shape == (1, 16)
        np.testing.assert_array_equal(idx[0], np.arange(16))

    def test_overlapping_tiles_match_reference_construction(self):
        """Mirror of the reference expression at
        inference_pipeline_animation.py:613-616."""
        for f, tile, overlap in [(24, 16, 4), (36, 16, 4), (20, 8, 2)]:
            expected = [[0, *range(i + 1, min(i + tile, f))]
                        for i in range(0, f - tile + 1, tile - overlap)]
            if expected[-1][-1] < f - 1:
                expected.append([0, *range(f - tile + 1, f)])
            got = tile_indices(f, tile, overlap)
            np.testing.assert_array_equal(got, np.asarray(expected))
            # every window is anchored at frame 0 and covers all frames
            assert (got[:, 0] == 0).all()
            assert set(got.reshape(-1)) == set(range(f))

    def test_blend_weights_triangular(self):
        w = tile_blend_weight(16)
        assert w.shape == (16,)
        assert abs(w[0] - w[-1]) < 1e-6  # symmetric
        assert w.argmax() in (7, 8)
        ref = np.minimum((np.arange(16) + 0.5) * 2 / 16,
                         2 - (np.arange(16) + 0.5) * 2 / 16)
        np.testing.assert_allclose(w, ref)

    def test_too_few_frames_raises(self):
        with pytest.raises(ValueError):
            tile_indices(8, 16, 4)


class TestImageUtils:
    def test_roundtrip_and_sorting(self, tmp_path):
        from PIL import Image

        from stableanimator_tpu.utils.image import (
            export_to_gif,
            frames_to_uint8,
            load_images_from_folder,
            pil_to_unit_array,
            poses_to_array,
            save_frames_as_png,
        )

        rng = np.random.default_rng(0)
        # write frames out of lexicographic order to test numeric sort
        for i in (0, 2, 10, 1):
            arr = rng.integers(0, 255, (16, 12, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / f"frame_{i}.png")
        imgs = load_images_from_folder(str(tmp_path), width=12, height=16)
        assert len(imgs) == 4

        unit = pil_to_unit_array(imgs[0])
        assert unit.shape == (1, 16, 12, 3)
        assert 0.0 <= unit.min() and unit.max() <= 1.0

        poses = poses_to_array(imgs)
        assert poses.shape == (4, 16, 12, 3)
        assert -1.0 <= poses.min() and poses.max() <= 1.0

        frames = rng.uniform(0, 1, (3, 16, 12, 3)).astype(np.float32)
        u8 = frames_to_uint8(frames)
        assert u8[0].dtype == np.uint8
        out = tmp_path / "out"
        save_frames_as_png(u8, str(out))
        assert len(os.listdir(out)) == 3
        export_to_gif(u8, str(tmp_path / "v.gif"))
        assert (tmp_path / "v.gif").exists()


class TestTrace:
    def test_dump_format(self, capsys):
        from stableanimator_tpu.core import trace

        trace.enable(True)
        try:
            trace.dump("latents", np.ones((2, 3), np.float32) * 2)
        finally:
            trace.enable(False)
        out = capsys.readouterr().out
        assert "tensor [latents] size: [2, 3]" in out
        assert "mean: 2.0" in out

    def test_disabled_is_silent(self, capsys):
        from stableanimator_tpu.core import trace

        trace.enable(False)
        trace.dump("x", np.zeros((1,)))
        assert capsys.readouterr().out == ""


class TestFVD:
    """FVD scaffolding (tools/evaluate.py): I3D features through the
    ONNX->XLA executor + Fréchet distance (paper metric arXiv:2411.17697;
    the real I3D checkpoint is an external artifact — any I3D-shaped onnx
    slots in)."""

    def test_frechet_distance_properties(self):
        from tools.evaluate import frechet_distance

        rng = np.random.default_rng(0)
        a = rng.normal(size=(64, 8)).astype(np.float64)
        b = rng.normal(loc=3.0, size=(64, 8)).astype(np.float64)
        same = frechet_distance(a, a)
        far = frechet_distance(a, b)
        assert abs(same) < 1e-6
        assert far > 8.0 * 0.5  # mean shift of 3 in 8 dims dominates

    def test_fvd_through_onnx_executor(self, tmp_path):
        import torch
        import torch.nn as nn

        from tests.test_onnx import _export
        from tools.evaluate import fvd

        class I3DStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv3d(3, 8, (7, 7, 7), stride=(2, 4, 4),
                                      padding=3)
                self.head = nn.Conv3d(8, 16, 1)

            def forward(self, x):
                h = torch.relu(self.conv(x))
                h = torch.nn.functional.avg_pool3d(h, (2, 8, 8), stride=2)
                return self.head(h).mean(dim=(2, 3, 4))

        path = _export(tmp_path, I3DStandin().eval(),
                       (torch.zeros(1, 3, 4, 32, 32),), name="i3d.onnx")

        rng = np.random.default_rng(1)
        gen = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
               for _ in range(8)]
        real = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                for _ in range(8)]
        out = fvd(gen, real, path, clip_len=4)
        assert np.isfinite(out["fvd"])
        assert out["fvd_gen_clips"] == 2 and out["fvd_real_clips"] == 2
        # identical distributions -> ~0
        out_same = fvd(gen, gen, path, clip_len=4)
        assert abs(out_same["fvd"]) < 1e-4


def test_metrics_logger_jsonl(tmp_path):
    """MetricsLogger writes flushed JSONL records (reference --report_to
    equivalent, SURVEY.md §5.5)."""
    import json

    from stableanimator_tpu.core.metrics import MetricsLogger

    log = MetricsLogger(str(tmp_path), report_to="jsonl")
    log.log(10, {"loss": 0.5, "grad_norm": 1.25})
    log.log(20, {"loss": 0.25})
    # flushed line-by-line: readable before close
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 10 and lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 20
    log.close()

    noop = MetricsLogger(str(tmp_path), report_to="none")
    noop.log(1, {"loss": 1.0})
    noop.close()


@pytest.mark.slow
def test_bench_micro_smoke():
    """The driver runs bench.py once per round on the real chip; its control
    flow (device param fill -> warmup attempts -> timed runs -> the single
    JSON line) must be exercised in CI so a flow regression can't burn the
    round's one shot. BENCH_MICRO=1 runs the identical code path with
    depth-1 micro models at 64^2 x 4f x 2 steps on CPU."""
    import json
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(BENCH_MICRO="1", JAX_PLATFORMS="cpu", BENCH_BUDGET_S="560",
               XLA_FLAGS="--xla_backend_optimization_level=0")
    proc = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                          env=env, cwd=root, capture_output=True, text=True,
                          timeout=620)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "frames_per_sec_micro_smoke"
    assert rec["detail"]["ok"] and rec["value"] > 0
    assert rec["detail"]["all_runs_s"]


@pytest.mark.slow
def test_bench_e2e_micro_smoke():
    """bench_e2e's control flow — warm-overlapped compile pass (pose
    extraction under the generate-graph warm), serial timed runs, and the
    pipelined-videos mode — exercised end-to-end with micro models on CPU
    so a flow regression can't burn an on-chip 450-frame run."""
    import json
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "bench_e2e.py"),
         "--cpu", "--model_scale", "micro", "--height", "64", "--width", "64",
         "--frames", "14", "--steps", "3", "--tile_size", "4",
         "--tile_overlap", "1", "--decode_chunk_size", "2", "--runs", "1",
         "--pipelined", "2"],
        cwd=root, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["value"] > 0
    d = rec["detail"]
    # 14f/tile4 routes segmented -> the warm dummy-executes the programs
    assert d["warm"]["path"] == "segmented" and d["warm"]["executed"]
    assert "error" not in d["warm"]
    assert d["pipelined"]["videos"] == 2
    assert len(d["pipelined"]["per_video_generate_export_s"]) == 2
    assert d["pipelined"]["seconds_per_video_steady"] > 0


class TestBenchToolHelpers:
    """The bench tools double as regression oracles; their formulation
    helpers must stay numerically equal to the model's direct path."""

    def test_conv_formulations_match_direct(self):
        import jax.numpy as jnp

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.bench_conv import (conv_direct, conv_im2col, conv_padN,
                                      conv_shift9, conv_tapmajor)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.float32)
        ref = np.asarray(conv_direct(x, w))
        for name, fn in [("im2col", conv_im2col), ("shift9", conv_shift9),
                         ("tapmajor", conv_tapmajor), ("padN", conv_padN)]:
            out = np.asarray(fn(x, w))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    def test_fusion_classifier_contents(self):
        """profile_unet's content-aware classifier: an output fusion whose
        root is a reduce tuple but whose body contains a convolution must
        classify as conv (the round-2/3 misattribution this fixes)."""
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.profile_unet import build_fusion_classifier

        hlo = """\
%fused_computation.1 (p0: bf16[2,8,8,4]) -> (f32[2,4], bf16[2,8,8,4]) {
  %p0 = bf16[2,8,8,4]{3,2,1,0} parameter(0)
  %c = bf16[2,8,8,4]{3,2,1,0} convolution(%p0, %p0), window={size=3x3}
  %r = f32[2,4]{1,0} reduce(%c, %z), dimensions={1,2}
  ROOT %t = (f32[2,4]{1,0}, bf16[2,8,8,4]{3,2,1,0}) tuple(%r, %c)
}

%fused_computation.2 (p0: bf16[8,16]) -> bf16[8,16] {
  %p0 = bf16[8,16]{1,0} parameter(0)
  ROOT %m = bf16[8,16]{1,0} multiply(%p0, %p0)
}

%fused_computation.3 (p0: bf16[8,16]) -> bf16[8,16] {
  %inner = bf16[8,16]{1,0} fusion(%p0), kind=kLoop, calls=%fused_computation.1
  ROOT %m = bf16[8,16]{1,0} multiply(%inner, %inner)
}

%scan_body.4 (p0: bf16[8,16]) -> bf16[8,16] {
  %fusion.13 = bf16[8,16]{1,0} fusion(%p0), kind=kLoop, calls=%fused_computation.2
  ROOT %t4 = bf16[8,16]{1,0} multiply(%fusion.13, %fusion.13)
}

ENTRY %main {
  %fusion.10 = (f32[2,4]{1,0}, bf16[2,8,8,4]{3,2,1,0}) fusion(%x), kind=kOutput, calls=%fused_computation.1
  %fusion.11 = bf16[8,16]{1,0} fusion(%y), kind=kLoop, calls=%fused_computation.2
  %fusion.12 = bf16[8,16]{1,0} fusion(%y), kind=kLoop, calls=%fused_computation.3
  %while.1 = bf16[8,16]{1,0} while(%y), condition=%cond.5, body=%scan_body.4
}
"""
        cl, in_loop = build_fusion_classifier(hlo)
        assert cl("fusion.10") == {"conv", "reduce"}
        assert cl("fusion.11") == set()          # pure elementwise
        assert "conv" in cl("fusion.12")         # recurses into nested call
        # while-body membership (denoise-scan x25 annotation)
        assert in_loop("fusion.13")
        assert not in_loop("fusion.10") and not in_loop("fusion.11")

    def test_collective_bytes_parser(self):
        """estimate_multichip's executed-collective accounting: while-body
        collectives count once per denoise step; sizes come from the
        output shapes."""
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.estimate_multichip import collective_bytes

        hlo = """\
%scan_body.1 (p0: bf16[8,16]) -> bf16[8,16] {
  %cp = bf16[8,16]{1,0} collective-permute(%p0), source_target_pairs={{0,1}}
  ROOT %r = bf16[8,16]{1,0} add(%cp, %cp)
}

ENTRY %main {
  %ag = f32[4,8]{1,0} all-gather(%x), dimensions={0}
  %while.1 = bf16[8,16]{1,0} while(%y), condition=%c.2, body=%scan_body.1
}
"""
        per_kind, counts = collective_bytes(hlo, steps_in_loop=25)
        assert per_kind["all-gather"] == 4 * 8 * 4          # f32, once
        assert per_kind["collective-permute"] == 8 * 16 * 2 * 25
        assert counts["collective-permute"] == 25 and counts["all-gather"] == 1
