#!/usr/bin/env python
"""North-star end-to-end benchmark: pose extraction through VAE decode to an
mp4, one command, on the real chip (BASELINE.json: 576x1024 x 16f x 25-step
< 60 s; VERDICT round-2 item #3).

Pipeline measured (the reference's full offline+online path):
  1. DWPose skeleton extraction, batched clip path (YOLOX det + RTMPose per
     frame -> one XLA call per network; reference loops serially,
     DWPose/dwpose_utils/onnxpose.py:353-359) + reference-shape alignment +
     native-raster render    -> poses/s
  2. ArcFace identity embedding of the reference image (SCRFD det +
     glintr100; reference inference_basic.py:516-535)
  3. 25-step tiled CFG denoise + chunked temporal-VAE decode (one jitted
     program)
  4. mp4 export (reference inference_basic.py:56-64)

With --dwpose_dir / --checkpoint_dir pointing at real ONNX / .npz weights it
benches the real graphs; missing pieces fall back to torch-exported
stand-ins (pose nets; same interface, smaller conv stacks — reported in the
JSON so the number is never silently mislabelled) / zero face embedding /
random diffusion weights.

Prints ONE JSON line:
  {"metric": "e2e_seconds_per_video", "value": ..., "detail": {...}}

  python tools/bench_e2e.py                      # 512^2 x 16f
  python tools/bench_e2e.py --height 576 --width 1024   # pro config
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--tile_size", type=int, default=16)
    ap.add_argument("--tile_overlap", type=int, default=4)
    ap.add_argument("--decode_chunk_size", type=int, default=4)
    ap.add_argument("--dwpose_dir", type=str, default="checkpoints/DWPose",
                    help="dir with yolox_l.onnx + dw-ll_ucoco_384.onnx "
                         "(stand-ins if missing)")
    ap.add_argument("--checkpoint_dir", type=str, default="checkpoints",
                    help="dir with converted .npz model weights + "
                         "antelopev2/ (random init / zero face if missing)")
    ap.add_argument("--runs", type=int, default=2,
                    help="timed e2e repetitions after the compile run")
    ap.add_argument("--max_tile_batch", type=str, default="auto",
                    help="tiles per grouped-denoise UNet call for >4-tile "
                         "videos: 'auto' or an int (A/B knob)")
    ap.add_argument("--model_scale", type=str, default="full",
                    choices=["full", "micro"],
                    help="'micro' = tiny model zoo: exercises the identical "
                         "bench code paths (warm overlap, pipelining, "
                         "phases) on CPU in seconds — for tests, not "
                         "numbers")
    ap.add_argument("--cpu", action="store_true",
                    help="force the XLA:CPU backend (sitecustomize pins the "
                         "axon TPU plugin; the env var alone cannot switch)")
    ap.add_argument("--pipelined", type=int, default=0,
                    help="additionally measure N videos processed as a "
                         "pipeline: pose extraction of video i+1 runs on a "
                         "thread under the denoise of video i (the "
                         "production-queue pattern — pose extraction leaves "
                         "the per-video critical path)")
    return ap.parse_args()


def _log(msg):
    print(f"[bench_e2e] {msg}", file=sys.stderr, flush=True)


def _pose_models(args, td):
    """Real DWPose ONNX if present, else torch stand-ins (shared with
    tools/bench_preproc.py)."""
    det = os.path.join(args.dwpose_dir, "yolox_l.onnx")
    pose = os.path.join(args.dwpose_dir, "dw-ll_ucoco_384.onnx")
    if os.path.exists(det) and os.path.exists(pose):
        return det, pose, True
    from tools.bench_preproc import _standin_paths

    det, pose = _standin_paths(td)
    return det, pose, False


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import build_models, generate
    from stableanimator_tpu.utils.image import export_to_mp4, frames_to_uint8

    detail = {"height": args.height, "width": args.width,
              "frames": args.frames, "steps": args.steps,
              "max_tile_batch": args.max_tile_batch,
              "device": str(jax.devices()[0])}

    rng = np.random.default_rng(0)
    td = tempfile.mkdtemp(prefix="bench_e2e_")

    det_path, pose_path, real_dwpose = _pose_models(args, td)
    # inputs: a synthetic driving clip + reference image (pixel content does
    # not change the compute graph shape, which is what the bench measures).
    # With stand-in pose networks the frames are ZEROS: random noise makes
    # the stand-in detector hallucinate ~100 boxes/frame (1600 pose crops —
    # pathological); zeros yield no detections, so every frame takes the
    # single full-image fallback crop, matching the one-person-per-frame
    # workload the real networks see.
    if real_dwpose:
        driving = [rng.integers(0, 255, (args.height, args.width, 3),
                                dtype=np.uint8) for _ in range(args.frames)]
        reference = rng.integers(0, 255, (args.height, args.width, 3),
                                 dtype=np.uint8)
    else:
        driving = [np.zeros((args.height, args.width, 3), np.uint8)
                   for _ in range(args.frames)]
        reference = np.zeros((args.height, args.width, 3), np.uint8)
    detail["real_dwpose_weights"] = real_dwpose
    # Pose extraction lives in a WORKER SUBPROCESS with its own jax
    # session: a second in-process jax thread deadlocks the remote PJRT
    # client (preproc/pose_worker.py docstring), and the worker's session
    # init overlaps the param fill below for free. Stand-ins use a smaller
    # letterbox (batched compile speed; the RTMPose crop size stays at the
    # real 256x192 — the stand-in ONNX was exported at that shape).
    from stableanimator_tpu.preproc.pose_worker import PoseWorker

    worker = PoseWorker(det_path, pose_path,
                        letterbox=None if real_dwpose else (320, 320),
                        platform="cpu" if args.cpu else None)

    # diffusion weights: converted .npz if present, else on-device random fill
    if args.model_scale == "micro":
        from stableanimator_tpu.core.config import micro_model_kwargs

        models = build_models(**micro_model_kwargs())
    else:
        models = build_models(dtype=jnp.bfloat16)
    have_ckpts = os.path.exists(os.path.join(args.checkpoint_dir, "unet.npz"))
    detail["real_diffusion_weights"] = have_ckpts
    t0 = time.time()
    if have_ckpts:
        from stableanimator_tpu.cli.animate import load_params

        params = load_params(args.checkpoint_dir, models, False, False,
                             args.height, args.width)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), params)
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "sa_bench", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        # import for _device_params only; keep its signal handlers inert
        bench.__name__ = "sa_bench"
        spec.loader.exec_module(bench)
        # transient RESOURCE_EXHAUSTED happens here when a previous
        # process's remote session still holds HBM (observed r3d6: the
        # param-fill checksum OOMed before any model code ran); one
        # delayed retry rides out the worker-side session GC
        try:
            params = bench._device_params(models, args.height, args.width)
        except Exception as e:  # pragma: no cover - remote-TPU transient
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            _log("param fill hit RESOURCE_EXHAUSTED; retrying in 120s")
            time.sleep(120)
            params = bench._device_params(models, args.height, args.width)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    detail["param_load_s"] = round(time.time() - t0, 1)
    _log(f"params ready in {detail['param_load_s']}s")

    # face embedding setup (real antelopev2 if present)
    det_onnx = os.path.join(args.checkpoint_dir, "antelopev2",
                            "scrfd_10g_bnkps.onnx")
    rec_onnx = os.path.join(args.checkpoint_dir, "antelopev2",
                            "glintr100.onnx")
    face_model = None
    if os.path.exists(det_onnx) and os.path.exists(rec_onnx):
        from stableanimator_tpu.preproc.face import FaceModel

        face_model = FaceModel(det_onnx, rec_onnx)
    detail["real_face_weights"] = face_model is not None

    cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=args.frames,
        tile_size=args.tile_size, tile_overlap=args.tile_overlap,
        num_inference_steps=args.steps,
        decode_chunk_size=args.decode_chunk_size,
        max_tile_batch=(args.max_tile_batch if args.max_tile_batch == "auto"
                        else int(args.max_tile_batch)),
        # uint8 pixels out of the decode program: 1/4 the fetch bytes (the
        # CLI/server production setting; a 450f 512^2 fetch is 354 MB vs
        # 1.4 GB fp32 through the tunnel)
        output_uint8=True)

    def extract_poses_async(tag="clip"):
        """Ship ref+video extraction to the worker; returns join() ->
        ([F,H,W,3] uint8, seconds-since-dispatch)."""
        t = time.time()
        ref_pose = {"v": None}

        join_clip = worker.extract_async(np.stack(driving), reference,
                                         args.height, args.width, tag=tag)

        def join():
            pose_maps, ack = join_clip()
            if ack and not ack.get("aligned", True):
                detail["alignment_skipped_no_bodies"] = True
            rp = worker.image_pose(reference, tag=f"{tag}_ref")
            # uint8 across the boundary; generate converts on device
            # (50MB -> 12.5MB of tunnel traffic at 512^2 x 16f)
            pose_arr = np.concatenate(
                [rp[None], pose_maps])[:args.frames].astype(np.uint8)
            # channel-reverse: match the checkpoint data contract (renders
            # are stored channel-swapped by write_image_bgr_convention and
            # loaded back as RGB — see cli/animate.py driving branch)
            return (np.ascontiguousarray(
                np.transpose(pose_arr, (0, 2, 3, 1))[..., ::-1]),
                time.time() - t)

        return join

    def extract_poses(tag="clip"):
        return extract_poses_async(tag)()

    id_dim = models.face_encoder.config.id_embeddings_dim

    def embed_face():
        t = time.time()
        if face_model is not None:
            e = face_model.get_id_embedding(reference[..., ::-1])
            e = np.zeros((id_dim,), np.float32) if e is None else e
            e = np.resize(e.astype(np.float32), (id_dim,))
        else:
            e = np.zeros((id_dim,), np.float32)
        return e, time.time() - t

    def run_generate(seed, pose_arr):
        t = time.time()
        out = generate(
            models, params,
            jnp.asarray(reference[None].astype(np.uint8)),
            jnp.asarray(pose_arr), jnp.asarray(emb[None]),
            cfg, rng=jax.random.PRNGKey(seed))
        # pure transfer = the only true sync on the remote platform
        frames_np = np.asarray(out)
        gen_s = time.time() - t

        t = time.time()
        u8 = frames_to_uint8(frames_np)
        export_to_mp4(u8, os.path.join(td, "animation_video.mp4"), fps=8)
        return gen_s, time.time() - t

    def one_pass(seed):
        """Full serial pipeline; returns (pose_s, face_s, gen_s, export_s)."""
        pose_arr, pose_s = extract_poses()
        _, face_s = embed_face()
        gen_s, export_s = run_generate(seed, pose_arr)
        return pose_s, face_s, gen_s, export_s

    # ---- compile pass: generate-graph warm OVERLAPPED with the pose
    # extraction. The extraction runs in the worker SUBPROCESS (its own
    # jax session — preproc/pose_worker.py explains why a thread deadlocks
    # the remote client), so the main process warms the generate graphs
    # at the same time; at 450f this hides ~59 s of DWPose behind the
    # multi-minute cold compile. ------------------------------------------
    from stableanimator_tpu.pipeline import warm_generate

    _log("compile pass (graph warm overlapped with worker pose extraction)")
    t0 = time.time()
    warm_info = {}
    pose_join = extract_poses_async("warmup")
    try:
        t = time.time()
        warm_info.update(warm_generate(models, params, cfg))
        warm_info["seconds"] = round(time.time() - t, 1)
    except Exception as e:
        warm_info["error"] = repr(e)
    warm_done_at = time.time() - t0
    _, warm_pose_s = pose_join()
    emb, _ = embed_face()
    detail["warm"] = dict(warm_info)
    detail["warm"]["pose_extraction_s"] = round(warm_pose_s, 2)
    detail["warm"]["pose_hidden_behind_warm"] = warm_pose_s <= warm_done_at
    detail["compile_pass_s"] = round(time.time() - t0, 1)
    _log(f"compile pass done in {detail['compile_pass_s']}s "
         f"(pose ready at {warm_pose_s:.1f}s, warm at {warm_done_at:.1f}s; "
         f"warm {warm_info})")

    runs = []
    for i in range(args.runs):
        runs.append(one_pass(1 + i))
        _log(f"run {i}: pose {runs[-1][0]:.2f}s face {runs[-1][1]:.2f}s "
             f"generate {runs[-1][2]:.2f}s export {runs[-1][3]:.2f}s")
    best = min(runs, key=sum)
    pose_s, face_s, gen_s, export_s = best
    e2e = sum(best)

    detail.update({
        "pose_extraction_s": round(pose_s, 2),
        "poses_per_sec": round((args.frames + 1) / pose_s, 1),
        "face_embed_s": round(face_s, 2),
        "generate_plus_decode_s": round(gen_s, 2),
        "generate_frames_per_sec": round(args.frames / gen_s, 3),
        "mp4_export_s": round(export_s, 2),
        "all_runs_s": [round(sum(r), 2) for r in runs],
        "north_star_under_60s": e2e < 60.0,
    })

    if args.pipelined > 0:
        # production-queue pattern: pose extraction of video i+1 runs in
        # the worker subprocess under video i's denoise; steady-state
        # per-video cost -> max(generate, pose) instead of generate + pose.
        n = args.pipelined
        _log(f"pipelined mode: {n} videos, pose(i+1) under generate(i)")
        pose_cur, fill_s = extract_poses("pipe0")
        t0 = time.time()
        vids = []
        for i in range(n):
            join = (extract_poses_async(f"pipe{i + 1}")
                    if i + 1 < n else None)
            g_s, x_s = run_generate(100 + i, pose_cur)
            overlap_s = 0.0
            if join is not None:
                pose_cur, overlap_s = join()
            vids.append(round(g_s + x_s, 2))
            _log(f"pipelined video {i}: generate+export {vids[-1]}s "
                 f"(pose(i+1) ready {overlap_s:.1f}s after dispatch)")
        wall = time.time() - t0
        detail["pipelined"] = {
            "videos": n,
            "pipeline_fill_pose_s": round(fill_s, 2),
            "seconds_per_video_steady": round(wall / n, 2),
            "per_video_generate_export_s": vids,
            "serial_equivalent_s": round(sum(vids) / n + pose_s, 2),
        }
    worker.close()
    print(json.dumps({
        "metric": f"e2e_seconds_per_video_{args.width}x{args.height}x"
                  f"{args.frames}f_{args.steps}step",
        "value": round(e2e, 2),
        "unit": "seconds",
        "detail": detail,
    }), flush=True)


if __name__ == "__main__":
    main()
