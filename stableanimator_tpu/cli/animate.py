"""Inference CLI — the reference's `inference_basic.py` surface
(flags mirror inference_basic.py:81-213 / command_basic_infer.sh).

Checkpoints are numpy .npz dumps of the released torch/safetensors weights
(produced once by tools/dump_torch_checkpoint.py); see
--checkpoint_dir layout below. Missing checkpoints can be replaced with
random init via --allow_random_init for smoke runs.

Layout of --checkpoint_dir:
  unet.npz            StableAnimator unet.pth (or SVD unet + --init_id_adapter)
  vae.npz             SVD vae
  image_encoder.npz   SVD image_encoder (CLIP ViT-H)
  pose_net.npz        StableAnimator pose_net.pth
  face_encoder.npz    StableAnimator face_encoder.pth
  antelopev2/scrfd_10g_bnkps.onnx + glintr100.onnx   (face ID)
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="StableAnimator-TPU inference")
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="directory of converted .npz checkpoints (see module docstring)")
    p.add_argument("--reference_image", type=str, required=True)
    p.add_argument("--pose_control_folder", type=str, default=None,
                   help="folder of pre-rendered pose skeleton images (the "
                        "reference's two-script flow: run the skeleton "
                        "extraction CLI first)")
    p.add_argument("--driving_video_folder", type=str, default=None,
                   help="folder of RAW driving frames: DWPose skeleton "
                        "extraction runs inline (needs --dwpose_dir ONNX), "
                        "OVERLAPPED with the generate-graph compile — the "
                        "reference's skeleton_extraction.py + "
                        "inference_basic.py in one command, with the "
                        "extraction hidden behind the warmup")
    p.add_argument("--dwpose_dir", type=str, default=None,
                   help="dir with yolox_l.onnx + dw-ll_ucoco_384.onnx "
                        "(default: <checkpoint_dir>/DWPose)")
    p.add_argument("--max_persons", type=int, default=None,
                   help="per-frame person cap for inline DWPose extraction "
                        "(default 10; the reference keeps every box)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--tile_size", type=int, default=16)
    p.add_argument("--frames_overlap", type=int, default=4)
    p.add_argument("--noise_aug_strength", type=float, default=0.02)
    p.add_argument("--decode_chunk_size", type=int, default=4)
    p.add_argument("--max_tile_batch", type=int, default=0,
                   help="max temporal tiles per UNet call; 0 = auto "
                        "(all tiles batched for short videos, groups of 2 "
                        "once the video has more than 4 tiles — bounds HBM "
                        "for long videos, e.g. the reference's 15 s demo)")
    p.add_argument("--steps_per_dispatch", type=int, default=0,
                   help="max Euler steps per device dispatch; 0 = auto "
                        "(one program for short videos, 5-step segments "
                        "once the video has more than 4 tiles — bounds "
                        "single-execution device time and enables progress "
                        "reporting), -1 = force one program")
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion_bucket_id", type=int, default=127)
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--allow_random_init", action="store_true",
                   help="randomly initialise any missing checkpoint (smoke runs)")
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "micro"],
                   help="'micro' = depth-1 tiny model zoo (same topology, "
                        "one resnet/transformer layer per block) for "
                        "smoke-testing the full CLI contract without the "
                        "1.5B-param compile; pairs with --allow_random_init "
                        "(mirrors cli/train.py)")
    p.add_argument("--face_channel_order", type=str, default="reference",
                   choices=["reference", "standard"],
                   help="'reference' replicates the reference's channel-"
                        "swap quirk (cv2.imread BGR + RGB2BGR = RGB fed to "
                        "insightface, whose nets then see swapped channels; "
                        "inference_basic.py:517-519) — the released "
                        "checkpoints were trained against it. 'standard' "
                        "feeds the recogniser correctly-ordered RGB.")
    p.add_argument("--face_optimize_steps", type=int, default=0,
                   help="HJB face-optimization gradient steps per denoise "
                        "step (paper capability; 0 = off). Needs "
                        "antelopev2/glintr100.onnx in --checkpoint_dir.")
    p.add_argument("--face_opt_lr", type=float, default=0.1)
    p.add_argument("--face_opt_start_step", type=int, default=8,
                   help="first denoise step to apply face optimization "
                        "(the face must have formed enough to carry "
                        "identity)")
    p.add_argument("--init_id_adapter", action="store_true",
                   help="initialise id_to_k/id_to_v from SVD to_k/to_v when "
                        "loading a vanilla SVD unet (reference "
                        "inference_basic.py:372-377)")
    return p.parse_args()


def load_params(checkpoint_dir: str, models, allow_random_init: bool,
                init_id_adapter: bool, height: int, width: int):
    from stableanimator_tpu.convert import (
        convert_clip_vision,
        convert_face_encoder,
        convert_pose_net,
        convert_unet,
        convert_vae,
    )
    from stableanimator_tpu.convert.torch_to_jax import init_id_adapter_from_svd
    from stableanimator_tpu.pipeline import fast_init_params

    converters = {
        "unet": ("unet.npz", convert_unet),
        "vae": ("vae.npz", convert_vae),
        "clip": ("image_encoder.npz", convert_clip_vision),
        "pose_net": ("pose_net.npz", convert_pose_net),
        "face_encoder": ("face_encoder.npz", convert_face_encoder),
    }
    params = None
    out = {}
    for key, (fname, fn) in converters.items():
        path = os.path.join(checkpoint_dir, fname)
        if os.path.exists(path):
            converted = fn(dict(np.load(path)))
            if key == "unet" and init_id_adapter:
                converted = init_id_adapter_from_svd(converted)
            out[key] = converted["params"]
        elif allow_random_init:
            if params is None:
                # shape-only fill: eager init of the full model would issue
                # thousands of individually-compiled ops over the remote
                # TPU tunnel (minutes to hours); smoke runs only need
                # correctly-shaped params
                params = fast_init_params(models, height=height, width=width)
            print(f"WARNING: {path} missing — using random init for {key}")
            out[key] = params[key]
        else:
            raise FileNotFoundError(
                f"{path} not found (use tools/dump_torch_checkpoint.py, or "
                f"--allow_random_init for a smoke run)")
    return out


def main():
    args = parse_args()
    if bool(args.pose_control_folder) == bool(args.driving_video_folder):
        raise SystemExit("pass exactly one of --pose_control_folder "
                         "(pre-rendered skeletons) or --driving_video_folder "
                         "(raw frames; DWPose runs inline)")

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import build_models, generate
    from stableanimator_tpu.preproc.face import FaceModel
    from stableanimator_tpu.utils.image import (
        export_to_gif,
        export_to_mp4,
        frames_to_uint8,
        load_images_from_folder,
        pil_to_u8_array,
        poses_to_u8_array,
        save_frames_as_png,
    )
    from PIL import Image

    model_kwargs = dict(dtype=jnp.bfloat16)
    if args.model_scale == "micro":
        from stableanimator_tpu.core.config import micro_model_kwargs

        # converted .npz checkpoints are full-size; micro is for smoke runs
        model_kwargs.update(micro_model_kwargs())
        model_kwargs["dtype"] = None
    models = build_models(**model_kwargs)
    params = load_params(args.checkpoint_dir, models, args.allow_random_init,
                         args.init_id_adapter, args.height, args.width)
    # bf16 cast on the HOST (numpy): per-leaf device ops over the remote TPU
    # tunnel would cost a compile + RTT each (thousands of leaves); the cast
    # tree transfers to the device in one bulk device_put below
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else np.asarray(x), params)
    # the VAE must keep fp32 master weights (encode is an fp32 island)
    if os.path.exists(os.path.join(args.checkpoint_dir, "vae.npz")):
        from stableanimator_tpu.convert import convert_vae
        params["vae"] = convert_vae(
            dict(np.load(os.path.join(args.checkpoint_dir, "vae.npz"))))["params"]
    params = jax.device_put(params)

    ref_pil = Image.open(args.reference_image).convert("RGB")
    ref_pil_sized = ref_pil.resize((args.width, args.height))

    # frame COUNT from the directory listing alone — it fixes every compiled
    # shape, so the generate-graph warm can start before any pixel is read
    src_folder = args.pose_control_folder or args.driving_video_folder
    num_frames = len([f for f in os.listdir(src_folder) if f.endswith(".png")])
    if num_frames == 0:
        raise SystemExit(f"no .png frames in {src_folder}")
    print(f"{num_frames} frames at {args.width}x{args.height}")

    cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=num_frames,
        tile_size=args.tile_size, tile_overlap=args.frames_overlap,
        num_inference_steps=args.num_inference_steps,
        min_guidance_scale=args.guidance_scale,
        max_guidance_scale=args.guidance_scale,
        fps=args.fps, motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
        decode_chunk_size=args.decode_chunk_size,
        max_tile_batch="auto" if args.max_tile_batch == 0 else args.max_tile_batch,
        steps_per_dispatch=("auto" if args.steps_per_dispatch == 0 else
                            None if args.steps_per_dispatch < 0 else
                            args.steps_per_dispatch),
        # pixels convert to uint8 on device: 1/4 the device->host fetch
        output_uint8=True,
    )

    # Inline DWPose (driving mode) runs in a WORKER SUBPROCESS with its own
    # jax session: two host threads of ONE process issuing remote
    # compiles/executions deadlock the PJRT client (reproduced: both
    # futex-wait, zero CPU), so the overlap below is process-level —
    # ship the extraction request now, collect the result after the warm.
    pose_join = None
    if args.driving_video_folder:
        from stableanimator_tpu.preproc.pose_worker import PoseWorker

        dwpose_dir = args.dwpose_dir or os.path.join(args.checkpoint_dir,
                                                     "DWPose")
        det = os.path.join(dwpose_dir, "yolox_l.onnx")
        pse = os.path.join(dwpose_dir, "dw-ll_ucoco_384.onnx")
        if not (os.path.exists(det) and os.path.exists(pse)):
            raise SystemExit(f"--driving_video_folder needs yolox_l.onnx + "
                             f"dw-ll_ucoco_384.onnx in {dwpose_dir}")
        driving = np.stack([np.asarray(im) for im in load_images_from_folder(
            args.driving_video_folder, width=args.width, height=args.height)])
        worker = PoseWorker(det, pse, max_det=args.max_persons)
        pose_join = worker.extract_async(driving, np.asarray(ref_pil_sized),
                                         args.height, args.width)

    # face-ID embedding of the reference (reference inference_basic.py:516-535)
    id_dim = models.face_encoder.config.id_embeddings_dim  # 512 (ArcFace) at full scale
    det_path = os.path.join(args.checkpoint_dir, "antelopev2", "scrfd_10g_bnkps.onnx")
    rec_path = os.path.join(args.checkpoint_dir, "antelopev2", "glintr100.onnx")
    if os.path.exists(det_path) and os.path.exists(rec_path):
        face_model = FaceModel(det_path, rec_path)
        face_input = np.asarray(ref_pil)
        if args.face_channel_order == "reference":
            face_input = face_input[..., ::-1]
        emb = face_model.get_id_embedding(face_input)
        if emb is None:
            print("WARNING: no face detected in the reference image; "
                  "using a zero identity embedding")
            emb = np.zeros((id_dim,), np.float32)
        elif emb.shape[-1] != id_dim:  # micro scale + real ArcFace graph
            print(f"WARNING: identity embedding dim {emb.shape[-1]} != "
                  f"model id dim {id_dim}; truncating/padding (micro smoke)")
            emb = np.resize(emb.astype(np.float32), (id_dim,))
    else:
        print("WARNING: antelopev2 ONNX models missing; using zero identity "
              "embedding")
        emb = np.zeros((id_dim,), np.float32)

    # HJB face optimizer: built BEFORE the warm with placeholder face boxes
    # (the real boxes need the extracted poses); boxes/target are traced
    # pytree leaves, so the warm below pre-compiles the exact face-opt
    # programs and .with_boxes() later swaps the data without re-tracing.
    face_opt = None
    if args.face_optimize_steps > 0:
        if not os.path.exists(rec_path):
            print("WARNING: --face_optimize_steps needs "
                  "antelopev2/glintr100.onnx; face optimization disabled")
        elif not np.any(emb):
            print("WARNING: no reference identity embedding; face "
                  "optimization disabled")
        else:
            from stableanimator_tpu.pipeline.face_opt import (
                FaceOptConfig, make_face_optimizer)
            from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function

            focfg = FaceOptConfig(steps=args.face_optimize_steps,
                                  lr=args.face_opt_lr,
                                  start_step=args.face_opt_start_step)
            face_opt = make_face_optimizer(
                models, params, focfg, load_onnx_function(rec_path), emb,
                None, args.height // 8, args.width // 8,
                channel_order=args.face_channel_order,
                num_frames=num_frames)
            print(f"HJB face optimization: {focfg.steps} steps/denoise-step, "
                  f"lr={focfg.lr}, from denoise step {focfg.start_step}")

    # Warm the generate graphs on a background thread while the host loads
    # pose images / awaits the extraction worker: compilation runs on the
    # compile service, so inline DWPose extraction (~59 s at 450 frames)
    # hides entirely behind the multi-minute cold compile instead of
    # adding to it. The warm thread is the ONLY jax user in this process
    # during the overlap (face embedding above already finished; the pose
    # sources below are file IO / a pipe read) — two in-process jax
    # threads deadlock the remote PJRT client.
    import threading

    from stableanimator_tpu.pipeline import warm_generate

    clip_shape = (ref_pil.height, ref_pil.width)
    warm_info = {}

    def _warm():
        try:
            t = time.time()
            warm_info.update(warm_generate(models, params, cfg,
                                           clip_shape=clip_shape,
                                           face_opt=face_opt))
            warm_info["seconds"] = round(time.time() - t, 1)
        except Exception as e:  # surfaced after join; generate still runs
            warm_info["error"] = repr(e)

    warm_thread = threading.Thread(target=_warm, daemon=True)
    warm_thread.start()

    # pose pixels: pre-rendered folder (file IO), or the extraction
    # worker's result. uint8 to the device (generate converts on-chip,
    # 1/4 the transfer).
    t_pose = time.time()
    if args.pose_control_folder:
        pose_images = load_images_from_folder(args.pose_control_folder,
                                              width=args.width,
                                              height=args.height)
        pose_u8 = poses_to_u8_array(pose_images)
    else:
        pose_maps, ack = pose_join()  # blocks on the worker pipe, not jax
        worker.close()
        if ack and not ack.get("aligned", True):
            print("WARNING: no 18-joint bodies detected; skeletons rendered "
                  "without reference alignment")
        # Channel-reverse to match the checkpoint data contract: the
        # two-script flow stores renders via write_image_bgr_convention
        # (channel-swapped on disk) and loads them back as RGB, so the
        # trained conditioning distribution sees the REVERSED render.
        pose_u8 = np.ascontiguousarray(
            np.transpose(pose_maps, (0, 2, 3, 1))[..., ::-1]).astype(np.uint8)
        print(f"DWPose extraction (worker subprocess): "
              f"{pose_u8.shape[0]} frames ready after "
              f"{time.time() - t_pose:.1f}s of overlap")

    if warm_thread is not None:
        warm_thread.join()
        if "error" in warm_info:
            print(f"WARNING: graph warm failed ({warm_info['error']}); "
                  f"generate will compile inline")
        else:
            print(f"graph warm: {warm_info.get('path')} path, "
                  f"{warm_info.get('programs')} program(s) in "
                  f"{warm_info.get('seconds')}s (overlapped with "
                  f"preprocessing)")

    if face_opt is not None:
        # real per-frame face boxes from the (now available) pose renders;
        # boxes are traced leaves, so the warmed programs still hit
        from stableanimator_tpu.pipeline.face_opt import (
            face_boxes_from_pose_renders)
        face_opt = face_opt.with_boxes(face_boxes_from_pose_renders(
            pose_u8.astype(np.float32) / 127.5 - 1.0,  # == poses_to_array
            args.height // 8, args.width // 8, face_opt.cfg.latent_crop))

    t0 = time.time()
    frames = generate(
        models, params,
        jnp.asarray(pil_to_u8_array(ref_pil_sized)),
        jnp.asarray(pose_u8),
        jnp.asarray(emb[None].astype(np.float32)),
        cfg, rng=jax.random.PRNGKey(args.seed),
        face_opt=face_opt,
        # CLIP conditions on the original-resolution image (reference
        # inference_pipeline_animation.py:520)
        clip_image=jnp.asarray(pil_to_u8_array(ref_pil)),
        progress=lambda done, total: print(
            f"  denoise step {done}/{total} dispatched", flush=True))
    frames = jax.block_until_ready(frames)
    print(f"generated {num_frames} frames in {time.time() - t0:.1f}s")

    os.makedirs(args.output_dir, exist_ok=True)
    u8 = frames_to_uint8(np.asarray(frames))
    export_to_gif(u8, os.path.join(args.output_dir, "animation_video.gif"))
    # the reference names its artifact animation_video.mp4
    # (inference_basic.py:560-562) — write a real mp4, at the 8 fps its
    # export call uses
    export_to_mp4(u8, os.path.join(args.output_dir, "animation_video.mp4"),
                  fps=8)
    save_frames_as_png(u8, os.path.join(args.output_dir, "animated_images"))
    print(f"wrote {args.output_dir}/animation_video.{{gif,mp4}}")


if __name__ == "__main__":
    main()
