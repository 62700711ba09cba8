"""HTTP inference server — the production serving surface.

The reference ships only a batch CLI (inference_basic.py); a deployed
animation service needs a long-lived process that keeps the compiled
pipeline and the weights warm on the chip and answers requests. This is
that process, stdlib-only (http.server), one chip per process:

  python -m stableanimator_tpu.cli.serve --checkpoint_dir ckpts \
      --height 512 --width 512 --port 8000 [--allow_random_init] [--warm]

Endpoints:
  GET  /healthz   -> {"ok": true, "device": ..., "requests_served": N}
  POST /animate   -> animation bytes. JSON body:
      {
        "reference": "<base64 PNG/JPEG>",
        "poses": ["<base64 PNG>", ...],          # one per frame
        "format": "mp4" | "gif" | "json",        # default mp4
        "seed": int,                             # free per-request knob
        # compile-affecting overrides (each new combination costs a full
        # graph compile, minutes on the remote service — gated, see below):
        "height": int, "width": int, "num_inference_steps": int,
        "tile_size": int, "frames_overlap": int, "decode_chunk_size": int,
        "guidance_scale": float,  # static in the jitted config -> recompiles
        "max_tile_batch": int   # 0 = auto (groups of 2 for long videos)
      }
    Responds video/mp4 or image/gif bytes; "json" returns
    {"mp4": "<base64>", "seconds": t}. Errors are JSON with HTTP 4xx/5xx.

Hardening (a compile on this platform takes minutes and runs under the
chip lock, so unknown shapes are an accidental DoS):
  * request bodies above --max_request_mb are rejected 413 before the
    body is read;
  * height/width must come from the --shape_buckets allowlist (default:
    the server's own config) — anything else is 400, never a compile;
  * the other compile-affecting overrides (steps/tile/overlap/decode
    chunk/guidance/max_tile_batch) are rejected 400 unless
    --allow_shape_overrides is set; seed/format stay free (no recompile);
  * frame count is capped by --max_frames (413 above it).

Generation is serialised with a lock (one TPU chip per server process);
scale horizontally with one process per chip behind any HTTP balancer.
Model/params load once at startup, exactly like cli/animate.py.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="StableAnimator-TPU server")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--tile_size", type=int, default=16)
    p.add_argument("--frames_overlap", type=int, default=4)
    p.add_argument("--decode_chunk_size", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--allow_random_init", action="store_true")
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "micro"])
    p.add_argument("--init_id_adapter", action="store_true")
    p.add_argument("--warm", action="store_true",
                   help="compile + run one generation at the default config "
                        "before accepting traffic (first-request latency "
                        "becomes steady-state latency)")
    p.add_argument("--max_request_mb", type=int, default=256,
                   help="reject request bodies larger than this (HTTP 413) "
                        "before reading them")
    p.add_argument("--max_frames", type=int, default=900,
                   help="reject requests with more pose frames than this "
                        "(HTTP 413); 900 = 2x the reference's 15s demo")
    p.add_argument("--shape_buckets", type=str, default=None,
                   help="comma-separated HxW allowlist for per-request "
                        "height/width (e.g. '512x512,576x1024'); default = "
                        "the server's own --height x --width only. Requests "
                        "outside the list get HTTP 400, never a compile.")
    p.add_argument("--allow_shape_overrides", action="store_true",
                   help="allow per-request overrides of the other "
                        "compile-affecting knobs (steps/tile/overlap/decode "
                        "chunk/guidance/max_tile_batch); off by default "
                        "because every new combination compiles a new graph "
                        "under the chip lock")
    return p.parse_args(argv)


#: request keys that change the static jitted config (a new graph each).
_COMPILE_KEYS = ("num_inference_steps", "tile_size", "frames_overlap",
                 "decode_chunk_size", "guidance_scale", "max_tile_batch")


def _parse_buckets(args):
    """-> set of allowed (h, w) pairs from --shape_buckets/--height/--width."""
    buckets = {(args.height, args.width)}
    if args.shape_buckets:
        for tok in args.shape_buckets.split(","):
            h, w = tok.strip().lower().split("x")
            buckets.add((int(h), int(w)))
    return buckets


class RequestRejected(ValueError):
    """Client error carrying its HTTP status (400/413)."""

    def __init__(self, status, msg):
        super().__init__(msg)
        self.status = status


class AnimationService:
    """Owns the models/params and serialises chip access."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

        from stableanimator_tpu.cli.animate import load_params
        from stableanimator_tpu.pipeline import build_models
        from stableanimator_tpu.preproc.face import FaceModel

        self.args = args
        self.jax, self.jnp = jax, jnp
        model_kwargs = dict(dtype=jnp.bfloat16)
        if args.model_scale == "micro":
            from stableanimator_tpu.core.config import micro_model_kwargs

            model_kwargs.update(micro_model_kwargs())
            model_kwargs["dtype"] = None
        self.models = build_models(**model_kwargs)
        params = load_params(args.checkpoint_dir, self.models,
                             args.allow_random_init, args.init_id_adapter,
                             args.height, args.width)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), params)
        vae_path = os.path.join(args.checkpoint_dir, "vae.npz")
        if os.path.exists(vae_path):  # fp32 island (see cli/animate.py)
            from stableanimator_tpu.convert import convert_vae

            params["vae"] = convert_vae(dict(np.load(vae_path)))["params"]
        self.params = jax.device_put(params)

        det = os.path.join(args.checkpoint_dir, "antelopev2",
                           "scrfd_10g_bnkps.onnx")
        rec = os.path.join(args.checkpoint_dir, "antelopev2", "glintr100.onnx")
        self.face_model = (FaceModel(det, rec)
                           if os.path.exists(det) and os.path.exists(rec)
                           else None)
        self.id_dim = self.models.face_encoder.config.id_embeddings_dim
        self.lock = threading.Lock()
        self.requests_served = 0
        self.device = str(jax.devices()[0])
        self.shape_buckets = _parse_buckets(args)

    # -- request handling ---------------------------------------------------

    def _decode_image(self, b64: str, size=None):
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if size is not None:
            img = img.resize(size)
        return img

    def animate(self, req: dict) -> dict:
        from PIL import Image

        from stableanimator_tpu.core.config import PipelineConfig
        from stableanimator_tpu.pipeline import generate
        from stableanimator_tpu.utils.image import (
            export_to_gif,
            export_to_mp4,
            frames_to_uint8,
            pil_to_u8_array,
        )

        a = self.args
        h = int(req.get("height", a.height))
        w = int(req.get("width", a.width))
        poses_b64 = req.get("poses") or []
        if not req.get("reference") or not poses_b64:
            raise ValueError("body needs 'reference' and non-empty 'poses'")
        if h % 64 or w % 64:
            raise ValueError("height/width must be multiples of 64")
        if (h, w) not in self.shape_buckets:
            raise RequestRejected(
                400, f"shape {h}x{w} not in the server's allowlist "
                     f"{sorted(self.shape_buckets)}; start the server with "
                     f"--shape_buckets to pre-approve (and --warm to "
                     f"pre-compile) more buckets")
        if len(poses_b64) > a.max_frames:
            raise RequestRejected(
                413, f"{len(poses_b64)} frames exceeds --max_frames="
                     f"{a.max_frames}")
        if not a.allow_shape_overrides:
            blocked = [k for k in _COMPILE_KEYS if k in req]
            if blocked:
                raise RequestRejected(
                    400, f"override of {blocked} is disabled (each new value "
                         f"compiles a new graph under the chip lock); start "
                         f"the server with --allow_shape_overrides to permit")

        ref = self._decode_image(req["reference"])
        ref_sized = ref.resize((w, h))
        poses = [self._decode_image(b, size=(w, h)) for b in poses_b64]
        pose_u8 = np.stack([np.asarray(p, np.uint8) for p in poses])

        if self.face_model is not None:
            emb = self.face_model.get_id_embedding(
                np.asarray(ref)[..., ::-1])  # reference channel-order quirk
            if emb is None:
                emb = np.zeros((self.id_dim,), np.float32)
            emb = np.resize(emb.astype(np.float32), (self.id_dim,))
        else:
            emb = np.zeros((self.id_dim,), np.float32)

        f = len(poses)
        tile = min(int(req.get("tile_size", a.tile_size)), f)
        g = float(req.get("guidance_scale", a.guidance_scale))
        cfg = PipelineConfig(
            height=h, width=w, num_frames=f, tile_size=tile,
            tile_overlap=min(int(req.get("frames_overlap", a.frames_overlap)),
                             max(tile - 1, 1)),
            num_inference_steps=int(req.get("num_inference_steps",
                                            a.num_inference_steps)),
            min_guidance_scale=g, max_guidance_scale=g,
            decode_chunk_size=int(req.get("decode_chunk_size",
                                          a.decode_chunk_size)),
            max_tile_batch=("auto" if int(req.get("max_tile_batch", 0)) == 0
                            else int(req["max_tile_batch"])),
            # pixels convert to uint8 on device: 1/4 the device->host fetch
            output_uint8=True,
        )
        seed = int(req.get("seed", 23123134))

        t0 = time.time()
        with self.lock:  # one generation at a time on the chip
            frames = generate(
                self.models, self.params,
                self.jnp.asarray(pil_to_u8_array(ref_sized)),
                self.jnp.asarray(pose_u8),
                self.jnp.asarray(emb[None]),
                cfg, rng=self.jax.random.PRNGKey(seed),
                clip_image=self.jnp.asarray(pil_to_u8_array(ref)))
            u8 = frames_to_uint8(np.asarray(frames))
        seconds = time.time() - t0
        self.requests_served += 1

        fmt = req.get("format", "mp4")
        buf = io.BytesIO()
        if fmt == "gif":
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".gif") as tmp:
                export_to_gif(u8, tmp.name)
                buf.write(open(tmp.name, "rb").read())
            return {"content_type": "image/gif", "body": buf.getvalue(),
                    "seconds": seconds}
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
            export_to_mp4(u8, tmp.name, fps=a.fps)
            buf.write(open(tmp.name, "rb").read())
        if fmt == "json":
            return {"content_type": "application/json",
                    "body": json.dumps(
                        {"mp4": base64.b64encode(buf.getvalue()).decode(),
                         "seconds": round(seconds, 3),
                         "frames": f}).encode(),
                    "seconds": seconds}
        return {"content_type": "video/mp4", "body": buf.getvalue(),
                "seconds": seconds}

    def warm(self):
        """Pay every allowlisted bucket's compile before accepting traffic."""
        from PIL import Image

        a = self.args
        for h, w in sorted(self.shape_buckets):
            blank = Image.new("RGB", (w, h), (127, 127, 127))
            b64 = _pil_b64(blank)
            self.animate({"reference": b64,
                          "poses": [b64] * a.tile_size,
                          "height": h, "width": w,
                          "format": "json"})
            self.requests_served -= 1  # warmup is not traffic


def _pil_b64(img):
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(service: AnimationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet: one line per request below
            pass

        def _send(self, code, content_type, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, "application/json", json.dumps({
                    "ok": True, "device": service.device,
                    "requests_served": service.requests_served}).encode())
            else:
                self._send(404, "application/json", b'{"error":"not found"}')

        def do_POST(self):
            if self.path != "/animate":
                self._send(404, "application/json", b'{"error":"not found"}')
                return
            try:
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    n = -1
                if n < 0:
                    raise RequestRejected(400, "missing/invalid "
                                               "Content-Length")
                limit = service.args.max_request_mb * 1024 * 1024
                if n > limit:  # reject BEFORE reading the body
                    raise RequestRejected(
                        413, f"request body {n} bytes exceeds "
                             f"--max_request_mb={service.args.max_request_mb}")
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.animate(req)
                print(f"[serve] /animate {len(req.get('poses') or [])}f "
                      f"in {out['seconds']:.1f}s", flush=True)
                self._send(200, out["content_type"], out["body"])
            except RequestRejected as e:
                self._send(e.status, "application/json",
                           json.dumps({"error": str(e)}).encode())
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, "application/json",
                           json.dumps({"error": str(e)}).encode())
            except Exception as e:  # surface, never crash the server
                self._send(500, "application/json",
                           json.dumps({"error": f"{type(e).__name__}: "
                                                f"{e}"}).encode())

    return Handler


def main(argv=None):
    args = parse_args(argv)
    service = AnimationService(args)
    if args.warm:
        print("[serve] warming the default-config graph ...", flush=True)
        t0 = time.time()
        service.warm()
        print(f"[serve] warm in {time.time() - t0:.1f}s", flush=True)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(device {service.device})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
