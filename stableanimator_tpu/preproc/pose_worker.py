"""Pose-extraction worker subprocess.

Why a subprocess and not a thread: on remote-attached TPU platforms the
PJRT client is not safe against two host threads issuing compiles/
executions concurrently — a thread running DWPose (ONNX graphs on the
chip) alongside a thread compiling the generate program deadlocks the
client (both futex-wait, zero CPU; reproduced on the axon tunnel,
round 4). A worker process owns its own jax client/session, so skeleton
extraction genuinely overlaps the main process's param loading and graph
compiles — the production-queue pattern (pose(i+1) under generate(i))
and the cold-start overlap both ride on this.

Protocol (line-delimited JSON over stdin/stdout):
  -> {"op": "init", "det": path, "pose": path, "letterbox": [w, h] | null}
  <- {"ok": true}
  -> {"op": "extract", "frames_npy": in_path, "reference_npy": ref_path,
      "out_npy": out_path, "height": H, "width": W}
  <- {"ok": true, "seconds": t, "frames": F, "aligned": bool}
  -> {"op": "image_pose", "reference_npy": ref, "out_npy": out}
  <- {"ok": true, "seconds": t}
  -> {"op": "exit"}

Arrays cross the boundary as .npy files (tmpfs — cheap), keeping the pipe
protocol trivial. Any error is reported as {"ok": false, "error": ...} on
the request that caused it; the worker keeps serving.
"""

from __future__ import annotations

import json
import sys
import time


def serve(stdin=None, stdout=None):  # pragma: no cover - exercised via CLI
    import os

    import numpy as np

    # sitecustomize force-registers the axon TPU plugin and wins over the
    # env var alone; honour JAX_PLATFORMS explicitly so test/CPU parents
    # (which export it) get a CPU worker
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.split(",")[0])

    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    wb = None

    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            op = req["op"]
            if op == "exit":
                print(json.dumps({"ok": True}), file=stdout, flush=True)
                return
            if op == "init":
                from stableanimator_tpu.preproc.wholebody import (
                    WholebodyDetector)

                wb = WholebodyDetector(req["det"], req["pose"],
                                       max_det=req.get("max_det"))
                if req.get("letterbox"):
                    wb.detector.input_size = tuple(req["letterbox"])
                print(json.dumps({"ok": True}), file=stdout, flush=True)
                continue
            if wb is None:
                raise RuntimeError("send init first")
            t0 = time.time()
            if op == "image_pose":
                from stableanimator_tpu.preproc.skeleton_extraction import (
                    get_image_pose)

                ref = np.load(req["reference_npy"])
                np.save(req["out_npy"], get_image_pose(wb, ref))
                print(json.dumps({"ok": True,
                                  "seconds": round(time.time() - t0, 2)}),
                      file=stdout, flush=True)
                continue
            if op == "extract":
                from stableanimator_tpu.preproc.skeleton_extraction import (
                    get_video_pose)

                frames = np.load(req["frames_npy"])
                ref = np.load(req["reference_npy"])
                aligned = True
                try:
                    maps = get_video_pose(wb, list(frames), ref)
                except ValueError:
                    # no 18-joint bodies to fit the alignment on (stand-in
                    # detectors / synthetic frames): render unaligned
                    from stableanimator_tpu.preproc.skeleton_render import (
                        draw_pose)

                    aligned = False
                    detected = wb.video_poses(list(frames))
                    maps = np.stack([
                        draw_pose(p, req["height"], req["width"])
                        for p in detected])
                np.save(req["out_npy"], maps)
                print(json.dumps({"ok": True, "frames": int(maps.shape[0]),
                                  "aligned": aligned,
                                  "seconds": round(time.time() - t0, 2)}),
                      file=stdout, flush=True)
                continue
            raise ValueError(f"unknown op {op!r}")
        except Exception as e:  # report, keep serving
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}),
                  file=stdout, flush=True)


class PoseWorker:
    """Client handle: spawns the worker, ships requests, blocks on acks.

    start() returns immediately; the worker's jax session init (minutes on
    remote tunnels) overlaps the caller's own startup. Every call raises
    RuntimeError on a worker-reported error."""

    def __init__(self, det_path: str, pose_path: str, letterbox=None,
                 workdir: str | None = None, platform: str | None = None,
                 max_det: int | None = None):
        import os
        import subprocess
        import tempfile

        self._dir = workdir or tempfile.mkdtemp(prefix="pose_worker_")
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env = dict(os.environ)
        env.setdefault("PYTHONPATH", root)
        if platform:  # e.g. "cpu" for bench --cpu runs
            env["JAX_PLATFORMS"] = platform
        self._proc = subprocess.Popen(
            [sys.executable, "-u", "-m",
             "stableanimator_tpu.preproc.pose_worker"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            env=env, cwd=root)
        self._send({"op": "init", "det": det_path, "pose": pose_path,
                    "letterbox": list(letterbox) if letterbox else None,
                    "max_det": max_det})
        self._pending = 1  # init ack outstanding

    def _send(self, req):
        self._proc.stdin.write(json.dumps(req) + "\n")
        self._proc.stdin.flush()

    def _recv(self):
        line = self._proc.stdout.readline()
        if not line:
            raise RuntimeError("pose worker died "
                               f"(rc={self._proc.poll()})")
        rec = json.loads(line)
        if not rec.get("ok"):
            raise RuntimeError(f"pose worker: {rec.get('error')}")
        self.last_ack = rec
        return rec

    def _drain(self):
        while self._pending:
            self._recv()
            self._pending -= 1

    def extract_async(self, frames, reference, height, width, tag="clip"):
        """Ship an extraction request; returns a join() callable producing
        (pose_maps [F,3,H,W] uint8, worker_seconds)."""
        import os

        import numpy as np

        self._drain()
        fp = os.path.join(self._dir, f"{tag}_frames.npy")
        rp = os.path.join(self._dir, f"{tag}_ref.npy")
        op = os.path.join(self._dir, f"{tag}_poses.npy")
        np.save(fp, np.asarray(frames))
        np.save(rp, np.asarray(reference))
        self._send({"op": "extract", "frames_npy": fp, "reference_npy": rp,
                    "out_npy": op, "height": height, "width": width})
        self._pending += 1

        def join():
            self._drain()
            return np.load(op), self.last_ack

        return join

    def image_pose(self, reference, tag="ref"):
        import os

        import numpy as np

        self._drain()
        rp = os.path.join(self._dir, f"{tag}_img.npy")
        op = os.path.join(self._dir, f"{tag}_pose.npy")
        np.save(rp, np.asarray(reference))
        self._send({"op": "image_pose", "reference_npy": rp, "out_npy": op})
        self._recv()
        return np.load(op)

    def close(self):
        try:
            self._send({"op": "exit"})
            self._proc.wait(timeout=30)
        except Exception:
            self._proc.kill()


if __name__ == "__main__":
    serve()
