"""Headline benchmark: 512^2 x 16-frame x 25-step end-to-end generation on
one TPU chip.

Prints ONE JSON line to stdout (progress goes to stderr):
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline (BASELINE.md): the reference generates a 15 s / 450-frame demo at
512^2 in 5 minutes on an RTX 4090 => 1.5 frames/s. `vs_baseline` is our
frames/s divided by that.

Resilience (round-3 hardening — BENCH_r02 was lost to a transient
RESOURCE_EXHAUSTED and two judge re-runs to a 10-minute timeout):
  * params are filled ON DEVICE by one tiny jitted RNG graph
    (device_fill_params) — measured: uploading the 4.6 GB bf16 tree through
    the remote-TPU tunnel ran at ~7 MB/s and took ~11 minutes, and it was
    the real cost hiding inside round 2's "warmup"; the on-device fill
    removes host->device parameter traffic entirely
  * a JSON line is ALWAYS emitted: on SIGTERM/SIGINT (e.g. `timeout`),
    on OOM after retries, and on any other exception — with partial
    diagnostics and value taken from any completed timed runs
  * RESOURCE_EXHAUSTED at warmup retries once (transient chip state from a
    previous process), then falls back to decode_chunk_size=2 (lower HBM peak)
  * run count adapts to the remaining time budget (BENCH_BUDGET_S, def. 540)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

BASELINE_FRAMES_PER_SEC = 450.0 / 300.0  # reference README.md:367
_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "540"))

# mutable state for the always-emit-JSON guarantee
_STATE = {
    "phase": "startup",
    "times": [],          # completed timed-run seconds
    "init_s": None,
    "checksum_params": None,
    "compile_s": None,
    "checksum": None,
    "device": None,
    "fallback": None,
    "errors": [],
}
_EMITTED = [False]
F_FRAMES = 16


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(ok: bool) -> None:
    """Print the single JSON result line (exactly once)."""
    if _EMITTED[0]:
        return
    _EMITTED[0] = True
    times = _STATE["times"]
    if times:
        e2e = min(times)
        fps = _STATE.get("frames", F_FRAMES) / e2e
    else:
        e2e, fps = None, 0.0
    micro = os.environ.get("BENCH_MICRO", "0") not in ("0", "")
    out = {
        "metric": ("frames_per_sec_micro_smoke" if micro else
                   "frames_per_sec_per_chip_512px_16f_25step_e2e"),
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 4),
        "detail": {
            "ok": ok and bool(times),
            "phase": _STATE["phase"],
            "e2e_seconds_16_frames": round(e2e, 3) if e2e else None,
            "all_runs_s": [round(t, 3) for t in times],
            "compile_plus_first_run_s": _STATE["compile_s"],
            "session_warm_s": _STATE.get("session_warm_s"),
            "param_init_s": _STATE["init_s"],
            "param_checksum": _STATE["checksum_params"],
            "output_checksum": _STATE["checksum"],
            "device": _STATE["device"],
            "fallback": _STATE["fallback"],
            "errors": _STATE["errors"][-3:],
            "quant": _STATE.get("quant", False),
            "decode_chunk": _STATE.get("decode_chunk", 4),
            "total_wall_s": round(time.time() - _T0, 1),
        },
    }
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):
    _STATE["errors"].append(f"signal {signum} during phase {_STATE['phase']}")
    _log(f"caught signal {signum} in phase {_STATE['phase']} — emitting partial JSON")
    _emit(ok=False)
    sys.exit(0 if _STATE["times"] else 1)


def _install_signal_handlers():
    # called from main(), not at import: tools/bench_e2e.py imports this
    # module for _device_params and must keep its own signal semantics
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)


def _install_watchdog():
    """Emit the JSON line even if the main thread is wedged inside a C call.

    The axon tunnel has been observed to hang jax.devices() forever (PJRT
    client init blocked on a dead orchestrator). Python signal handlers only
    run between bytecodes of the MAIN thread, so SIGTERM from `timeout`
    cannot rescue that state — but a daemon thread can, as the blocked RPC
    releases the GIL. After the hard deadline it emits partial diagnostics
    and force-exits the process.
    """
    import threading

    hard = float(os.environ.get("BENCH_HARD_TIMEOUT_S", str(_BUDGET + 45)))

    def _watch():
        while True:
            left = hard - (time.time() - _T0)
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        if _EMITTED[0] or _STATE["phase"] == "done":
            return
        _STATE["errors"].append(
            f"watchdog: hard timeout {hard:.0f}s in phase {_STATE['phase']}")
        _log(f"watchdog fired in phase {_STATE['phase']} — emitting partial JSON")
        _emit(ok=False)
        sys.stdout.flush()
        os._exit(0 if _STATE["times"] else 1)

    threading.Thread(target=_watch, daemon=True, name="bench-watchdog").start()


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def _device_params(models, h, w):
    """bf16 benchmark param tree, filled ON DEVICE (zero host->device
    parameter traffic — see module docstring) and materialised before
    returning so the timed runs never hide a transfer.

    Sync is a pure device->host transfer of the smallest leaf: every output
    buffer of the fill execution becomes ready only when the execution
    completes, and a transfer is the one sync primitive on the remote
    platform that does not cost an extra remote executable (a jitted
    checksum graph used to add a whole program load, ~30-300 s on slow
    tunnel days)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from stableanimator_tpu.pipeline import device_fill_params

    params = device_fill_params(models, height=h, width=w,
                                cast_fp32_to=jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(params)
    probe = min(leaves, key=lambda x: x.size)
    _STATE["checksum_params"] = float(np.asarray(probe, np.float32).mean())
    return params


def main():
    _install_signal_handlers()
    _install_watchdog()

    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    # persist EVERYTHING: on the remote-compile (axon) platform even a
    # trivial graph costs 1-3 min to compile, so a >=5s threshold meant the
    # small helper graphs were re-compiled remotely in every process —
    # that, not the big scan graph, was the ~300s "warmup"
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import build_models, generate

    # BENCH_MICRO=1: depth-1 micro models at 64^2 x 4f x 2 steps on whatever
    # backend is active — exercises the COMPLETE bench control flow (device
    # fill, warmup attempts, timed runs, JSON emission) in seconds on CPU.
    # Used by tests/test_misc.py so bench regressions surface before the
    # driver's once-per-round TPU run.
    micro = os.environ.get("BENCH_MICRO", "0") not in ("0", "")
    if micro:
        jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    _STATE["device"] = str(jax.devices()[0])
    _log(f"device: {_STATE['device']}")

    # Absorb the per-process remote-session flat cost (measured 1-430 s,
    # regime-dependent) in its own logged phase so the watchdog/diagnostics
    # can tell "tunnel session init is slow today" apart from "the model
    # graphs are slow". Random host input defeats server-side result
    # memoization (a memoized hit would skip the real session init).
    _STATE["phase"] = "session_warm"
    t0 = time.time()
    float(np.asarray(
        jnp.asarray(np.random.default_rng().random(8, np.float32)).sum()))
    _STATE["session_warm_s"] = round(time.time() - t0, 1)
    _log(f"remote session warm ({_STATE['session_warm_s']}s)")

    h = w = 64 if micro else 512
    frames = 4 if micro else F_FRAMES
    steps = 2 if micro else 25

    _STATE["phase"] = "param_init"
    # A/B switch (recorded in the JSON detail):
    # SA_BENCH_QUANT=1 -> int8 W8A8 transformer FF/projections
    quant = os.environ.get("SA_BENCH_QUANT", "0") not in ("0", "")
    _STATE["quant"] = quant
    _STATE["frames"] = frames
    model_kwargs = {}
    if micro:
        from stableanimator_tpu.core.config import micro_model_kwargs
        model_kwargs = micro_model_kwargs()
    models = build_models(dtype=jnp.bfloat16, quant=quant, **model_kwargs)
    t0 = time.time()
    params = _device_params(models, h, w)
    _STATE["init_s"] = round(time.time() - t0, 1)
    _log(f"params filled on device ({_STATE['init_s']}s)")

    ref_image = jnp.full((1, h, w, 3), 0.5, jnp.float32)
    pose = jnp.full((frames, h, w, 3), -1.0, jnp.float32)
    face = jnp.zeros((1, models.face_encoder.config.id_embeddings_dim),
                     jnp.float32)

    def make_cfg(decode_chunk):
        tile = min(16, frames)
        return PipelineConfig(height=h, width=w, num_frames=frames,
                              tile_size=tile, tile_overlap=min(4, tile - 1),
                              num_inference_steps=steps,
                              decode_chunk_size=decode_chunk)

    # ONE executable for warmup + every timed run: the frame mean is computed
    # inside the generate program itself, so syncing is a pure 4-byte
    # transfer. An eager jnp.mean(out) would be a second remote executable
    # (compile-cached, but still a per-process program load — 10-300 s
    # depending on the tunnel regime); np.asarray of the full frames would
    # drag ~50 MB through the tunnel (+4 s/run).
    _fns = {}

    def run(cfg, key):
        if cfg not in _fns:
            _fns[cfg] = jax.jit(lambda p, r, po, f, k: jnp.mean(
                generate(models, p, r, po, f, cfg, rng=k)))
        out = _fns[cfg](params, ref_image, pose, face, jax.random.PRNGKey(key))
        return float(np.asarray(out))

    # --- warmup / compile, with OOM retry + fallback config ---------------
    # SA_BENCH_DECODE_CHUNK overrides the VAE decode chunk (default 4) for
    # A/B runs; the OOM fallback still steps down to 2
    _STATE["phase"] = "warmup"
    chunk = int(os.environ.get("SA_BENCH_DECODE_CHUNK", "4"))
    _STATE["decode_chunk"] = chunk
    cfg = make_cfg(chunk)
    attempts = [("primary", cfg), ("retry", cfg), ("decode_chunk_2", make_cfg(2))]
    warmed = None
    for name, acfg in attempts:
        try:
            _log(f"warmup attempt: {name} (remaining budget {_remaining():.0f}s)")
            t0 = time.time()
            _STATE["checksum"] = run(acfg, 1)
            _STATE["compile_s"] = round(time.time() - t0, 1)
            warmed = acfg
            _STATE["fallback"] = None if name == "primary" else name
            _log(f"warmup ok in {_STATE['compile_s']}s ({name})")
            break
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:200]}"
            _STATE["errors"].append(f"warmup {name}: {msg}")
            _log(f"warmup {name} FAILED: {msg}")
            if "RESOURCE_EXHAUSTED" not in str(e) and name == "primary":
                # non-OOM failure: retrying the same graph will not help more
                # than once; still try the fallback config before giving up
                continue
            time.sleep(5)
    if warmed is None:
        _STATE["phase"] = "warmup_failed"
        _emit(ok=False)
        sys.exit(1)

    # --- timed steady-state runs (adaptive count) --------------------------
    _STATE["phase"] = "timed_runs"
    per_run_est = 15.0
    n_runs = 3
    for i in range(n_runs):
        if _STATE["times"] and _remaining() < per_run_est + 10:
            _log(f"budget low ({_remaining():.0f}s) — stopping at "
                 f"{len(_STATE['times'])} runs")
            break
        t0 = time.time()
        try:
            run(warmed, 2 + i)
        except Exception as e:
            _STATE["errors"].append(f"timed run {i}: {type(e).__name__}: {str(e)[:200]}")
            _log(f"timed run {i} failed; continuing")
            continue
        dt = time.time() - t0
        per_run_est = dt
        _STATE["times"].append(dt)
        _log(f"run {i}: {dt:.3f}s")

    _STATE["phase"] = "done"
    _emit(ok=True)
    sys.exit(0 if _STATE["times"] else 1)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        _STATE["errors"].append(f"{type(e).__name__}: {str(e)[:300]}")
        _log(f"fatal in phase {_STATE['phase']}: {e!r}")
        _emit(ok=False)
        sys.exit(1)
