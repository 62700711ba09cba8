"""Headline benchmark: 512^2 x 16-frame x 25-step end-to-end generation on
one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline (BASELINE.md): the reference generates a 15 s / 450-frame demo at
512^2 in 5 minutes on an RTX 4090 => 1.5 frames/s. `vs_baseline` is our
frames/s divided by that.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FRAMES_PER_SEC = 450.0 / 300.0  # reference README.md:367


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import build_models, generate, fast_init_params

    h = w = 512
    f = 16

    models = build_models(dtype=jnp.bfloat16)

    t0 = time.time()
    # host-side shape-only init + one bulk transfer: compiling the full
    # init graph through the remote-compile service costs many minutes and
    # benchmarks nothing (steady-state generate timing is what matters)
    params = fast_init_params(models, height=h, width=w)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
        params)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    init_s = time.time() - t0

    cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=16,
                         tile_overlap=4, num_inference_steps=25,
                         decode_chunk_size=4)
    ref_image = jnp.full((1, h, w, 3), 0.5, jnp.float32)
    pose = jnp.full((f, h, w, 3), -1.0, jnp.float32)
    face = jnp.zeros((1, 512), jnp.float32)

    def run(key):
        out = generate(models, params, ref_image, pose, face, cfg,
                       rng=jax.random.PRNGKey(key))
        # On the remote (axon) platform block_until_ready does not wait for
        # execution; fetching a derived scalar is the only true sync. The
        # extra mean() and RTT add ~0.2s of noise to a multi-second e2e.
        return float(jnp.mean(out))

    # warmup / compile
    t0 = time.time()
    checksum = run(1)
    compile_s = time.time() - t0

    # timed steady-state runs
    times = []
    for i in range(3):
        t0 = time.time()
        run(2 + i)
        times.append(time.time() - t0)
    e2e = min(times)
    fps = f / e2e

    print(json.dumps({
        "metric": "frames_per_sec_per_chip_512px_16f_25step_e2e",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 4),
        "detail": {
            "e2e_seconds_16_frames": round(e2e, 3),
            "all_runs_s": [round(t, 3) for t in times],
            "compile_plus_first_run_s": round(compile_s, 1),
            "param_init_s": round(init_s, 1),
            "output_checksum": checksum,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
