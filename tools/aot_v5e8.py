#!/usr/bin/env python
"""Chipless v5e-8 AOT: compile the sharded production programs against the
REAL v5e:2x4 TPU topology (libtpu compile-only PJRT, no chips) and read the
compiler's memory analysis + collective schedule.

This upgrades the v5e-8 story from arithmetic (tools/estimate_multichip.py:
measured 1-chip time / 8 + lowered bytes / assumed ICI bandwidth) to
compiler-grade evidence (VERDICT r3 item 2):

  * per-chip HBM from `compiled.memory_analysis()` — proves/refutes
    "ZeRO-1 makes full-unet dp=8 training fit 8 x 16 GB"
    (parallel/mesh.py::shard_optimizer_state), and that the pro-config
    generate fits;
  * the REAL TPU compiler's collective schedule (op kinds/counts/bytes
    from the optimized HLO), not the CPU backend's GSPMD lowering.

Targets (each = one production program):
  pro           576x1024 x 16f generate on the (data=2, frame=4) mesh
  longvid       the 450-frame demo's denoise-segment program at 512^2
  train_full    dp=8 full-unet train step (unet+pose_net+face_encoder
                trainable), ZeRO-1-sharded Adam state, donated
  train_adapter dp=8 adapter-only train step (pose_net+face_encoder)
  micro         64^2 micro-model generate on the 2x4 mesh (CI-speed
                validation that the topology AOT flow itself works)

Each target runs in its OWN subprocess under --all: libtpu allows one
process at a time (lockfile), and a known local-libtpu segfault on some
full-graph AOT compiles (NOTES_ROUND3 "chipless Mosaic validation") must
not kill the driver — a crashed target is recorded as status=crashed, not
silently dropped.

  python tools/aot_v5e8.py --target micro          # one target, one JSON
  python tools/aot_v5e8.py --all                   # everything ->
                                                   # ESTIMATE_V5E8_AOT.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")

import argparse
import functools
import json
import re
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

HBM_PER_CHIP = 16 * 1024**3  # v5e: 16 GiB


def _log(msg):
    print(f"[aot_v5e8] {msg}", file=sys.stderr, flush=True)


def _mesh(shape, axes):
    import numpy as np

    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devs = np.asarray(topo.devices).reshape(shape)
    return Mesh(devs, axes)


def _abstract(tree, sharding, cast_bf16=True):
    import jax
    import jax.numpy as jnp

    def leaf(s):
        dt = (jnp.bfloat16 if cast_bf16 and s.dtype == jnp.float32
              else s.dtype)
        return jax.ShapeDtypeStruct(s.shape, dt, sharding=sharding)

    return jax.tree_util.tree_map(leaf, tree)


_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(")


def _collective_schedule(hlo_text: str):
    """Kind -> {count, bytes} from the optimized (TPU-scheduled) HLO.
    Async pairs (-start/-done) count once, via the -start op; bytes are the
    op's output tensor sizes (static program counts — executed traffic for
    while-body ops additionally scales with the trip count, which
    tools/estimate_multichip.py models)."""
    from tools.estimate_multichip import _shape_bytes

    out: dict = {}
    for ln in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?\S+ = (\(?[^ ]+) ([\w-]+)\(", ln)
        if not m:
            continue
        kind = m.group(2)
        if kind.endswith("-done"):
            continue
        base = kind[:-6] if kind.endswith("-start") else kind
        if base not in ("all-reduce", "all-gather", "reduce-scatter",
                        "collective-permute", "all-to-all"):
            continue
        shapes = re.findall(r"\w+\[[\d,]*\]", m.group(1))
        rec = out.setdefault(base, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += sum(_shape_bytes(s) for s in shapes)
    return out


def _memory_report(compiled):
    """memory_analysis() -> per-chip HBM picture. Sizes are per-device for
    SPMD executables."""
    ma = compiled.memory_analysis()
    fields = {}
    for name in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, name, None)
        if v is not None:
            fields[name] = int(v)
    peak = (fields.get("argument_size_in_bytes", 0)
            + fields.get("output_size_in_bytes", 0)
            - fields.get("alias_size_in_bytes", 0)
            + fields.get("temp_size_in_bytes", 0))
    fields["peak_hbm_bytes_est"] = peak
    fields["peak_hbm_gib"] = round(peak / 1024**3, 2)
    fields["fits_16gib_chip"] = peak < HBM_PER_CHIP
    return fields


def _finish(name, compiled, t0, extra=None):
    rec = {
        "target": name,
        "status": "ok",
        "compile_s": round(time.time() - t0, 1),
        "memory": _memory_report(compiled),
        "collectives": _collective_schedule(compiled.as_text()),
    }
    if extra:
        rec.update(extra)
    return rec


# --------------------------------------------------------------------------
# targets
# --------------------------------------------------------------------------


def target_pro():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.ops.gate import ACTIVE_MESH
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.pipeline.animation import _generate_impl, init_params

    models = build_models(dtype=jnp.bfloat16)
    h, w, f = 576, 1024, 16
    cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=16,
                         tile_overlap=4, num_inference_steps=25,
                         decode_chunk_size=4)
    mesh = _mesh((2, 4), ("data", "frame"))
    rep = NamedSharding(mesh, P())
    shapes = jax.eval_shape(lambda: init_params(
        models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))
    params = _abstract(shapes, rep)
    fn = jax.jit(functools.partial(_generate_impl, models, face_opt=None,
                                   mesh=mesh, clip_image=None),
                 static_argnums=(4,))
    t0 = time.time()
    _log("lowering pro-config generate (576x1024 x 16f, 25 steps) ...")
    tok = ACTIVE_MESH.set(mesh)
    try:
        compiled = fn.lower(
            params,
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((1, 512), jnp.float32, sharding=rep),
            cfg,
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        ).compile()
    finally:
        ACTIVE_MESH.reset(tok)
    return _finish("pro", compiled, t0,
                   {"mesh": "data=2 x frame=4", "steps": 25})


def target_longvid():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.ops.gate import ACTIVE_MESH
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.pipeline.animation import _denoise_segment, init_params

    models = build_models(dtype=jnp.bfloat16)
    f, h8, w8 = 450, 64, 64
    cfg = PipelineConfig(height=512, width=512, num_frames=f, tile_size=16,
                         tile_overlap=4, num_inference_steps=25,
                         decode_chunk_size=4)
    mesh = _mesh((2, 4), ("data", "frame"))
    rep = NamedSharding(mesh, P())
    shapes = jax.eval_shape(lambda: init_params(
        models, jax.random.PRNGKey(0), height=512, width=512, num_frames=2))
    params = _abstract(shapes, rep)
    fn = jax.jit(functools.partial(_denoise_segment, models, cfg=cfg,
                                   num_steps=1, mesh=mesh))
    t0 = time.time()
    _log("lowering 450f denoise segment (512^2, 1 step x 38 groups) ...")
    tok = ACTIVE_MESH.set(mesh)
    try:
        compiled = fn.lower(
            params,
            jax.ShapeDtypeStruct((1, f, h8, w8, 4), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((2, 5, 1024), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((2, h8, w8, 4), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((2, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((f, h8, w8, 320), jnp.float32, sharding=rep),
            step_start=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        ).compile()
    finally:
        ACTIVE_MESH.reset(tok)
    return _finish("longvid", compiled, t0,
                   {"mesh": "data=2 x frame=4",
                    "note": "one segment = 1 Euler step; dispatched 25x"})


def _train_target(trainable_keys, name, mesh_shape=(8, 1), batch=8,
                  zero_axes="data", frame_shard=False):
    """Train step with ZeRO-1-sharded optimizer state, remat, and donated
    input state — the production memory configuration.

    mesh_shape/batch/zero_axes/frame_shard parameterise the sharding:
      dp=8 (default): one clip per chip, moments split 8-ways over data.
      (4,2)+frame_shard: the reference's global batch of 4
        (command_train.sh: 4 GPUs x 1 clip), frames split over the
        "frame" axis (halves activation memory per chip) and moments
        split over ALL 8 devices — the configuration that fits the
        full-unet finetune in 16 GB where dp=8 cannot (dp=8 full-unet
        measured 24.1 GB pre-remat; still over post-remat)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableanimator_tpu.core.config import PipelineConfig, TrainConfig
    from stableanimator_tpu.parallel.mesh import zero_sharding_for
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.pipeline.animation import init_params
    from stableanimator_tpu.train.train_step import (
        TrainState,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # remat=True is the production training configuration (cli/train,
    # tools/bench_train — mirrors the reference's --gradient_checkpointing);
    # without it the full-unet step needs 24.1 GB/chip (compiler-measured,
    # r4) vs 15.75 available
    models = build_models(dtype=jnp.bfloat16, remat=True)
    h, w, f, b = 512, 512, 16, batch  # command_train.sh rec bucket
    mesh = _mesh(mesh_shape, ("data", "frame"))
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    video = NamedSharding(mesh, P("data", "frame" if frame_shard else None))
    tcfg = TrainConfig()
    pipe = PipelineConfig(height=h, width=w, num_frames=f)
    pshapes = jax.eval_shape(lambda: init_params(
        models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))
    state_shapes = jax.eval_shape(lambda: create_train_state(
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                               pshapes), tcfg,
        trainable_keys=trainable_keys)[0])

    # bf16 weights; fp32 Adam moments ZeRO-1-sharded over the data axis,
    # everything else replicated (parallel/mesh.py::shard_optimizer_state)
    def leaf_bf16(s):
        return jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)

    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        params=_abstract(state_shapes.params, rep),
        frozen=_abstract(state_shapes.frozen, rep),
        opt_state=jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=zero_sharding_for(s, mesh, zero_axes)),
            state_shapes.opt_state),
    )
    batch_tree = {
        "frames": jax.ShapeDtypeStruct((b, f, h, w, 3), jnp.float32,
                                       sharding=video),
        "ref_image": jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32,
                                          sharding=data),
        "face_embed": jax.ShapeDtypeStruct((b, 512), jnp.float32,
                                           sharding=data),
        "pose_pixels": jax.ShapeDtypeStruct((b, f, h, w, 3), jnp.float32,
                                            sharding=video),
        "face_mask": jax.ShapeDtypeStruct((b, f, h, w), jnp.float32,
                                          sharding=video),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
    step = make_train_step(models, make_optimizer(tcfg), tcfg, pipe,
                           donate=True, mesh=mesh)
    t0 = time.time()
    _log(f"lowering {name} train step (dp=8, ZeRO-1, donated) ...")
    compiled = step.lower(state, batch_tree, rng).compile()
    return _finish(name, compiled, t0,
                   {"mesh": f"data={mesh_shape[0]} x frame={mesh_shape[1]}",
                    "global_batch": b, "zero_axes": zero_axes,
                    "trainable": list(trainable_keys),
                    "zero1_opt_state": True, "donated": True, "remat": True})


def target_train_full():
    return _train_target(("unet", "pose_net", "face_encoder"), "train_full")


def target_train_full_sp():
    """Full-unet finetune on the (data=4, frame=2) mesh: the reference's
    global batch of 4, frame-sharded activations, Adam moments split over
    all 8 chips."""
    return _train_target(("unet", "pose_net", "face_encoder"),
                         "train_full_sp", mesh_shape=(4, 2), batch=4,
                         zero_axes=("data", "frame"), frame_shard=True)


def target_train_full_sp_b2():
    """(data=2, frame=4) mesh, GLOBAL batch 2: the fallback after the
    compiler refuted train_full_sp on the real topology (r5 run:
    RESOURCE_EXHAUSTED, "Used 17.00G of 15.75G hbm" — batch 4 on (4,2)
    does NOT fit). Per-chip folded batch halves (64/8=8 -> 32/8=4);
    2 grad-accumulation steps restore the reference's effective batch
    of 4 (command_train.sh: 4 GPUs x per_gpu_batch_size=1)."""
    return _train_target(("unet", "pose_net", "face_encoder"),
                         "train_full_sp_b2", mesh_shape=(2, 4), batch=2,
                         zero_axes=("data", "frame"), frame_shard=True)


def target_train_adapter():
    return _train_target(("pose_net", "face_encoder"), "train_adapter")


def target_micro():
    """Tiny-model generate on the 2x4 topology: validates the chipless
    topology-AOT flow itself (test tier)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stableanimator_tpu.core.config import PipelineConfig, micro_model_kwargs
    from stableanimator_tpu.ops.gate import ACTIVE_MESH
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.pipeline.animation import _generate_impl, init_params

    models = build_models(**micro_model_kwargs())
    h = w = 64
    f = 4
    cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=4,
                         tile_overlap=1, num_inference_steps=2,
                         decode_chunk_size=2)
    mesh = _mesh((2, 4), ("data", "frame"))
    rep = NamedSharding(mesh, P())
    shapes = jax.eval_shape(lambda: init_params(
        models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))
    params = _abstract(shapes, rep, cast_bf16=False)
    fn = jax.jit(functools.partial(_generate_impl, models, face_opt=None,
                                   mesh=mesh, clip_image=None),
                 static_argnums=(4,))
    t0 = time.time()
    _log("lowering micro generate on the v5e:2x4 topology ...")
    tok = ACTIVE_MESH.set(mesh)
    try:
        compiled = fn.lower(
            params,
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((1, 32), jnp.float32, sharding=rep),
            cfg,
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        ).compile()
    finally:
        ACTIVE_MESH.reset(tok)
    return _finish("micro", compiled, t0, {"mesh": "data=2 x frame=4"})


TARGETS = {
    "pro": target_pro,
    "longvid": target_longvid,
    "train_full": target_train_full,
    "train_full_sp": target_train_full_sp,
    "train_full_sp_b2": target_train_full_sp_b2,
    "train_adapter": target_train_adapter,
    "micro": target_micro,
}


def run_all(targets, timeout_s):
    """Each target in its own subprocess (libtpu single-process lockfile;
    segfault isolation)."""
    import subprocess

    results = []
    for t in targets:
        _log(f"=== target {t} (subprocess) ===")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--target", t],
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            results.append({"target": t, "status": "timeout",
                            "timeout_s": timeout_s})
            continue
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            results.append(json.loads(lines[-1]))
        else:
            results.append({
                "target": t,
                "status": ("crashed" if proc.returncode < 0 else "failed"),
                "returncode": proc.returncode,
                "stderr_tail": proc.stderr[-1500:],
            })
        _log(f"{t}: {results[-1]['status']}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=sorted(TARGETS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--targets", default="pro,longvid,train_full,train_adapter",
                    help="comma list for --all")
    ap.add_argument("--timeout_s", type=int, default=3600)
    ap.add_argument("--out", default="ESTIMATE_V5E8_AOT.json")
    args = ap.parse_args()

    if args.target:
        print(json.dumps(TARGETS[args.target]()))
        return

    if not args.all:
        sys.exit("pass --target NAME or --all")
    results = run_all(args.targets.split(","), args.timeout_s)
    out = {
        "what": "chipless AOT compiles against the real v5e:2x4 topology "
                "(libtpu compile-only PJRT); memory_analysis() sizes are "
                "per-chip for SPMD executables — compiler-verified, not "
                "estimated",
        "hbm_per_chip_gib": 16,
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": args.out,
                      "statuses": {r["target"]: r["status"]
                                   for r in results}}))


if __name__ == "__main__":
    main()
