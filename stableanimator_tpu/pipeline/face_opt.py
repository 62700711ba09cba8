"""HJB face optimization: inference-time identity refinement.

The StableAnimator paper (arXiv:2411.17697) describes a
Hamilton-Jacobi-Bellman-based face optimization that the reference repo
never shipped (its README lists the inference code as an unreleased to-do —
reference README.md:59). This module implements the capability from the
paper's formulation:

Treat denoising as an optimal-control problem: the state is the predicted
clean latent x0_hat, the running cost is face-identity dissimilarity
c(x0) = 1 - cos(ArcFace(decode(x0)_face), e_ref), and the HJB-optimal
control direction for a quadratic control penalty is the negative value-
function gradient. Along the EDM probability-flow ODE this reduces to
gradient steps on x0_hat before the Euler update uses it:

    x0* = x0_hat - lr * d c(x0_hat) / d x0_hat        (n_steps times)
    x_{t-1} = x_t + (x_t - x0*) / sigma * (sigma_next - sigma)

The similarity gradient is exact: the VAE temporal decoder and the ArcFace
recogniser both run inside JAX (the ONNX->JAX executor is differentiable),
so d(similarity)/d(latents) backpropagates through the real recogniser —
no surrogate. Only a per-frame face crop of the latent is decoded
(convolutional decoder => local receptive field), keeping the inner loop
cheap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from stableanimator_tpu.ops.resize import resize_bicubic_align_corners


@dataclass(frozen=True)
class FaceOptConfig:
    """Static inner-solver configuration (hashable; part of the jit key)."""

    steps: int = 0            # gradient steps per denoise step; 0 disables
    lr: float = 0.1
    start_step: int = 8       # first denoise step to optimise (face must
    end_step: int = 10_000    # have formed enough to carry identity)
    latent_crop: int = 16     # latent-space crop size (x8 pixels)
    arcface_size: int = 112


class FaceOptimizer:
    """Bundles the differentiable pieces the inner solver needs.

    arcface_fn: callable [N, 3, S, S] (pixels in [-1, 1]) -> [N, D]
                embeddings; typically a jitted OnnxFunction of glintr100.
    decode_fn:  callable (latents [F, h, w, 4], num_frames) -> frames
                [F, H, W, 3] in [-1, 1]; a partial of the VAE decoder apply.

    Registered as a JAX pytree: `target` and `face_boxes` are traced
    leaves (they change per video — the boxes only exist after pose
    extraction), while cfg + the two callables are static aux data. This
    lets one GLOBAL jitted segment program serve every optimizer built
    from the same callables, so `warm_generate(face_opt=...)` with
    placeholder boxes pre-compiles exactly the program the later
    `generate()` dispatches (boxes are data, not part of the jit key).
    """

    def __init__(self, cfg: FaceOptConfig, arcface_fn: Callable,
                 decode_fn: Callable, target_embedding, face_boxes):
        self.cfg = cfg
        self.arcface_fn = arcface_fn
        self.decode_fn = decode_fn
        # [D] reference identity embedding, l2-normalised
        t = jnp.asarray(target_embedding, jnp.float32).reshape(-1)
        self.target = t / (jnp.linalg.norm(t) + 1e-8)
        # [F, 2] int32 top-left (y, x) of each frame's face crop in latent
        # coordinates (from the driving pose's face keypoints)
        self.face_boxes = jnp.asarray(face_boxes, jnp.int32)

    def with_boxes(self, face_boxes):
        """Copy with new per-frame face boxes, SHARING cfg + callables —
        the copy hits the same jit cache entries as the original (the
        callables' identity is the static part of the key)."""
        new = object.__new__(FaceOptimizer)
        new.cfg = self.cfg
        new.arcface_fn = self.arcface_fn
        new.decode_fn = self.decode_fn
        new.target = self.target
        new.face_boxes = jnp.asarray(face_boxes, jnp.int32)
        return new

    def _tree_flatten(self):
        return (self.target, self.face_boxes), (self.cfg, self.arcface_fn,
                                                self.decode_fn)

    @classmethod
    def _tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.cfg, obj.arcface_fn, obj.decode_fn = aux
        obj.target, obj.face_boxes = leaves
        return obj

    def identity_cost(self, x0_latents):
        """1 - mean cosine similarity over frames. x0_latents [1, F, h, w, 4]
        in the *scaled* latent space (x 0.18215)."""
        cfg = self.cfg
        lat = x0_latents[0]
        f, h, w, c = lat.shape
        crop = cfg.latent_crop

        def crop_one(frame, box):
            y = jnp.clip(box[0], 0, h - crop)
            x = jnp.clip(box[1], 0, w - crop)
            return jax.lax.dynamic_slice(frame, (y, x, 0), (crop, crop, c))

        crops = jax.vmap(crop_one)(lat, self.face_boxes)      # [F, crop, crop, 4]
        faces = self.decode_fn(crops, f)                      # [F, 8c, 8c, 3]
        faces = jnp.clip(faces.astype(jnp.float32), -1.0, 1.0)
        faces = resize_bicubic_align_corners(faces, cfg.arcface_size,
                                             cfg.arcface_size)
        emb = self.arcface_fn(jnp.transpose(faces, (0, 3, 1, 2)))
        if isinstance(emb, (tuple, list)):
            emb = emb[0]
        emb = emb.astype(jnp.float32)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.mean(emb @ self.target)
        return 1.0 - sim

    def refine(self, x0_latents, step_index):
        """HJB inner solver: gradient steps on x0_hat, gated to
        [start_step, end_step)."""
        cfg = self.cfg
        if cfg.steps <= 0:
            return x0_latents

        grad_fn = jax.grad(self.identity_cost)

        def body(_, x0):
            return x0 - cfg.lr * grad_fn(x0)

        def run(x0):
            return jax.lax.fori_loop(0, cfg.steps, body, x0)

        active = jnp.logical_and(step_index >= cfg.start_step,
                                 step_index < cfg.end_step)
        return jax.lax.cond(active, run, lambda x0: x0, x0_latents)


jax.tree_util.register_pytree_node(
    FaceOptimizer,
    lambda o: o._tree_flatten(),
    FaceOptimizer._tree_unflatten,
)


def face_boxes_from_pose_renders(pose_pixels, latent_h: int, latent_w: int,
                                 crop: int = 16):
    """Per-frame latent face-crop top-lefts from *rendered* pose images
    [F, H, W, 3] in [-1, 1]. The face is the only element drawn pure white
    (skeleton_render.draw_facepose draws (255,255,255) dots; body limbs are
    hue-coded and pre-dimmed x0.6, hands are HSV-colored), so the
    white-pixel centroid locates the face. Host-side numpy."""
    import numpy as np

    arr = np.asarray(pose_pixels)
    f, hh, ww, _ = arr.shape
    boxes = []
    for i in range(f):
        mask = (arr[i] > 0.85).all(axis=-1)
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            cy, cx = latent_h / 2.0, latent_w / 2.0
        else:
            cy = ys.mean() / hh * latent_h
            cx = xs.mean() / ww * latent_w
        y = int(np.clip(round(cy - crop / 2), 0, max(latent_h - crop, 0)))
        x = int(np.clip(round(cx - crop / 2), 0, max(latent_w - crop, 0)))
        boxes.append((y, x))
    return np.asarray(boxes, np.int32)


def make_face_optimizer(models, params, cfg: FaceOptConfig, arcface_fn,
                        target_embedding, pose_pixels, latent_h: int,
                        latent_w: int, channel_order: str = "reference",
                        num_frames: int | None = None):
    """Construct a FaceOptimizer from the real pipeline pieces.

    decode_fn wraps the real temporal-VAE decoder and owns the latent
    scaling (x0 latents live in the x0.18215 space; the decoder expects the
    unscaled space — reference inference_pipeline_animation.py:326).
    arcface_fn is typically `load_onnx_function("glintr100.onnx")`; with
    channel_order="reference" the decoded RGB faces are channel-flipped so
    the embeddings are computed in the same (quirked) space as the
    reference identity embedding (see cli/animate.py --face_channel_order).
    """
    import dataclasses

    # the crop cannot exceed the latent plane (smoke runs at tiny
    # resolutions); clamp instead of failing inside dynamic_slice
    crop = min(cfg.latent_crop, latent_h, latent_w)
    if crop != cfg.latent_crop:
        cfg = dataclasses.replace(cfg, latent_crop=crop)

    scaling = models.vae.config.scaling_factor

    def decode_fn(crops, num_frames):
        return models.vae.apply({"params": params["vae"]}, crops / scaling,
                                num_frames=num_frames,
                                method=models.vae.decode)

    # recogniser weights as DEVICE arrays: numpy closures trace into the
    # generate jit as HLO literal constants — a 260 MB glintr100 blob per
    # compile; jax.Array constants are hoisted as buffer parameters instead
    arc_weights = (jax.tree_util.tree_map(jnp.asarray, arcface_fn.weights)
                   if hasattr(arcface_fn, "weights") else None)

    def embed_fn(faces_nchw):
        if channel_order == "reference":
            faces_nchw = faces_nchw[:, ::-1, :, :]
        out = (arcface_fn(faces_nchw, _weights=arc_weights)
               if arc_weights is not None else arcface_fn(faces_nchw))
        return out[0] if isinstance(out, (tuple, list)) else out

    if pose_pixels is None:
        # placeholder (centered) boxes: lets the optimizer be built BEFORE
        # pose extraction finishes so warm_generate can pre-compile the
        # face-opt programs during the overlap; swap the real boxes in
        # later with .with_boxes() (boxes are traced leaves, not jit keys)
        import numpy as np

        y = max((latent_h - cfg.latent_crop) // 2, 0)
        x = max((latent_w - cfg.latent_crop) // 2, 0)
        boxes = np.broadcast_to(np.asarray((y, x), np.int32),
                                (num_frames, 2)).copy()
    else:
        boxes = face_boxes_from_pose_renders(pose_pixels, latent_h, latent_w,
                                             cfg.latent_crop)
    return FaceOptimizer(cfg, embed_fn, decode_fn, target_embedding, boxes)


def face_boxes_from_pose(faces_keypoints, latent_h: int, latent_w: int,
                         crop: int = 16):
    """Per-frame latent-space face-crop top-lefts from normalised DWPose
    face landmarks [F, 68, 2] (x, y in [0, 1]); host-side numpy."""
    import numpy as np

    faces = np.asarray(faces_keypoints)
    boxes = []
    for lmks in faces:
        valid = lmks[(lmks[:, 0] > 0.01) & (lmks[:, 1] > 0.01)]
        if len(valid) == 0:
            cy, cx = latent_h // 2, latent_w // 2
        else:
            cx = float(valid[:, 0].mean()) * latent_w
            cy = float(valid[:, 1].mean()) * latent_h
        y = int(np.clip(round(cy - crop / 2), 0, max(latent_h - crop, 0)))
        x = int(np.clip(round(cx - crop / 2), 0, max(latent_w - crop, 0)))
        boxes.append((y, x))
    return np.asarray(boxes, np.int32)
