"""OpenPose-style skeleton rasterisation + reference-shape alignment.

Re-expresses reference DWPose/skeleton_extraction.py:
  * draw_bodypose (:16-59): limbs as filled ellipses with the 18-colour
    palette and confidence alpha, canvas dimmed x0.6, keypoint circles,
  * draw_handpose (:61-88): HSV-coloured hand edges + blue fingertips,
  * draw_facepose (:90-100): white confidence dots,
  * draw_pose (:102-135): hi-res canvas (ref_w=2160-normalised) then resize,
  * align_to_reference (:137-178): least-squares y-fit -> per-axis affine
    that maps driving-video skeletons onto the reference body shape.

Rasterisation prefers the first-party C++ kernel (native/raster.cpp via
ctypes) and falls back to cv2.
"""

from __future__ import annotations

import colorsys
import math
from typing import Dict, List, Sequence

import numpy as np

from stableanimator_tpu.preproc.geometry import resize_bilinear

EPS = 0.01

LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]

BODY_COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
               [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
               [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
               [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
               [255, 0, 170], [255, 0, 85]]

HAND_EDGES = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
              [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
              [15, 16], [0, 17], [17, 18], [18, 19], [19, 20]]


def _blend(color: Sequence[int], alpha: float) -> List[int]:
    return [int(c * alpha) for c in color]


def draw_bodypose(canvas, candidate, subset, score):
    import cv2

    h, w = canvas.shape[:2]
    candidate = np.asarray(candidate)
    subset = np.asarray(subset)
    stickwidth = 4
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.array(LIMB_SEQ[i]) - 1]
            conf = score[n][np.array(LIMB_SEQ[i]) - 1]
            if conf[0] < 0.3 or conf[1] < 0.3:
                continue
            y = candidate[index.astype(int), 0] * float(w)
            x = candidate[index.astype(int), 1] * float(h)
            mx, my = np.mean(x), np.mean(y)
            length = ((x[0] - x[1]) ** 2 + (y[0] - y[1]) ** 2) ** 0.5
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            polygon = cv2.ellipse2Poly((int(my), int(mx)),
                                       (int(length / 2), stickwidth),
                                       int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, polygon,
                               _blend(BODY_COLORS[i], conf[0] * conf[1]))
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            cv2.circle(canvas, (int(x * w), int(y * h)), 4,
                       _blend(BODY_COLORS[i], score[n][i]), thickness=-1)
    return canvas


def draw_handpose(canvas, all_hand_peaks, all_hand_scores):
    import cv2

    h, w = canvas.shape[:2]
    n_edges = len(HAND_EDGES)
    for peaks, scores in zip(all_hand_peaks, all_hand_scores):
        for ie, e in enumerate(HAND_EDGES):
            x1, y1 = peaks[e[0]]
            x2, y2 = peaks[e[1]]
            x1, y1 = int(x1 * w), int(y1 * h)
            x2, y2 = int(x2 * w), int(y2 * h)
            s = int(scores[e[0]] * scores[e[1]] * 255)
            if x1 > EPS and y1 > EPS and x2 > EPS and y2 > EPS:
                rgb = np.array(colorsys.hsv_to_rgb(ie / float(n_edges), 1.0, 1.0))
                cv2.line(canvas, (x1, y1), (x2, y2), rgb * s, thickness=2)
        for i, kpt in enumerate(peaks):
            x, y = kpt
            x, y = int(x * w), int(y * h)
            s = int(scores[i] * 255)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), 4, (0, 0, s), thickness=-1)
    return canvas


def draw_facepose(canvas, all_lmks, all_scores):
    import cv2

    h, w = canvas.shape[:2]
    for lmks, scores in zip(all_lmks, all_scores):
        for lmk, score in zip(lmks, scores):
            x, y = int(lmk[0] * w), int(lmk[1] * h)
            conf = int(score * 255)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), 3, (conf, conf, conf), thickness=-1)
    return canvas


def _draw_bodypose_native(canvas, candidate, subset, score):
    """draw_bodypose on the first-party C++ raster (native/raster.cpp)."""
    from stableanimator_tpu.preproc import native_raster as nr

    h, w = canvas.shape[:2]
    candidate = np.asarray(candidate)
    subset = np.asarray(subset)
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.array(LIMB_SEQ[i]) - 1]
            conf = score[n][np.array(LIMB_SEQ[i]) - 1]
            if conf[0] < 0.3 or conf[1] < 0.3:
                continue
            y = candidate[index.astype(int), 0] * float(w)
            x = candidate[index.astype(int), 1] * float(h)
            mx, my = np.mean(x), np.mean(y)
            length = ((x[0] - x[1]) ** 2 + (y[0] - y[1]) ** 2) ** 0.5
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            nr.fill_ellipse(canvas, (int(my), int(mx)), (int(length / 2), 4),
                            int(angle), _blend(BODY_COLORS[i],
                                               conf[0] * conf[1]))
    nr.scale_canvas(canvas, 0.6)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            nr.fill_circle(canvas, int(x * w), int(y * h), 4,
                           _blend(BODY_COLORS[i], score[n][i]))
    return canvas


def _draw_handpose_native(canvas, all_hand_peaks, all_hand_scores):
    from stableanimator_tpu.preproc import native_raster as nr

    h, w = canvas.shape[:2]
    n_edges = len(HAND_EDGES)
    for peaks, scores in zip(all_hand_peaks, all_hand_scores):
        for ie, e in enumerate(HAND_EDGES):
            x1, y1 = int(peaks[e[0]][0] * w), int(peaks[e[0]][1] * h)
            x2, y2 = int(peaks[e[1]][0] * w), int(peaks[e[1]][1] * h)
            s = int(scores[e[0]] * scores[e[1]] * 255)
            if x1 > EPS and y1 > EPS and x2 > EPS and y2 > EPS:
                rgb = np.array(colorsys.hsv_to_rgb(ie / float(n_edges), 1.0, 1.0))
                nr.draw_line(canvas, x1, y1, x2, y2, 2, rgb * s)
        for i, kpt in enumerate(peaks):
            x, y = int(kpt[0] * w), int(kpt[1] * h)
            s = int(scores[i] * 255)
            if x > EPS and y > EPS:
                nr.fill_circle(canvas, x, y, 4, (0, 0, s))
    return canvas


def _draw_facepose_native(canvas, all_lmks, all_scores):
    from stableanimator_tpu.preproc import native_raster as nr

    h, w = canvas.shape[:2]
    for lmks, scores in zip(all_lmks, all_scores):
        for lmk, score in zip(lmks, scores):
            x, y = int(lmk[0] * w), int(lmk[1] * h)
            conf = int(score * 255)
            if x > EPS and y > EPS:
                nr.fill_circle(canvas, x, y, 3, (conf, conf, conf))
    return canvas


def draw_pose(pose: Dict, height: int, width: int, ref_w: int = 2160,
              backend: str = "native") -> np.ndarray:
    """Render a pose dict to an RGB CHW uint8 image (reference :102-135).

    backend "native" (default) rasterises with the first-party C++ kernels
    (native/raster.cpp) — byte-identical to the reference's OpenCV drawing
    (see raster.cpp header for the one cv2-5.0 thick-line edge caveat) —
    and falls back to cv2 if the shared library cannot be built. backend
    "cv2" forces the OpenCV path (kept as the test oracle)."""
    if backend == "native":
        from stableanimator_tpu.preproc import native_raster as nr

        if not nr.available():
            backend = "cv2"
    bodies = pose["bodies"]
    sz = min(height, width)
    sr = (ref_w / sz) if sz != ref_w else 1
    canvas = np.zeros((int(height * sr), int(width * sr), 3), np.uint8)
    if backend == "native":
        canvas = _draw_bodypose_native(canvas, bodies["candidate"],
                                       bodies["subset"], score=bodies["score"])
        canvas = _draw_handpose_native(canvas, pose["hands"], pose["hands_score"])
        canvas = _draw_facepose_native(canvas, pose["faces"], pose["faces_score"])
    else:
        canvas = draw_bodypose(canvas, bodies["candidate"], bodies["subset"],
                               score=bodies["score"])
        canvas = draw_handpose(canvas, pose["hands"], pose["hands_score"])
        canvas = draw_facepose(canvas, pose["faces"], pose["faces_score"])
    # first-party resize (byte-identical to cv2.INTER_LINEAR) + BGR->RGB
    resized = resize_bilinear(canvas, (width, height))
    return resized[..., ::-1].transpose(2, 0, 1)


REF_KEYPOINT_IDS = [0, 1, 2, 5, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17]


def align_to_reference(detected_poses: List[Dict], ref_pose: Dict,
                       height: int, width: int) -> List[Dict]:
    """Affine-align driving skeletons onto the reference body shape
    (reference :137-178): least-squares fit of target y-coords to the
    reference y-coords gives (ay, by); ax follows from the aspect ratio and
    bx from the mean x offset. Applied in place to bodies/faces/hands."""
    ref_ids = [i for i in REF_KEYPOINT_IDS
               if len(ref_pose["bodies"]["subset"]) > 0
               and ref_pose["bodies"]["subset"][0][i] >= 0.0]
    ref_body = ref_pose["bodies"]["candidate"][ref_ids]

    detected_bodies = np.stack(
        [p["bodies"]["candidate"] for p in detected_poses
         if p["bodies"]["candidate"].shape[0] == 18])[:, ref_ids]
    ay, by = np.polyfit(detected_bodies[:, :, 1].flatten(),
                        np.tile(ref_body[:, 1], len(detected_bodies)), 1)
    ax = ay / (height / width / height * width)
    bx = np.mean(np.tile(ref_body[:, 0], len(detected_bodies))
                 - detected_bodies[:, :, 0].flatten() * ax)
    a = np.array([ax, ay])
    b = np.array([bx, by])
    for pose in detected_poses:
        pose["bodies"]["candidate"] = pose["bodies"]["candidate"] * a + b
        pose["faces"] = pose["faces"] * a + b
        pose["hands"] = pose["hands"] * a + b
    return detected_poses
