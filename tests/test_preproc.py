"""Preprocessing toolchain tests.

Networks are exercised through tiny torch->ONNX stand-ins with the real
models' output *structure* (YOLOX grid heads, RTMPose SimCC heads, SCRFD
anchor heads, ArcFace embedding); geometry/decode/NMS/rendering are tested
against hand-computed values.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from tests.test_onnx import _export  # reuses the onnx-free exporter shim

from stableanimator_tpu.preproc.detection import (
    PersonDetector,
    decode_outputs,
    multiclass_nms,
    nms_single_class,
)
from stableanimator_tpu.preproc.face import (
    ARCFACE_DST,
    FaceDetector,
    FaceModel,
    face_mask,
    umeyama_similarity,
)
from stableanimator_tpu.preproc.pose_estimation import (
    PoseEstimator,
    bbox_xyxy2cs,
    fix_aspect_ratio,
    simcc_decode,
)
from stableanimator_tpu.preproc.skeleton_render import (
    align_to_reference,
    draw_pose,
)


class TestGeometry:
    def test_nms_suppresses_overlaps(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
        scores = np.array([0.9, 0.8, 0.7])
        keep = nms_single_class(boxes, scores, 0.45)
        assert keep == [0, 2]

    def test_multiclass_nms_threshold(self):
        boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
        scores = np.array([[0.9, 0.05], [0.2, 0.6]])
        dets = multiclass_nms(boxes, scores, 0.45, 0.3)
        assert dets.shape == (2, 6)
        assert set(dets[:, 5]) == {0.0, 1.0}

    def test_yolox_decode(self):
        # img_size=(32,32): 16 + 4 + 1 = 21 anchors; the first grid cell at
        # stride 8 with xy offset .5 decodes to center (4,4), exp(log 2)*8=16
        preds = np.zeros((1, 21, 85), np.float32)
        preds[0, 0, :2] = 0.5
        preds[0, 0, 2:4] = np.log(2.0)
        dec = decode_outputs(preds, (32, 32))
        np.testing.assert_allclose(dec[0, 0, :2], [4.0, 4.0])
        np.testing.assert_allclose(dec[0, 0, 2:4], [16.0, 16.0])

    def test_person_cap_bounds_degenerate_detections(self):
        """A pathological detector output (many confident non-overlapping
        boxes — exactly what stand-in weights produce) must not inflate the
        downstream pose-crop batch: _postprocess keeps only the
        MAX_PERSONS_PER_FRAME most confident persons."""
        det = PersonDetector.__new__(PersonDetector)  # geometry only
        det.input_size = (32, 32)
        raw = np.zeros((21, 85), np.float32)
        # all 16 stride-8 cells emit a confident 4x4 person box; grid
        # centers are 8 px apart so NMS suppresses nothing
        raw[:16, 2:4] = np.log(0.5)          # wh = 4 px
        raw[:16, 4] = 1.0                    # objectness
        raw[:16, 5] = 0.5 + np.arange(16) * 0.02  # person score ramp
        boxes = det._postprocess(raw, ratio=1.0, nms_thr=0.45,
                                 score_thr=0.1, final_thr=0.3)
        assert len(boxes) == PersonDetector.MAX_PERSONS_PER_FRAME
        # the survivors are the top-scoring cells (highest = last cells)
        # cell i center = (grid * stride) = (8*(i%4), 8*(i//4)); top-10 =
        # cells 6..15
        got_centers = sorted((boxes[:, 0] + boxes[:, 2]) / 2
                             + 100 * (boxes[:, 1] + boxes[:, 3]) / 2)
        want = sorted(8 * (i % 4) + 100 * 8 * (i // 4) for i in range(6, 16))
        np.testing.assert_allclose(got_centers, want)
        # an explicit max_det overrides the class default
        assert len(det._postprocess(raw, 1.0, 0.45, 0.1, 0.3,
                                    max_det=3)) == 3

    def test_bbox_cs_and_aspect(self):
        c, s = bbox_xyxy2cs(np.array([0, 0, 100, 50]), padding=1.25)
        np.testing.assert_allclose(c, [50, 25])
        np.testing.assert_allclose(s, [125, 62.5])
        s2 = fix_aspect_ratio(np.array([10.0, 100.0]), 0.75)
        np.testing.assert_allclose(s2, [75.0, 100.0])

    def test_simcc_decode(self):
        sx = np.zeros((1, 2, 20), np.float32)
        sy = np.zeros((1, 2, 30), np.float32)
        sx[0, 0, 10] = 1.0
        sy[0, 0, 15] = 0.9
        sx[0, 1, 3] = -1.0  # max <= 0 -> invalid
        sy[0, 1, 4] = -1.0
        locs, vals = simcc_decode(sx, sy, 2.0)
        np.testing.assert_allclose(locs[0, 0], [5.0, 7.5])
        assert vals[0, 0] == pytest.approx(0.9)
        np.testing.assert_allclose(locs[0, 1], [-0.5, -0.5])  # -1 / ratio

    def test_umeyama_recovers_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (5, 2))
        theta, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        dst = scale * src @ rot.T + t
        m = umeyama_similarity(src, dst)
        mapped = src @ m[:, :2].T + m[:, 2]
        np.testing.assert_allclose(mapped, dst, atol=1e-8)


class TestRendering:
    def _pose(self):
        body = np.array([[0.5, 0.2], [0.5, 0.35], [0.4, 0.35], [0.38, 0.5],
                         [0.36, 0.65], [0.6, 0.35], [0.62, 0.5], [0.64, 0.65],
                         [0.45, 0.6], [0.44, 0.8], [0.43, 0.95], [0.55, 0.6],
                         [0.56, 0.8], [0.57, 0.95], [0.48, 0.18], [0.52, 0.18],
                         [0.46, 0.19], [0.54, 0.19]])
        return dict(
            bodies=dict(candidate=body, subset=np.arange(18, dtype=float)[None],
                        score=np.full((1, 18), 0.9)),
            hands=np.full((2, 21, 2), 0.3), hands_score=np.full((2, 21), 0.8),
            faces=np.full((1, 68, 2), 0.5), faces_score=np.full((1, 68), 0.7),
        )

    def test_draw_pose_shape_and_content(self):
        img = draw_pose(self._pose(), 128, 96)
        assert img.shape == (3, 128, 96)
        assert img.dtype == np.uint8
        assert img.max() > 0  # something was drawn

    def test_align_to_reference_identity(self):
        """Aligning a pose set to itself must be (nearly) the identity map."""
        pose = self._pose()
        import copy

        detected = [copy.deepcopy(pose), copy.deepcopy(pose)]
        before = detected[0]["bodies"]["candidate"].copy()
        align_to_reference(detected, copy.deepcopy(pose), 128, 96)
        np.testing.assert_allclose(detected[0]["bodies"]["candidate"], before,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# network wiring through tiny ONNX stand-ins
# ---------------------------------------------------------------------------

class _YoloxStandin(nn.Module):
    """Produces [1, A, 85] with the YOLOX grid layout for a 64x64 input."""

    def __init__(self):
        super().__init__()
        self.h8 = nn.Conv2d(3, 85, 8, stride=8)
        self.h16 = nn.Conv2d(3, 85, 16, stride=16)
        self.h32 = nn.Conv2d(3, 85, 32, stride=32)

    def forward(self, x):
        outs = []
        for head in (self.h8, self.h16, self.h32):
            y = head(x)
            outs.append(y.flatten(2).transpose(1, 2))
        return torch.cat(outs, dim=1)


class TestDetectors:
    def test_person_detector_runs(self, tmp_path):
        torch.manual_seed(0)
        path = _export(tmp_path, _YoloxStandin(), (torch.randn(1, 3, 64, 64),))
        det = PersonDetector(path, input_size=(64, 64))
        img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)
        boxes = det(img, score_thr=-10.0, final_thr=-10.0)
        assert boxes.ndim == 2 and boxes.shape[1] == 4

    def test_pose_estimator_runs(self, tmp_path):
        torch.manual_seed(1)

        class RtmStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 8, 16, stride=16)
                self.fx = nn.Linear(8 * 4 * 3, 133 * 96)
                self.fy = nn.Linear(8 * 4 * 3, 133 * 128)

            def forward(self, x):
                y = self.conv(x).flatten(1)
                return (self.fx(y).reshape(-1, 133, 96),
                        self.fy(y).reshape(-1, 133, 128))

        path = _export(tmp_path, RtmStandin(), (torch.randn(1, 3, 64, 48),))
        est = PoseEstimator(path, input_size=(48, 64))
        img = np.random.default_rng(1).integers(0, 255, (96, 72, 3), dtype=np.uint8)
        kpts, scores = est(img, np.array([[10, 10, 60, 90]], np.float32))
        assert kpts.shape == (1, 133, 2)
        assert scores.shape == (1, 133)

    def test_scrfd_and_arcface(self, tmp_path):
        torch.manual_seed(2)

        class ScrfdStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.heads = nn.ModuleList([
                    nn.Conv2d(3, 2 * (1 + 4 + 10), s, stride=s) for s in (8, 16, 32)])

            def forward(self, x):
                outs_s, outs_b, outs_k = [], [], []
                for head in self.heads:
                    y = head(x)  # [1, 30, h, w]
                    b, c, hh, ww = y.shape
                    y = y.reshape(1, 2, 15, hh, ww).permute(0, 3, 4, 1, 2)
                    y = y.reshape(1, hh * ww * 2, 15)
                    outs_s.append(y[..., :1].sigmoid().reshape(-1, 1))
                    outs_b.append(y[..., 1:5].abs().reshape(-1, 4))
                    outs_k.append(y[..., 5:].reshape(-1, 10))
                return tuple(outs_s) + tuple(outs_b) + tuple(outs_k)

        det_path = _export(tmp_path, ScrfdStandin(), (torch.randn(1, 3, 64, 64),),
                           name="scrfd.onnx")
        det = FaceDetector(det_path, input_size=(64, 64), det_thresh=0.4)
        img = np.random.default_rng(2).integers(0, 255, (80, 80, 3), dtype=np.uint8)
        boxes, kps = det(img)
        assert boxes.ndim == 2 and boxes.shape[1] == 5
        assert kps.shape[1:] == (5, 2)

        class ArcStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 4, 16, stride=16)
                self.fc = nn.Linear(4 * 7 * 7, 512)

            def forward(self, x):
                return self.fc(self.conv(x).flatten(1))

        rec_path = _export(tmp_path, ArcStandin(), (torch.randn(1, 3, 112, 112),),
                           name="arc.onnx")
        model = FaceModel(det_path, rec_path)
        model.detector = det  # use the 64x64 stand-in geometry
        emb = model.get_id_embedding(img)
        if emb is not None:
            assert emb.shape == (512,)

    def test_face_mask_fallback(self):
        img = np.zeros((32, 32, 3), np.uint8)
        mask = face_mask(img, None)
        assert (mask == 255).all()

    def test_face_mask_three_tiers(self):
        """Reference chain (face_mask_extraction.py:10-38): primary detector
        -> RetinaFace fallback at thr 0.97 -> all-white."""
        img = np.zeros((32, 32, 3), np.uint8)

        class NoFace:
            def __call__(self, image):
                return np.zeros((0, 5), np.float32), np.zeros((0, 5, 2),
                                                              np.float32)

        calls = []

        def fallback(image, thr):
            calls.append(thr)
            return np.array([[4.0, 4.0, 12.0, 12.0, 0.99]], np.float32)

        mask = face_mask(img, NoFace(), fallback_detector=fallback)
        assert calls == [0.97]
        assert mask[8, 8] == 255 and mask[0, 0] == 0  # box, not all-white
        assert (mask == 255).sum() == 9 * 9  # inclusive-rect fill

        # tier 3: both detectors miss -> all-white
        mask = face_mask(img, NoFace(),
                         fallback_detector=lambda im, thr: np.zeros(
                             (0, 5), np.float32))
        assert (mask == 255).all()

        # tier 1 hit: fallback must NOT be consulted
        class OneFace:
            def __call__(self, image):
                return (np.array([[1.0, 1.0, 5.0, 5.0, 0.9]], np.float32),
                        np.zeros((1, 5, 2), np.float32))

        calls.clear()
        mask = face_mask(img, OneFace(), fallback_detector=fallback)
        assert calls == [] and mask[2, 2] == 255


class TestRetinaFaceDecode:
    def test_priors_and_decode(self):
        from stableanimator_tpu.preproc.face import RetinaFaceDetector as R

        priors = R._make_priors(64, 64)
        # 64/8=8 -> 8*8*2 + 4*4*2 + 2*2*2 anchors
        assert priors.shape == (128 + 32 + 8, 4)
        # first anchor: cell (0,0), min_size 16 at stride 8
        np.testing.assert_allclose(priors[0],
                                   [0.5 * 8 / 64, 0.5 * 8 / 64,
                                    16 / 64, 16 / 64])
        # zero regression decodes to the prior box itself (cxcywh -> xyxy)
        boxes = R.decode_boxes(np.zeros((len(priors), 4), np.float32), priors)
        np.testing.assert_allclose(
            boxes[0], [priors[0, 0] - priors[0, 2] / 2,
                       priors[0, 1] - priors[0, 3] / 2,
                       priors[0, 0] + priors[0, 2] / 2,
                       priors[0, 1] + priors[0, 3] / 2], rtol=1e-6)
        # variance semantics: dx shifts center by v0*dx*prior_w
        loc = np.zeros((len(priors), 4), np.float32)
        loc[0, 0] = 1.0
        shifted = R.decode_boxes(loc, priors)
        np.testing.assert_allclose(
            shifted[0, 0] - boxes[0, 0], 0.1 * priors[0, 2], rtol=1e-5)

    def test_end_to_end_with_standin_network(self):
        """Full __call__ path against a stub network emitting one confident
        detection at a known prior."""
        from stableanimator_tpu.preproc.face import RetinaFaceDetector as R

        det = R.__new__(R)
        det.input_size = (64, 64)
        det.nms_thresh = 0.4
        det._priors = R._make_priors(64, 64)
        n = len(det._priors)

        def fake_fn(blob):
            loc = np.zeros((1, n, 4), np.float32)
            conf = np.zeros((1, n, 2), np.float32)
            conf[:, :, 0] = 1.0
            conf[0, 5, 1] = 0.99  # one hit
            landms = np.zeros((1, n, 10), np.float32)
            return [loc, conf, landms]

        det._fn = fake_fn
        img = np.zeros((64, 64, 3), np.uint8)
        out = det(img, det_thresh=0.97)
        assert out.shape == (1, 5)
        p = det._priors[5]
        np.testing.assert_allclose(
            out[0, :4],
            np.array([p[0] - p[2] / 2, p[1] - p[3] / 2,
                      p[0] + p[2] / 2, p[1] + p[3] / 2]) * 64, rtol=1e-5)
        assert det(img, det_thresh=0.999).shape == (0, 5)


class TestNativeRaster:
    """Byte-exactness of the first-party C++ raster (native/raster.cpp) vs
    OpenCV on the primitives the reference render path uses
    (skeleton_extraction.py:16-100). The classic-vs-cv2-5.0 thick-line
    caveat (raster.cpp header) only affects strokes whose quad crosses the
    canvas border, so thick-line fuzzing keeps endpoints thickness+2 px
    inside — exactly the regime draw_pose operates in."""

    def _skip_unless_built(self):
        from stableanimator_tpu.preproc import native_raster as nr

        if not nr.available():
            pytest.skip("native raster not built (no toolchain)")
        return nr

    def test_ellipse_byte_exact(self):
        import cv2
        nr = self._skip_unless_built()
        rng = np.random.default_rng(0)
        for _ in range(60):
            base = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
            c1, c2 = base.copy(), base.copy()
            cx, cy = int(rng.integers(-10, 110)), int(rng.integers(-10, 90))
            a, b = int(rng.integers(0, 40)), int(rng.integers(0, 12))
            ang = int(rng.integers(-360, 360))
            color = tuple(int(v) for v in rng.integers(0, 256, 3))
            poly = cv2.ellipse2Poly((cx, cy), (a, b), ang, 0, 360, 1)
            cv2.fillConvexPoly(c1, poly, color)
            nr.fill_ellipse(c2, (cx, cy), (a, b), ang, color)
            np.testing.assert_array_equal(c1, c2)

    def test_circle_and_poly_byte_exact(self):
        import cv2
        nr = self._skip_unless_built()
        rng = np.random.default_rng(1)
        for _ in range(60):
            base = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
            c1, c2 = base.copy(), base.copy()
            color = tuple(int(v) for v in rng.integers(0, 256, 3))
            cx, cy, r = (int(rng.integers(-5, 105)), int(rng.integers(-5, 85)),
                         int(rng.integers(0, 10)))
            cv2.circle(c1, (cx, cy), r, color, thickness=-1)
            nr.fill_circle(c2, cx, cy, r, color)
            np.testing.assert_array_equal(c1, c2)
            pts = rng.integers(-10, 110, (4, 2))
            hull = cv2.convexHull(pts.astype(np.int32)).reshape(-1, 2)
            cv2.fillConvexPoly(c1, hull, color)
            nr.fill_convex_poly(c2, hull.astype(np.int64), color)
            np.testing.assert_array_equal(c1, c2)

    def test_thick_line_byte_exact_interior(self):
        import cv2
        nr = self._skip_unless_built()
        rng = np.random.default_rng(2)
        for _ in range(120):
            base = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
            c1, c2 = base.copy(), base.copy()
            color = tuple(int(v) for v in rng.integers(0, 256, 3))
            t = int(rng.integers(2, 6))
            m = t + 2
            x0, y0 = int(rng.integers(m, 100 - m)), int(rng.integers(m, 80 - m))
            x1, y1 = int(rng.integers(m, 100 - m)), int(rng.integers(m, 80 - m))
            cv2.line(c1, (x0, y0), (x1, y1), color, thickness=t)
            nr.draw_line(c2, x0, y0, x1, y1, t, color)
            np.testing.assert_array_equal(c1, c2)

    def test_scale_canvas_byte_exact(self):
        nr = self._skip_unless_built()
        base = np.random.default_rng(3).integers(
            0, 255, (64, 64, 3)).astype(np.uint8)
        want = (base * 0.6).astype(np.uint8)
        got = base.copy()
        nr.scale_canvas(got, 0.6)
        np.testing.assert_array_equal(want, got)

    def test_native_draw_pose_byte_identical_to_cv2(self):
        self._skip_unless_built()
        pose = TestRendering()._pose()
        for hh, ww in ((128, 96), (512, 512)):
            a = draw_pose(pose, hh, ww, backend="cv2")
            b = draw_pose(pose, hh, ww, backend="native")
            np.testing.assert_array_equal(a, b)


class TestGeometryParityVsCv2:
    """First-party geometry (preproc/geometry.py) vs the OpenCV oracle —
    the package no longer imports cv2 anywhere on its main paths (SURVEY
    §2.3 native-dep exit), so these pin the replacement semantics."""

    def test_resize_bilinear_byte_identical(self):
        import cv2

        from stableanimator_tpu.preproc.geometry import resize_bilinear

        rng = np.random.default_rng(0)
        cases = [((100, 80, 3), (640, 640)), ((640, 640, 3), (192, 256)),
                 ((2160, 2160, 3), (512, 512)), ((7, 5), (33, 44)),
                 ((33, 44, 3), (7, 5)), ((64, 64, 3), (64, 64))]
        for shape, (w2, h2) in cases:
            img = rng.integers(0, 256, shape, np.uint8)
            ours = resize_bilinear(img, (w2, h2))
            ref = cv2.resize(img, (w2, h2), interpolation=cv2.INTER_LINEAR)
            np.testing.assert_array_equal(ours, ref, err_msg=str(shape))
        # fuzz
        for _ in range(25):
            h, w = rng.integers(2, 260, 2)
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            w2, h2 = (int(x) for x in rng.integers(2, 300, 2))
            np.testing.assert_array_equal(
                resize_bilinear(img, (w2, h2)),
                cv2.resize(img, (w2, h2), interpolation=cv2.INTER_LINEAR))

    def test_warp_affine_matches_cv2_within_rounding(self):
        """cv2 5.0's rewritten warp engine is float-based; our float32
        re-implementation matches except off-by-one at exact rounding
        boundaries (<0.1% of pixels, pinned here). The downstream
        consumers (RTMPose crop normalise, ArcFace alignment) are
        insensitive at this level."""
        import cv2

        from stableanimator_tpu.preproc.geometry import warp_affine

        rng = np.random.default_rng(1)
        for _ in range(20):
            h, w = rng.integers(8, 160, 2)
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            src = rng.uniform(0, [w, h], (3, 2)).astype(np.float32)
            dst = rng.uniform(0, [w, h], (3, 2)).astype(np.float32)
            m = cv2.getAffineTransform(src, dst)
            w2, h2 = (int(x) for x in rng.integers(4, 200, 2))
            ours = warp_affine(img, m, (w2, h2))
            ref = cv2.warpAffine(img, m, (w2, h2), flags=cv2.INTER_LINEAR)
            d = np.abs(ours.astype(int) - ref.astype(int))
            assert d.max() <= 1, d.max()
            assert (d > 0).mean() < 1e-3, (d > 0).mean()

    def test_affine_solves_match_cv2(self):
        import cv2

        from stableanimator_tpu.preproc.geometry import (
            get_affine_transform,
            invert_affine,
        )

        rng = np.random.default_rng(2)
        for _ in range(10):
            src = rng.uniform(0, 100, (3, 2)).astype(np.float32)
            dst = rng.uniform(0, 100, (3, 2)).astype(np.float32)
            ref = cv2.getAffineTransform(src, dst)
            np.testing.assert_allclose(get_affine_transform(src, dst), ref,
                                       atol=1e-8)
            np.testing.assert_allclose(invert_affine(ref),
                                       cv2.invertAffineTransform(ref),
                                       atol=1e-10)

    def test_fill_rect_matches_cv2_filled_rectangle(self):
        import cv2

        from stableanimator_tpu.preproc.geometry import fill_rect

        for box in [(2, 3, 10, 12), (-5, -5, 4, 4), (60, 60, 80, 80),
                    (10, 10, 10, 10)]:
            a = np.zeros((64, 64), np.uint8)
            b = np.zeros((64, 64), np.uint8)
            fill_rect(a, box[:2], box[2:], 255)
            cv2.rectangle(b, box[:2], box[2:], 255, thickness=cv2.FILLED)
            np.testing.assert_array_equal(a, b, err_msg=str(box))


class TestFirstPartyMp4:
    def test_mjpeg_mp4_decodes_with_cv2(self, tmp_path):
        """The first-party MJPEG muxer (utils/mp4.py) must produce a file
        standard decoders accept: frame count, fps, and JPEG-level pixel
        fidelity checked by decoding with OpenCV's ffmpeg backend."""
        import cv2

        from stableanimator_tpu.utils.mp4 import write_mp4_mjpeg

        rng = np.random.default_rng(0)
        frames = [cv2.GaussianBlur(
            rng.integers(0, 256, (48, 64, 3), np.uint8), (9, 9), 3)
            for _ in range(5)]
        path = str(tmp_path / "clip.mp4")
        write_mp4_mjpeg(frames, path, fps=8)
        cap = cv2.VideoCapture(path)
        assert cap.get(cv2.CAP_PROP_FPS) == 8.0
        n = 0
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            err = np.abs(fr.astype(int)
                         - frames[n][..., ::-1].astype(int)).mean()
            assert err < 6.0, err  # JPEG q90 on smooth content
            n += 1
        cap.release()
        assert n == len(frames)

    def test_export_to_mp4_falls_back_without_cv2(self, tmp_path,
                                                  monkeypatch):
        import builtins

        from stableanimator_tpu.utils import image as uimg

        real_import = builtins.__import__

        def no_cv2(name, *a, **k):
            if name == "cv2":
                raise ImportError("blocked")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_cv2)
        frames = [np.full((32, 32, 3), i * 40, np.uint8) for i in range(4)]
        path = str(tmp_path / "fb.mp4")
        uimg.export_to_mp4(frames, path, fps=8)
        data = open(path, "rb").read()
        assert b"ftyp" in data[:16] and b"moov" in data and b"mdat" in data


class TestExtractorWriteParity:
    """The training- and inference-path CLIs must write byte-identical
    renders for the same pose (round-1 bug: the training walker wrote
    channel-flipped pixels, diverging from the reference
    training_skeleton_extraction.py:165-167)."""

    def test_training_cli_write_matches_inference_convention(
            self, tmp_path, monkeypatch):
        import cv2

        from stableanimator_tpu.cli import extract_training_skeletons as cli
        from stableanimator_tpu.preproc import skeleton_extraction as se

        pose = TestRendering()._pose()

        class FakeDetector:
            def __init__(self, *a, **k):
                pass

            def __call__(self, image_rgb):
                return pose

        monkeypatch.setattr(
            "stableanimator_tpu.preproc.wholebody.WholebodyDetector",
            FakeDetector)

        # dataset layout: {root}/{name}/images/*.png
        images = tmp_path / "clip0" / "images"
        images.mkdir(parents=True)
        rng = np.random.default_rng(0)
        cv2.imwrite(str(images / "00001.png"),
                    rng.integers(0, 255, (128, 96, 3)).astype(np.uint8))

        monkeypatch.setattr(
            "sys.argv",
            ["prog", "--video_folder", str(tmp_path), "--dwpose_dir", "x"])
        cli.main()

        out = tmp_path / "clip0" / "poses" / "00001.png"
        assert out.exists()
        written = cv2.imread(str(out))

        # inference-path save convention (cli/extract_skeleton.py): raw
        # transpose of the CHW render, no channel flip
        maps = se.get_image_pose(FakeDetector(), np.zeros((128, 96, 3), np.uint8))
        ref_path = tmp_path / "ref.png"
        cv2.imwrite(str(ref_path), np.transpose(maps, (1, 2, 0)))
        expected = cv2.imread(str(ref_path))

        np.testing.assert_array_equal(written, expected)


class TestBatchedPreprocParity:
    """The batched clip path (one XLA call per network per clip) must produce
    exactly the serial per-frame results — it is a pure batching change
    (VERDICT.md next-round #6; the reference loops both networks serially,
    onnxpose.py:353-359)."""

    def _detector(self, tmp_path):
        from stableanimator_tpu.preproc.wholebody import WholebodyDetector

        torch.manual_seed(3)
        det_path = _export(tmp_path, _YoloxStandin(),
                           (torch.randn(1, 3, 64, 64),), name="det.onnx")

        class RtmStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 8, 16, stride=16)
                self.fx = nn.Linear(8 * 4 * 3, 133 * 96)
                self.fy = nn.Linear(8 * 4 * 3, 133 * 128)

            def forward(self, x):
                y = self.conv(x).flatten(1)
                return (self.fx(y).reshape(-1, 133, 96),
                        self.fy(y).reshape(-1, 133, 128))

        pose_path = _export(tmp_path, RtmStandin(),
                            (torch.randn(1, 3, 64, 48),), name="pose.onnx")
        wb = WholebodyDetector(det_path, pose_path)
        wb.detector.input_size = (64, 64)
        wb.pose.input_size = (48, 64)
        return wb

    def test_video_poses_matches_serial(self, tmp_path):
        wb = self._detector(tmp_path)
        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 255, (96, 72, 3), dtype=np.uint8)
                  for _ in range(3)]
        batched = wb.video_poses(frames)
        serial = [wb(f) for f in frames]
        assert len(batched) == len(serial)
        for b, s in zip(batched, serial):
            np.testing.assert_allclose(b["bodies"]["candidate"],
                                       s["bodies"]["candidate"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(b["hands"], s["hands"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(b["faces"], s["faces"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(b["bodies"]["subset"],
                                          s["bodies"]["subset"])

    def test_detect_batch_matches_serial(self, tmp_path):
        wb = self._detector(tmp_path)
        rng = np.random.default_rng(8)
        frames = [rng.integers(0, 255, (80, 64, 3), dtype=np.uint8)
                  for _ in range(5)]
        batched = wb.detector.detect_batch(frames, score_thr=-10.0,
                                           final_thr=-10.0)
        serial = [wb.detector(f, score_thr=-10.0, final_thr=-10.0)
                  for f in frames]
        for b, s in zip(batched, serial):
            np.testing.assert_allclose(b, s, rtol=1e-4, atol=1e-4)


class TestFaceAnalyzer:
    """FaceAnalysis('antelopev2')-equivalent: every auxiliary model in the
    five-pack (2d106det / 1k3d68 / genderage) decoded per the insightface
    conventions (reference face_model.py:12-16 loads all five)."""

    def _write_pack(self, d):
        torch.manual_seed(4)

        class ScrfdStandin(nn.Module):
            def __init__(self):
                super().__init__()
                self.heads = nn.ModuleList([
                    nn.Conv2d(3, 2 * 15, s, stride=s) for s in (8, 16, 32)])

            def forward(self, x):
                outs_s, outs_b, outs_k = [], [], []
                for head in self.heads:
                    y = head(x)
                    b, c, hh, ww = y.shape
                    y = y.reshape(1, 2, 15, hh, ww).permute(0, 3, 4, 1, 2)
                    y = y.reshape(1, hh * ww * 2, 15)
                    outs_s.append((y[..., :1] + 1.0).sigmoid().reshape(-1, 1))
                    outs_b.append(y[..., 1:5].abs().reshape(-1, 4) * 4.0)
                    outs_k.append(y[..., 5:].reshape(-1, 10))
                return tuple(outs_s) + tuple(outs_b) + tuple(outs_k)

        class Lmk(nn.Module):
            def __init__(self, n):
                super().__init__()
                self.conv = nn.Conv2d(3, 4, 32, stride=32)
                self.fc = nn.Linear(4 * 6 * 6, n)

            def forward(self, x):
                return torch.tanh(self.fc(self.conv(x).flatten(1)))

        class GA(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 4, 16, stride=16)
                self.fc = nn.Linear(4 * 6 * 6, 3)

            def forward(self, x):
                return torch.sigmoid(self.fc(self.conv(x).flatten(1)))

        _export(d, ScrfdStandin(), (torch.zeros(1, 3, 64, 64),),
                name="scrfd_10g_bnkps.onnx")
        _export(d, Lmk(212), (torch.zeros(1, 3, 192, 192),),
                name="2d106det.onnx")
        _export(d, Lmk(204), (torch.zeros(1, 3, 192, 192),),
                name="1k3d68.onnx")
        _export(d, GA(), (torch.zeros(1, 3, 96, 96),), name="genderage.onnx")

    def test_full_pack_analysis(self, tmp_path):
        from stableanimator_tpu.preproc.face import FaceAnalyzer

        self._write_pack(tmp_path)
        an = FaceAnalyzer(str(tmp_path))
        an.detector.input_size = (64, 64)
        img = np.random.default_rng(4).integers(0, 255, (128, 128, 3),
                                                dtype=np.uint8)
        faces = an(img)
        assert len(faces) >= 1
        f = faces[0]
        assert f["landmark_2d_106"].shape == (106, 2)
        assert f["landmark_3d_68"].shape == (68, 3)
        assert f["gender"] in (0, 1) and 0 <= f["age"] <= 100
        # tanh outputs in [-1,1] -> landmarks stay inside ~the 1.5x-padded
        # bbox neighbourhood after the inverse crop transform
        bb = f["bbox"]
        side = 1.5 * max(bb[2] - bb[0], bb[3] - bb[1])
        cx, cy = (bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2
        lm = f["landmark_2d_106"]
        assert np.all(np.abs(lm[:, 0] - cx) <= side)
        assert np.all(np.abs(lm[:, 1] - cy) <= side)

    def test_missing_aux_models_are_optional(self, tmp_path):
        from stableanimator_tpu.preproc.face import FaceAnalyzer

        self._write_pack(tmp_path)
        for n in ("2d106det.onnx", "1k3d68.onnx", "genderage.onnx"):
            (tmp_path / n).unlink()
        an = FaceAnalyzer(str(tmp_path))
        an.detector.input_size = (64, 64)
        img = np.random.default_rng(5).integers(0, 255, (96, 96, 3),
                                                dtype=np.uint8)
        faces = an(img)
        for f in faces:
            assert "landmark_2d_106" not in f and "gender" not in f
