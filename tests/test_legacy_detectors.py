"""Legacy ControlNet-lineage detector wrappers (unaligned render path)."""

import numpy as np

from stableanimator_tpu.preproc.legacy_detectors import (
    DWposeDetector,
    DWposeDetectorOnlyOnePerson,
)


class _FakeWholebody:
    """Stands in for WholebodyDetector: two people, fixed keypoints."""

    def __init__(self, n_people=2):
        rng = np.random.default_rng(0)
        self._kpts = rng.uniform(10, 60, (n_people, 134, 2))
        self._scores = np.full((n_people, 134), 0.9)

    def keypoints(self, image_rgb):
        return self._kpts.copy(), self._scores.copy()


def _make(cls, n_people=2):
    det = cls.__new__(cls)
    det.wholebody = _FakeWholebody(n_people)
    return det


def test_legacy_detector_renders():
    det = _make(DWposeDetector)
    img = np.zeros((72, 72, 3), np.uint8)
    out = det(img)
    assert out.shape == (72, 72, 3)
    assert out.dtype == np.uint8
    assert out.max() > 0


def test_remain_face_toggles_face_dots():
    det = _make(DWposeDetector)
    img = np.zeros((72, 72, 3), np.uint8)
    with_face = det(img, remain_face=True)
    without = det(img, remain_face=False)
    # the face dots are white; removing them reduces bright pixels
    assert (with_face == 255).sum() >= (without == 255).sum()


def test_only_one_person_uses_first():
    multi = _make(DWposeDetector, n_people=2)
    single = _make(DWposeDetectorOnlyOnePerson, n_people=2)
    img = np.zeros((72, 72, 3), np.uint8)
    out_multi = multi(img)
    out_single = single(img)
    # the single-person variant draws strictly fewer or equal pixels
    assert (out_single > 0).sum() <= (out_multi > 0).sum()


class TestHandFaceDetect:
    """hand_detect / face_detect heuristics (reference util.py:155,221)."""

    def _body(self):
        # one person, keypoints in a 200x200 image
        candidate = np.zeros((18, 2), np.float64)
        candidate[2] = [140, 60]   # right shoulder
        candidate[3] = [150, 100]  # right elbow
        candidate[4] = [155, 140]  # right wrist
        candidate[5] = [60, 60]    # left shoulder
        candidate[6] = [50, 100]   # left elbow
        candidate[7] = [45, 140]   # left wrist
        candidate[0] = [100, 40]   # nose
        candidate[14] = [92, 35]   # right eye
        candidate[15] = [108, 35]  # left eye
        candidate[16] = [85, 40]   # right ear
        candidate[17] = [115, 40]  # left ear
        subset = np.arange(18, dtype=np.float64)[None]
        return candidate, subset

    def test_hand_boxes_both_hands(self):
        from stableanimator_tpu.preproc.legacy_detectors import hand_detect

        candidate, subset = self._body()
        boxes = hand_detect(candidate, subset, (200, 200, 3))
        assert len(boxes) == 2
        # left first (reference order), square boxes >= 20px
        assert boxes[0][3] is True and boxes[1][3] is False
        for x, y, w, _ in boxes:
            assert w >= 20 and x >= 0 and y >= 0
        # wrist extrapolation: box center is beyond the wrist, away from
        # the elbow
        x, y, w, _ = boxes[0]
        cx, cy = x + w / 2, y + w / 2
        assert cy > 140  # wrist y, extended downward

    def test_hand_requires_full_arm(self):
        from stableanimator_tpu.preproc.legacy_detectors import hand_detect

        candidate, subset = self._body()
        subset[0, [2, 5]] = -1  # both shoulders invisible
        assert hand_detect(candidate, subset, (200, 200, 3)) == []

    def test_face_box_geometry(self):
        from stableanimator_tpu.preproc.legacy_detectors import face_detect

        candidate, subset = self._body()
        boxes = face_detect(candidate, subset, (200, 200, 3))
        assert len(boxes) == 1
        x, y, w = boxes[0]
        # width driven by the eye distance: max(|100-92|,|40-35|)*3 = 24
        # (beats the ear term 15*1.5 = 22.5) -> x = 100-24, y = 40-24, w = 48
        assert (x, y) == (76, 16)
        assert w == 48

    def test_face_requires_nose_and_feature(self):
        from stableanimator_tpu.preproc.legacy_detectors import face_detect

        candidate, subset = self._body()
        subset[0, [14, 15, 16, 17]] = -1
        assert face_detect(candidate, subset, (200, 200, 3)) == []
        candidate, subset = self._body()
        subset[0, 0] = -1
        assert face_detect(candidate, subset, (200, 200, 3)) == []
