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
