"""FFHQ face alignment with synthetic landmarks (no dlib needed)."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.utils import face_preprocessing as fp


def _synthetic_landmarks(cx=100.0, cy=100.0, eye_dx=30.0, mouth_dy=40.0):
    """68-point layout with plausible eye/mouth geometry."""
    lm = np.zeros((68, 2))
    lm[36:42] = [cx - eye_dx, cy - 10]   # left eye cluster
    lm[42:48] = [cx + eye_dx, cy - 10]   # right eye cluster
    lm[48] = [cx - 15, cy + mouth_dy]    # mouth left corner
    lm[54] = [cx + 15, cy + mouth_dy]    # mouth right corner
    return lm


def test_align_face_produces_output(tmp_path):
    rng = np.random.RandomState(0)
    src = tmp_path / "face.jpg"
    arr = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
    arr[80:120, 60:140] = [220, 180, 160]  # a "face" patch
    Image.fromarray(arr).save(src)

    dst = tmp_path / "out" / "aligned.jpg"
    fp.align_face(str(src), _synthetic_landmarks(), str(dst), output_size=64,
                  transform_size=256)
    out = Image.open(dst)
    assert out.size == (64, 64)


def test_face_extraction_with_registered_detector(tmp_path):
    rng = np.random.RandomState(1)
    src = tmp_path / "f.jpg"
    Image.fromarray((rng.rand(160, 160, 3) * 255).astype(np.uint8)).save(src)

    fp.set_landmark_detector(lambda path: _synthetic_landmarks(80, 80, 20, 28))
    try:
        out = fp.face_extraction(str(src), dst_dir=str(tmp_path / "faces"),
                                 output_size=32)
        assert Image.open(out).size == (32, 32)
    finally:
        fp.set_landmark_detector(None)  # reset for other tests
        fp._detector = None


def test_face_extraction_without_detector_raises(tmp_path):
    rng = np.random.RandomState(2)
    src = tmp_path / "g.jpg"
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(src)
    fp._detector = None
    with pytest.raises((RuntimeError, Exception)):
        fp.detect_face_landmarks(str(src))
