"""MJPEG AVI writer (scade_tpu/utils/video.py): the container must be
readable frame-for-frame by cv2.VideoCapture with correct metadata."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from scade_tpu.utils.video import encode_frames_bgr, write_mjpeg_avi


def test_mjpeg_avi_roundtrip(tmp_path):
    frames = []
    for i in range(6):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:, : (i + 1) * 10] = (255, 128, 0)
        frames.append(f)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, encode_frames_bgr(frames), (64, 48), fps=5)

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    assert cap.get(cv2.CAP_PROP_FPS) == 5.0
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 6.0
    n = 0
    while True:
        ok, img = cap.read()
        if not ok:
            break
        assert img.shape == (48, 64, 3)
        # frame i paints the first (i+1)*10 columns orange (BGR 255,128,0)
        assert img[0, 5, 0] > 200
        edge = (n + 1) * 10
        if edge < 60:
            assert img[0, 62, 0] < 50, (n, img[0, 62])
        n += 1
    assert n == 6


def test_mjpeg_avi_odd_dimensions(tmp_path):
    # odd widths/heights must survive (no yuv420 2-divisibility constraint)
    frames = [np.full((33, 47, 3), 77, np.uint8) for _ in range(2)]
    path = str(tmp_path / "odd.avi")
    write_mjpeg_avi(path, encode_frames_bgr(frames), (47, 33), fps=3)
    cap = cv2.VideoCapture(path)
    ok, img = cap.read()
    assert ok and img.shape == (33, 47, 3)
    assert abs(int(img[10, 10, 1]) - 77) < 5
