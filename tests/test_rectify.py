"""Stereo rectification: map construction vs cv2 (when available) and
round-trip behavior of the jitted bilinear remap."""
import numpy as np
import pytest

from multiagent_orb_slam2_tpu.io import rectify


def test_identity_map():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    D = np.zeros(5)
    R = np.eye(3)
    P = np.hstack([K, np.zeros((3, 1))])
    m = rectify.rectify_map(K, D, R, P, 64, 48)
    u, v = np.meshgrid(np.arange(64.0), np.arange(48.0))
    np.testing.assert_allclose(m[..., 0], u, atol=1e-4)
    np.testing.assert_allclose(m[..., 1], v, atol=1e-4)


def test_remap_identity_preserves_image():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    u, v = np.meshgrid(np.arange(64.0), np.arange(48.0))
    m = np.stack([u, v], -1).astype(np.float32)
    out = np.asarray(rectify.remap_bilinear(img, m))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_remap_shift():
    img = np.zeros((10, 10), np.float32)
    img[5, 5] = 1.0
    u, v = np.meshgrid(np.arange(10.0), np.arange(10.0))
    m = np.stack([u + 1.0, v], -1).astype(np.float32)  # sample one right
    out = np.asarray(rectify.remap_bilinear(img, m))
    assert out[5, 4] == pytest.approx(1.0)
    assert out[5, 5] == pytest.approx(0.0)


def test_against_cv2():
    cv2 = pytest.importorskip("cv2")
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    th = np.deg2rad(1.3)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    P = np.array([[435.2, 0, 367.4, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0]])
    W, H = 752, 480
    ours = rectify.rectify_map(K, D, R, P, W, H)
    mx, my = cv2.initUndistortRectifyMap(K, D[:4], R, P, (W, H), cv2.CV_32FC1)
    np.testing.assert_allclose(ours[..., 0], mx, atol=2e-2)
    np.testing.assert_allclose(ours[..., 1], my, atol=2e-2)


def test_yaml_matrix_parse(tmp_path):
    from multiagent_orb_slam2_tpu.drivers import common
    y = tmp_path / "s.yaml"
    y.write_text("""%YAML:1.0
Camera.fx: 435.2
LEFT.height: 480
LEFT.width: 752
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
""")
    d = common._parse_opencv_yaml(str(y))
    assert d["Camera.fx"] == 435.2
    assert d["LEFT.K"].shape == (3, 3)
    assert d["LEFT.K"][0, 0] == pytest.approx(458.654)
    assert d["LEFT.D"].shape == (1, 5)
