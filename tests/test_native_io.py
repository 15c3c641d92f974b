"""Native (C++) scene-I/O parity with the Python parsers."""

import numpy as np
import pytest

from mvs_gaussian_splatting_tpu import native
from mvs_gaussian_splatting_tpu.data import colmap


@pytest.fixture(scope="module")
def scene_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("colmap")
    rng = np.random.RandomState(0)
    cams = {1: colmap.CameraIntrinsics(1, "PINHOLE", 640, 480,
                                       np.array([500.0, 500.0, 320.0, 240.0])),
            2: colmap.CameraIntrinsics(2, "SIMPLE_PINHOLE", 320, 240,
                                       np.array([250.0, 160.0, 120.0]))}
    images = {}
    for i in range(5):
        q = rng.randn(4); q /= np.linalg.norm(q)
        images[i + 1] = colmap.ImageExtrinsics(i + 1, q, rng.randn(3),
                                               1 + i % 2, f"img_{i:03d}.png")
    xyz = rng.randn(100, 3)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    colmap.write_cameras_binary(cams, str(d / "cameras.bin"))
    colmap.write_images_binary(images, str(d / "images.bin"))
    colmap.write_points3d_binary(xyz, rgb, str(d / "points3D.bin"))
    return d, cams, images, xyz, rgb


def test_native_builds():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    assert lib is not None


def test_points_parity(scene_files):
    d, _, _, xyz, rgb = scene_files
    if native.load() is None:
        pytest.skip("no native lib")
    out = native.read_points3d(str(d / "points3D.bin"))
    assert out is not None
    nxyz, nrgb, nerr = out
    np.testing.assert_allclose(nxyz, xyz, atol=1e-12)
    np.testing.assert_array_equal(nrgb, rgb)


def test_images_parity(scene_files):
    d, _, images, _, _ = scene_files
    if native.load() is None:
        pytest.skip("no native lib")
    out = native.read_images(str(d / "images.bin"))
    assert out is not None
    assert set(out) == set(images)
    for k, (q, t, cid, name) in out.items():
        np.testing.assert_allclose(q, images[k].qvec, atol=1e-12)
        np.testing.assert_allclose(t, images[k].tvec, atol=1e-12)
        assert cid == images[k].camera_id
        assert name == images[k].name


def test_cameras_parity(scene_files):
    d, cams, _, _, _ = scene_files
    if native.load() is None:
        pytest.skip("no native lib")
    out = native.read_cameras(str(d / "cameras.bin"))
    assert out is not None
    for k, (model_id, w, h, params) in out.items():
        ref = cams[k]
        assert colmap.CAMERA_MODELS[model_id][0] == ref.model
        assert (w, h) == (ref.width, ref.height)
        np.testing.assert_allclose(params, ref.params, atol=1e-12)


def test_python_path_uses_native_transparently(scene_files):
    d, cams, images, xyz, rgb = scene_files
    # the public parsers must agree regardless of which path they took
    out_c = colmap.read_cameras_binary(str(d / "cameras.bin"))
    out_i = colmap.read_images_binary(str(d / "images.bin"))
    out_p = colmap.read_points3d_binary(str(d / "points3D.bin"))
    assert set(out_c) == set(cams) and set(out_i) == set(images)
    np.testing.assert_allclose(out_p[0], xyz, atol=1e-12)
