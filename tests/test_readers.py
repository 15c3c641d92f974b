"""Scene reader tests over synthetic on-disk fixtures."""

import json
import math
import os

import numpy as np
import pytest
from PIL import Image

from mvs_gaussian_splatting_tpu.data import colmap
from mvs_gaussian_splatting_tpu.data.cameras import resolve_resolution
from mvs_gaussian_splatting_tpu.data.readers import (read_blender_scene,
                                                     read_colmap_scene,
                                                     read_scene)


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    os.makedirs(d / "sparse/0")
    os.makedirs(d / "images")
    rng = np.random.RandomState(0)
    focal = 50.0
    cams = {1: colmap.CameraIntrinsics(1, "PINHOLE", 64, 48,
                                       np.array([focal, focal, 32.0, 24.0]))}
    images = {}
    for i in range(9):
        q = rng.randn(4); q /= np.linalg.norm(q)
        images[i + 1] = colmap.ImageExtrinsics(i + 1, q, rng.randn(3), 1,
                                               f"im_{i:02d}.png")
        Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
            d / "images" / f"im_{i:02d}.png")
    colmap.write_cameras_binary(cams, str(d / "sparse/0/cameras.bin"))
    colmap.write_images_binary(images, str(d / "sparse/0/images.bin"))
    colmap.write_points3d_binary(rng.randn(30, 3),
                                 (rng.rand(30, 3) * 255).astype(np.uint8),
                                 str(d / "sparse/0/points3D.bin"))
    return d


class TestColmapScene:
    def test_reads_and_splits(self, colmap_scene):
        info = read_colmap_scene(str(colmap_scene), eval_split=True)
        # every-8th held out (9 cams → 2 test at idx 0, 8)
        assert len(info.test_cameras) == 2
        assert len(info.train_cameras) == 7
        assert info.points.shape == (30, 3)
        assert info.nerf_normalization["radius"] > 0

    def test_dispatch(self, colmap_scene):
        info = read_scene(str(colmap_scene))
        assert len(info.train_cameras) == 9  # no eval split

    def test_points_ply_cached(self, colmap_scene):
        read_colmap_scene(str(colmap_scene))
        assert os.path.exists(colmap_scene / "sparse/0/points3D.ply")

    def test_fov_from_pinhole(self, colmap_scene):
        info = read_colmap_scene(str(colmap_scene))
        cam = info.train_cameras[0]
        assert cam.FovX == pytest.approx(2 * math.atan(64 / (2 * 50.0)))
        assert cam.FovY == pytest.approx(2 * math.atan(48 / (2 * 50.0)))


class TestBlenderScene:
    @pytest.fixture(scope="class")
    def blender_scene(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("blender")
        rng = np.random.RandomState(1)
        for split in ("train", "test"):
            frames = []
            for i in range(3):
                name = f"./{split}/r_{i}"
                os.makedirs(d / split, exist_ok=True)
                arr = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
                Image.fromarray(arr, "RGBA").save(d / split / f"r_{i}.png")
                c2w = np.eye(4)
                c2w[:3, 3] = rng.randn(3) * 2
                frames.append({"file_path": name,
                               "transform_matrix": c2w.tolist()})
            with open(d / f"transforms_{split}.json", "w") as f:
                json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
        return d

    def test_reads_and_composites_alpha(self, blender_scene):
        info = read_blender_scene(str(blender_scene), white_background=True,
                                  eval_split=True)
        assert len(info.train_cameras) == 3
        assert len(info.test_cameras) == 3
        # random init point cloud generated
        assert info.points.shape[0] == 100_000
        img = np.asarray(info.train_cameras[0].image)
        assert img.shape == (32, 32, 3)

    def test_dispatch(self, blender_scene):
        info = read_scene(str(blender_scene), white_background=False)
        assert len(info.train_cameras) == 6  # train+test merged without eval


class TestResolutionPolicy:
    def test_divisors(self):
        assert resolve_resolution(1600, 1200, 2) == (800, 600)
        assert resolve_resolution(1600, 1200, 8) == (200, 150)

    def test_cap_1600(self):
        w, h = resolve_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200

    def test_under_cap_untouched(self):
        assert resolve_resolution(1000, 800, -1) == (1000, 800)

    def test_target_width(self):
        assert resolve_resolution(2000, 1000, 500) == (500, 250)
