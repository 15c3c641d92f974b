"""User-level CLI workflow on an on-disk COLMAP scene.

The exact path a reference user runs (README.md quick start):
``train -s <scene> -m <out> --eval`` → ``render -m <out>`` →
``metrics -m <out>`` — here against a coherent synthetic COLMAP dataset
(orbiting pinhole cameras around known Gaussians, GT images rendered by the
jnp oracle, real 3-D init points), all through the CLI argument surface.
"""

import json
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mvs_gaussian_splatting_tpu.data import colmap
from mvs_gaussian_splatting_tpu.ops import (CameraView, preprocess,
                                            rasterize_reference)
from mvs_gaussian_splatting_tpu.utils import graphics

W, H = 64, 48
FOVX = math.radians(60.0)


def _rotmat2qvec(R):
    """World-to-camera rotation matrix → COLMAP qvec (w, x, y, z).

    Shepperd's method: pick the largest of (trace, R00, R11, R22) so the
    divisor is always well-conditioned (orbit poses include near-180°
    rotations where the naive trace formula degenerates)."""
    t = R[0, 0] + R[1, 1] + R[2, 2]
    if t > max(R[0, 0], R[1, 1], R[2, 2]):
        w = math.sqrt(1.0 + t) / 2.0
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    elif R[0, 0] >= max(R[1, 1], R[2, 2]):
        x = math.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) / 2.0
        w = (R[2, 1] - R[1, 2]) / (4 * x)
        y = (R[0, 1] + R[1, 0]) / (4 * x)
        z = (R[0, 2] + R[2, 0]) / (4 * x)
    elif R[1, 1] >= R[2, 2]:
        y = math.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) / 2.0
        w = (R[0, 2] - R[2, 0]) / (4 * y)
        x = (R[0, 1] + R[1, 0]) / (4 * y)
        z = (R[1, 2] + R[2, 1]) / (4 * y)
    else:
        z = math.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) / 2.0
        w = (R[1, 0] - R[0, 1]) / (4 * z)
        x = (R[0, 2] + R[2, 0]) / (4 * z)
        y = (R[1, 2] + R[2, 1]) / (4 * z)
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


@pytest.fixture(scope="module")
def colmap_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_scene")
    os.makedirs(d / "sparse/0")
    os.makedirs(d / "images")
    rng = np.random.RandomState(7)
    n = 32
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.1, 0.3, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)

    focal = graphics.fov2focal(FOVX, W)
    fovy = graphics.focal2fov(focal, H)
    cams = {1: colmap.CameraIntrinsics(
        1, "PINHOLE", W, H, np.array([focal, focal, W / 2, H / 2]))}
    images = {}
    for v in range(9):
        ang = 2 * math.pi * v / 9
        eye = np.array([4.0 * math.sin(ang), 0.0, -4.0 * math.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R_w2c = np.stack([right, np.cross(fwd, right), fwd])
        tvec = -R_w2c @ eye
        W2V = graphics.world_to_view(R_w2c.T, tvec)
        P = graphics.projection_matrix(0.01, 100.0, FOVX, fovy)
        cv = CameraView(jnp.asarray(W2V), jnp.asarray(P @ W2V),
                        jnp.asarray(np.linalg.inv(W2V)[:3, 3].astype(np.float32)),
                        jnp.float32(math.tan(FOVX / 2)),
                        jnp.float32(math.tan(fovy / 2)))
        p = preprocess(jnp.asarray(means), jnp.asarray(opac), cv, W, H,
                       scales=jnp.asarray(scales),
                       rotations=jnp.asarray(quats),
                       colors_precomp=jnp.asarray(colors))
        img = np.asarray(rasterize_reference(p, W, H, jnp.zeros(3)))
        Image.fromarray((np.clip(img, 0, 1).transpose(1, 2, 0) * 255)
                        .astype(np.uint8)).save(d / "images" / f"r_{v}.png")
        images[v + 1] = colmap.ImageExtrinsics(
            v + 1, _rotmat2qvec(R_w2c), tvec, 1, f"r_{v}.png")

    colmap.write_cameras_binary(cams, str(d / "sparse/0/cameras.bin"))
    colmap.write_images_binary(images, str(d / "sparse/0/images.bin"))
    pts = means + rng.randn(n, 3).astype(np.float32) * 0.05
    colmap.write_points3d_binary(
        pts, (np.clip(colors, 0, 1) * 255).astype(np.uint8),
        str(d / "sparse/0/points3D.bin"))
    return d


class TestCLIWorkflow:
    @pytest.fixture(scope="class")
    def trained_model(self, colmap_dataset, tmp_path_factory):
        from mvs_gaussian_splatting_tpu.cli import train as train_cli
        model = str(tmp_path_factory.mktemp("out") / "model")
        train_cli.main([
            "-s", str(colmap_dataset), "-m", model, "--eval",
            "--iterations", "60", "--densify_from_iter", "25",
            "--densification_interval", "20", "--densify_until_iter", "55",
            "--opacity_reset_interval", "3000",
            "--position_lr_max_steps", "60",
            "--test_iterations", "1", "60",
            "--save_iterations", "60",
            "--backend", "jnp", "--tile_capacity", "128",
            "--max_tiles_per_gaussian", "16", "--tile_batch", "16",
        ])
        return model

    def test_train_artifacts(self, trained_model):
        for f in ("cameras.json", "cfg_args.json", "input.ply",
                  "point_cloud/iteration_60/point_cloud.ply"):
            assert os.path.exists(os.path.join(trained_model, f)), f

    def test_render_cli(self, trained_model):
        from mvs_gaussian_splatting_tpu.cli import render as render_cli
        render_cli.main(["-m", trained_model])
        renders = os.path.join(trained_model, "test", "ours_60", "renders")
        gts = os.path.join(trained_model, "test", "ours_60", "gt")
        # 9 cams, every-8th held out → 2 test views
        assert len(os.listdir(renders)) == 2
        assert len(os.listdir(gts)) == 2
        assert len(os.listdir(os.path.join(
            trained_model, "train", "ours_60", "renders"))) == 7

    def test_metrics_cli(self, trained_model):
        from mvs_gaussian_splatting_tpu.eval import metrics
        metrics.main(["-m", trained_model])
        with open(os.path.join(trained_model, "results.json")) as f:
            results = json.load(f)
        entry = results["ours_60"]
        assert entry["PSNR"] > 18.0, entry
        assert 0.0 < entry["SSIM"] <= 1.0
        with open(os.path.join(trained_model, "per_view.json")) as f:
            per_view = json.load(f)
        assert len(per_view["ours_60"]["PSNR"]) == 2
