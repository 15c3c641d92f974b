"""End-to-end training integration test on a synthetic scene (CPU).

Mirrors the reference's empirical QA (SURVEY §4): N iterations of the full
loop — render, loss, backward, Adam, densify, opacity reset — must drive
train-view PSNR up on a scene whose ground truth was rendered from a known
Gaussian set.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mvs_gaussian_splatting_tpu.data.readers import CameraInfo, SceneInfo
from mvs_gaussian_splatting_tpu.data.scene import Scene
from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess, rasterize_reference
from mvs_gaussian_splatting_tpu.train import (ModelConfig, OptimizationConfig,
                                              PipelineConfig)
from mvs_gaussian_splatting_tpu.train.config import TrainRunConfig
from mvs_gaussian_splatting_tpu.train.loop import train
from mvs_gaussian_splatting_tpu.utils import graphics

W = H = 64
FOVX = math.radians(60.0)


def _camera_pose(angle: float, radius: float = 4.0):
    """Camera on a circle in the xz-plane looking at the origin."""
    eye = np.array([radius * math.sin(angle), 0.0, -radius * math.cos(angle)])
    forward = -eye / np.linalg.norm(eye)        # toward origin (+z at angle=0)
    up = np.array([0.0, -1.0, 0.0])             # y-down convention
    right = np.cross(up, forward); right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    R_w2c = np.stack([right, true_up, forward])  # rows = camera axes
    t = -R_w2c @ eye
    # reference stores R = W2C^T (C2W rotation)
    return R_w2c.T, t


def make_synthetic_scene(n_views=6, n_gauss=40, seed=3):
    rng = np.random.RandomState(seed)
    fovy = graphics.focal2fov(graphics.fov2focal(FOVX, W), H)
    means = rng.uniform(-0.8, 0.8, (n_gauss, 3)).astype(np.float32)
    scales = rng.uniform(0.08, 0.25, (n_gauss, 3)).astype(np.float32)
    quats = rng.randn(n_gauss, 4).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, n_gauss).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n_gauss, 3)).astype(np.float32)

    infos = []
    for v in range(n_views):
        R, T = _camera_pose(2 * math.pi * v / n_views)
        W2V = graphics.world_to_view(R, T)
        P = graphics.projection_matrix(0.01, 100.0, FOVX, fovy)
        cam = CameraView(jnp.asarray(W2V), jnp.asarray(P @ W2V),
                         jnp.asarray(np.linalg.inv(W2V)[:3, 3].astype(np.float32)),
                         jnp.float32(math.tan(FOVX / 2)),
                         jnp.float32(math.tan(fovy / 2)))
        p = preprocess(jnp.asarray(means), jnp.asarray(opac), cam, W, H,
                       scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
                       colors_precomp=jnp.asarray(colors))
        img = np.asarray(rasterize_reference(p, W, H, jnp.zeros(3)))
        pil = Image.fromarray((np.clip(img, 0, 1).transpose(1, 2, 0)
                               * 255).astype(np.uint8), "RGB")
        infos.append(CameraInfo(uid=v, R=R, T=T, FovY=fovy, FovX=FOVX,
                                image=pil, image_path=f"synth_{v}.png",
                                image_name=f"synth_{v}", width=W, height=H))

    # noisy init points near the truth
    pts = (means + rng.randn(n_gauss, 3).astype(np.float32) * 0.05)
    cols = np.full((n_gauss, 3), 0.5, np.float32)
    norm = {"translate": np.zeros(3), "radius": 4.4}
    return SceneInfo(points=pts, colors=cols, normals=np.zeros_like(pts),
                     train_cameras=infos[:-1], test_cameras=infos[-1:],
                     nerf_normalization=norm, ply_path="")


@pytest.fixture(scope="module")
def trained():
    scene_info = make_synthetic_scene()
    model_cfg = ModelConfig(sh_degree=3, model_path="")
    opt_cfg = OptimizationConfig(
        iterations=120, densify_from_iter=30, densification_interval=40,
        densify_until_iter=110, opacity_reset_interval=3000,
        position_lr_max_steps=120, initial_capacity_factor=4.0)
    pipe_cfg = PipelineConfig(backend="jnp", tile_capacity=128,
                              max_tiles_per_gaussian=16, tile_batch=16)
    run_cfg = TrainRunConfig(test_iterations=[1, 120], save_iterations=[],
                             checkpoint_iterations=[], log_every=10)
    scene = Scene(model_cfg, scene_info=scene_info)
    logs = []
    params, aux, scene, history = train(model_cfg, opt_cfg, pipe_cfg, run_cfg,
                                        scene=scene, log_fn=logs.append)
    return params, aux, history, logs


class TestEndToEnd:
    def test_psnr_improves(self, trained):
        _, _, history, _ = trained
        assert 1 in history["psnr_test"] and 120 in history["psnr_test"]
        first, last = history["psnr_test"][1], history["psnr_test"][120]
        assert last > first + 2.0, f"PSNR {first:.2f} → {last:.2f}"
        assert last > 20.0, f"final PSNR too low: {last:.2f}"

    def test_loss_decreases(self, trained):
        _, _, history, _ = trained
        losses = [v for _, v in history["loss"]]
        assert np.mean(losses[-3:]) < 0.65 * np.mean(losses[:3])

    def test_densification_ran(self, trained):
        params, aux, _, _ = trained
        from mvs_gaussian_splatting_tpu.models import num_alive
        # clone/split events should have changed the population from 40
        assert int(num_alive(aux)) != 0

    def test_params_finite(self, trained):
        params, aux, _, _ = trained
        for name, arr in params._asdict().items():
            if arr is not None:
                assert np.isfinite(np.asarray(arr)).all(), name


class TestCheckpoint:
    def test_resume_through_train(self, tmp_path):
        """Full-loop resume (reference train.py:40-42,53-54): train with a
        checkpoint, restart from it, and match a straight-through run's
        iteration accounting."""
        scene_info = make_synthetic_scene(n_views=3, n_gauss=20, seed=5)
        mcfg = ModelConfig(sh_degree=1, model_path=str(tmp_path / "m1"))
        ocfg = OptimizationConfig(iterations=40, densify_from_iter=15,
                                  densification_interval=10,
                                  densify_until_iter=35,
                                  opacity_reset_interval=3000,
                                  position_lr_max_steps=40)
        pcfg = PipelineConfig(backend="jnp", tile_capacity=128,
                              max_tiles_per_gaussian=16, tile_batch=16)
        rcfg = TrainRunConfig(test_iterations=[40], save_iterations=[],
                              checkpoint_iterations=[20], log_every=10)
        scene = Scene(mcfg, scene_info=scene_info)
        _, _, _, h1 = train(mcfg, ocfg, pcfg, rcfg, scene=scene,
                            log_fn=lambda s: None)
        chk = tmp_path / "m1" / "chkpnt20.npz"
        assert chk.exists()

        mcfg2 = ModelConfig(sh_degree=1, model_path=str(tmp_path / "m2"))
        rcfg2 = TrainRunConfig(test_iterations=[40], save_iterations=[],
                               start_checkpoint=str(chk), log_every=10)
        scene2 = Scene(mcfg2, scene_info=scene_info)
        _, _, _, h2 = train(mcfg2, ocfg, pcfg, rcfg2, scene=scene2,
                            log_fn=lambda s: None)
        # resumed run only covers iterations 21..40
        assert min(i for i, _ in h2["loss"]) > 20
        assert 40 in h2["psnr_test"]
        # resumed final quality in the same range as the uninterrupted run
        assert h2["psnr_test"][40] > h1["psnr_test"][40] - 2.0

    def test_roundtrip(self, tmp_path, trained):
        from mvs_gaussian_splatting_tpu.train.checkpoint import (load_checkpoint,
                                                                 save_checkpoint)
        from mvs_gaussian_splatting_tpu.train.optim import adam_init
        params, aux, _, _ = trained
        adam = adam_init(params)
        path = str(tmp_path / "chk.npz")
        save_checkpoint(path, params, adam, aux, 120, 2)
        p2, a2, aux2, it, sh = load_checkpoint(path)
        assert it == 120 and sh == 2
        np.testing.assert_array_equal(np.asarray(p2.xyz), np.asarray(params.xyz))
        np.testing.assert_array_equal(np.asarray(aux2.alive), np.asarray(aux.alive))
        assert int(a2.count) == 0
