"""Gaussian-sharded TRAIN step (parallel/gauss_train.py) on the virtual mesh.

The render-level exchange is covered by test_gauss_stream.py; these assert
the full training step — preprocess/binning/packing on N/D primitives per
device, all_to_all instance exchange, composite, backward through the
reversed exchange, sharded Adam, densification stats — is invariant to the
shard count and actually optimizes (VERDICT r3 item #3).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.parallel.gauss_train import make_gauss_train_step
from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
from mvs_gaussian_splatting_tpu.train.optim import adam_init
from mvs_gaussian_splatting_tpu.utils import graphics

W = H = 64
CFG = RasterConfig(max_tiles_per_gaussian=16, backend="stream")


def _camera():
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    w2c = np.eye(4, dtype=np.float32)
    return CameraView(jnp.asarray(w2c), jnp.asarray(P.astype(np.float32)),
                      jnp.zeros(3), jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.6, 0.6, (96, 3)).astype(np.float32) + [0, 0, 4.0]
    params, aux = init_from_pcd(pts, rng.rand(96, 3).astype(np.float32), 128,
                                sh_degree=1)
    adam = adam_init(params)
    gt = jnp.asarray(rng.rand(3, H, W).astype(np.float32)) * 0.5 + 0.25
    return params, adam, aux, gt


def _run_step(n_dev, params, adam, aux, gt, iters=1):
    mesh = make_mesh(n_dev, axes=("gauss",))
    step, place = make_gauss_train_step(OptimizationConfig(), CFG, 1.0, mesh,
                                        interpret=True)
    cam = _camera()
    bg = jnp.zeros(3)
    params, adam, aux, cam, gt, bg = place(params, adam, aux, cam, gt, bg)
    losses = []
    m = None
    for i in range(iters):
        params, adam, aux, m = step(params, adam, aux, cam, gt, bg,
                                    jnp.int32(i + 1), jnp.asarray(True),
                                    width=W, height=H, sh_degree=1)
        losses.append(float(m.loss))
    return params, adam, aux, m, losses


def test_step_invariant_to_shard_count():
    params, adam, aux, gt = _setup()
    p1, a1, x1, m1, l1 = _run_step(1, params, adam, aux, gt)
    p8, a8, x8, m8, l8 = _run_step(8, params, adam, aux, gt)
    assert np.isclose(l1[0], l8[0], rtol=1e-5)
    for leaf1, leaf8 in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(x1.xyz_grad_accum),
                               np.asarray(x8.xyz_grad_accum),
                               rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x1.denom), np.asarray(x8.denom))
    assert int(m1.n_visible) == int(m8.n_visible)


def test_gauss_parallel_training_reduces_loss():
    params, adam, aux, gt = _setup()
    _, _, _, _, losses = _run_step(8, params, adam, aux, gt, iters=30)
    assert losses[-1] < losses[0] * 0.96, losses


def test_rejects_non_stream_backend():
    mesh = make_mesh(2, axes=("gauss",))
    step, _ = make_gauss_train_step(
        OptimizationConfig(), CFG._replace(backend="jnp"), 1.0, mesh,
        interpret=True)
    params, adam, aux, gt = _setup()
    with pytest.raises(ValueError, match="stream"):
        step(params, adam, aux, _camera(), gt, jnp.zeros(3), jnp.int32(1),
             jnp.asarray(True), width=W, height=H, sh_degree=1)


def test_loop_runs_gauss_mode():
    """TrainRunConfig.gauss_parallel drives a full loop run."""
    from mvs_gaussian_splatting_tpu.data.scene import Scene
    from mvs_gaussian_splatting_tpu.train import (ModelConfig,
                                                  OptimizationConfig as OC,
                                                  PipelineConfig)
    from mvs_gaussian_splatting_tpu.train.config import TrainRunConfig
    from mvs_gaussian_splatting_tpu.train.loop import train
    from test_train_e2e import make_synthetic_scene

    scene_info = make_synthetic_scene(n_views=4, n_gauss=24, seed=12)
    model_cfg = ModelConfig(sh_degree=1, model_path="")
    opt_cfg = OC(iterations=6, densify_from_iter=100, densify_until_iter=0,
                 position_lr_max_steps=6)
    pipe_cfg = PipelineConfig(backend="auto", tile_w=16, tile_h=16,
                              max_tiles_per_gaussian=16)
    run_cfg = TrainRunConfig(test_iterations=[6], save_iterations=[],
                             gauss_parallel=8, log_every=100)
    logs = []
    scene = Scene(model_cfg, scene_info=scene_info)
    params, aux, scene, history = train(model_cfg, opt_cfg, pipe_cfg,
                                        run_cfg, scene=scene,
                                        log_fn=logs.append)
    assert any("gauss-parallel" in l for l in logs), logs
    assert 6 in history["psnr_test"]
    assert np.isfinite(history["psnr_test"][6])
