"""2D-mesh (cameras × tiles) train step (parallel/grid_train.py).

VERDICT r3 item #1: data_parallel and tile_parallel composed in ONE step.
Asserts on the 8-virtual-device CPU mesh:
- B=2 × tiles=4 parity vs the same step on a tiles=1 mesh (shard-count
  invariance of the tile axis, tight tolerance — same implementation), and
- cross-implementation parity vs the established camera-DP batch step
  (different composite backend: jnp scan vs stream-interpret kernels), and
- the full loop runs in grid mode (data_parallel>0 AND tile_parallel>0
  no longer raises).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.parallel.data_parallel import (
    make_batch_train_step, stack_cameras)
from mvs_gaussian_splatting_tpu.parallel.grid_train import make_grid_train_step
from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
from mvs_gaussian_splatting_tpu.train.optim import adam_init
from mvs_gaussian_splatting_tpu.utils import graphics

W = H = 64
CFG = RasterConfig(max_tiles_per_gaussian=16, backend="stream")


def _camera(shift=0.0):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] = shift                       # translate camera along x
    campos = np.linalg.inv(w2c)[:3, 3].astype(np.float32)
    return CameraView(jnp.asarray(w2c), jnp.asarray((P @ w2c).astype(np.float32)),
                      jnp.asarray(campos), jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.6, 0.6, (96, 3)).astype(np.float32) + [0, 0, 4.0]
    params, aux = init_from_pcd(pts, rng.rand(96, 3).astype(np.float32), 128,
                                sh_degree=1)
    adam = adam_init(params)
    gts = jnp.asarray(rng.rand(2, 3, H, W).astype(np.float32)) * 0.5 + 0.25
    cams = stack_cameras([_camera(0.0), _camera(0.25)])
    return params, adam, aux, cams, gts


def _grid_mesh(n_data, n_tile):
    devs = jax.devices()
    assert len(devs) >= n_data * n_tile
    return Mesh(np.array(devs[:n_data * n_tile]).reshape(n_data, n_tile),
                ("data", "tile"))


def _run_grid(n_data, n_tile, params, adam, aux, cams, gts, iters=1):
    mesh = _grid_mesh(n_data, n_tile)
    step, place = make_grid_train_step(OptimizationConfig(), CFG, 1.0, mesh,
                                       interpret=True)
    bg = jnp.zeros(3)
    params, adam, aux, cams, gts, bg = place(params, adam, aux, cams, gts, bg)
    m = None
    for i in range(iters):
        params, adam, aux, m = step(params, adam, aux, cams, gts, bg,
                                    jnp.int32(i + 1), jnp.asarray(True),
                                    width=W, height=H, sh_degree=1)
    return params, adam, aux, m


class TestGridParity:
    def test_tile_shard_count_invariance(self):
        """(data=2, tile=1) vs (data=2, tile=4): same implementation, the
        tile axis must be numerically invisible."""
        setup = _setup()
        p1, a1, x1, m1 = _run_grid(2, 1, *map(_copy, setup))
        p4, a4, x4, m4 = _run_grid(2, 4, *map(_copy, setup))
        assert np.isclose(float(m1.loss), float(m4.loss), rtol=1e-6)
        for l1, l4 in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l4),
                                       rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(x1.xyz_grad_accum),
                                   np.asarray(x4.xyz_grad_accum),
                                   rtol=2e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(x1.denom), np.asarray(x4.denom))
        assert int(m1.n_visible) == int(m4.n_visible)

    def test_parity_vs_camera_dp_step(self):
        """Grid (2×4) vs the established camera-DP batch step (jnp composite
        backend) — cross-implementation agreement on loss, params, stats."""
        setup = _setup()
        pg, ag, xg, mg = _run_grid(2, 4, *map(_copy, setup))

        params, adam, aux, cams, gts = map(_copy, setup)
        mesh = make_mesh(2)
        cfg = RasterConfig(max_tiles_per_gaussian=16, backend="jnp",
                           tile_capacity=256, tile_batch=16)
        step, place = make_batch_train_step(OptimizationConfig(), cfg, 1.0,
                                            mesh)
        bg = jnp.zeros(3)
        with mesh:
            params, adam, aux, cams, gts, bg = place(params, adam, aux, cams,
                                                     gts, bg)
            pd, ad, xd, md = step(params, adam, aux, cams, gts, bg,
                                  jnp.int32(1), jnp.asarray(True),
                                  width=W, height=H, sh_degree=1)
        assert np.isclose(float(mg.loss), float(md.loss), rtol=1e-5)
        for lg, ld in zip(jax.tree.leaves(pg), jax.tree.leaves(pd)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(ld),
                                       rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(xg.denom), np.asarray(xd.denom))

    def test_grid_training_reduces_loss(self):
        setup = _setup()
        losses = []
        mesh = _grid_mesh(2, 4)
        step, place = make_grid_train_step(OptimizationConfig(), CFG, 1.0,
                                           mesh, interpret=True)
        params, adam, aux, cams, gts = setup
        bg = jnp.zeros(3)
        params, adam, aux, cams, gts, bg = place(params, adam, aux, cams,
                                                 gts, bg)
        for i in range(32):
            params, adam, aux, m = step(params, adam, aux, cams, gts, bg,
                                        jnp.int32(i + 1), jnp.asarray(True),
                                        width=W, height=H, sh_degree=1)
            losses.append(float(m.loss))
        assert losses[-1] < losses[0] * 0.96, losses


def _copy(x):
    return jax.tree.map(lambda a: a, x) if not isinstance(x, jnp.ndarray) else x


class TestGridLoopWiring:
    def test_loop_runs_grid_mode(self, tmp_path):
        """data_parallel>0 AND tile_parallel>0 composes (previously raised)."""
        from mvs_gaussian_splatting_tpu.data.scene import Scene
        from mvs_gaussian_splatting_tpu.train import (ModelConfig,
                                                      OptimizationConfig as OC,
                                                      PipelineConfig)
        from mvs_gaussian_splatting_tpu.train.config import TrainRunConfig
        from mvs_gaussian_splatting_tpu.train.loop import train
        from test_train_e2e import make_synthetic_scene

        scene_info = make_synthetic_scene(n_views=4, n_gauss=24, seed=11)
        model_cfg = ModelConfig(sh_degree=1, model_path="")
        opt_cfg = OC(iterations=6, densify_from_iter=100,
                     densify_until_iter=0, position_lr_max_steps=6)
        pipe_cfg = PipelineConfig(backend="auto", tile_w=16, tile_h=16,
                                  max_tiles_per_gaussian=16)
        run_cfg = TrainRunConfig(test_iterations=[6], save_iterations=[],
                                 data_parallel=2, tile_parallel=4,
                                 log_every=100)
        logs = []
        scene = Scene(model_cfg, scene_info=scene_info)
        params, aux, scene, history = train(model_cfg, opt_cfg, pipe_cfg,
                                            run_cfg, scene=scene,
                                            log_fn=logs.append)
        assert any("grid-parallel" in l for l in logs), logs
        assert 6 in history["psnr_test"]
        assert np.isfinite(history["psnr_test"][6])
