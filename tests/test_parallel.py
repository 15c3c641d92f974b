"""Multi-device tests on the 8-device virtual CPU mesh.

Checks that the camera-batched data-parallel step produces the same numbers
sharded over 8 devices as on 1 device (the sharding-correctness invariant),
and that the driver entry points compile and run.
"""

import importlib.util
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.parallel import make_batch_train_step, make_mesh
from mvs_gaussian_splatting_tpu.parallel.data_parallel import stack_cameras
from mvs_gaussian_splatting_tpu.train import OptimizationConfig, adam_init


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def graft():
    return _load_graft()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestEntryPoints:
    def test_entry_compiles(self, graft):
        fn, args = graft.entry()
        img = jax.jit(fn)(*args)
        assert img.shape == (3, 128, 128)
        assert np.isfinite(np.asarray(img)).all()

    def test_dryrun_multichip(self, graft):
        graft.dryrun_multichip(8)


class TestDataParallel:
    def _setup(self, mesh, seed=0):
        graft = _load_graft()
        width = height = 32
        rng = np.random.RandomState(seed)
        params, aux = init_from_pcd(
            rng.uniform(-0.8, 0.8, (96, 3)).astype(np.float32),
            rng.rand(96, 3).astype(np.float32), 128)
        adam = adam_init(params)
        cams = stack_cameras([graft._camera(width, height, 2 * math.pi * i / 8)
                              for i in range(8)])
        gts = jnp.asarray(rng.rand(8, 3, height, width).astype(np.float32))
        raster_cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=8,
                                  tile_batch=8, backend="jnp")
        step, place = make_batch_train_step(OptimizationConfig(), raster_cfg,
                                            1.0, mesh)
        return params, adam, aux, cams, gts, step, place, width, height

    def test_sharded_matches_single_device(self):
        results = {}
        for n_dev in (1, 8):
            mesh = make_mesh(n_dev)
            (params, adam, aux, cams, gts, step, place, w, h) = self._setup(mesh)
            bg = jnp.zeros(3)
            params, adam, aux, cams, gts, bg = place(params, adam, aux, cams,
                                                     gts, bg)
            with mesh:
                p2, a2, aux2, m = step(params, adam, aux, cams, gts, bg,
                                       jnp.int32(1), jnp.asarray(True),
                                       width=w, height=h, sh_degree=0)
            results[n_dev] = (np.asarray(p2.xyz), np.asarray(aux2.xyz_grad_accum),
                              float(m.loss))
        np.testing.assert_allclose(results[1][0], results[8][0],
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(results[1][1], results[8][1],
                                   atol=1e-5, rtol=1e-4)
        assert results[1][2] == pytest.approx(results[8][2], rel=1e-5)

    def test_stats_accumulate_over_batch(self):
        mesh = make_mesh(8)
        (params, adam, aux, cams, gts, step, place, w, h) = self._setup(mesh)
        bg = jnp.zeros(3)
        params, adam, aux, cams, gts, bg = place(params, adam, aux, cams,
                                                 gts, bg)
        with mesh:
            _, _, aux2, m = step(params, adam, aux, cams, gts, bg,
                                 jnp.int32(1), jnp.asarray(True),
                                 width=w, height=h, sh_degree=0)
        denom = np.asarray(aux2.denom)
        # every visible gaussian was seen by up to 8 cameras
        assert denom.max() > 1.0
        assert int(m.n_visible) > 0


class TestSpecBatchStep:
    """Grow-mode speculative step composed with data parallelism
    (train.grow_step.make_spec_batch_train_step)."""

    def _grow_model(self, n=24, capacity=64):
        rng = np.random.RandomState(3)
        flags = {"grow_dir": True, "continous_dir": False,
                 "grow_distance": False, "learn_split_distance": False,
                 "learn_split_scale": False}
        params, aux = init_from_pcd(
            rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32), capacity, extras=flags,
            num_dirs=16, key=jax.random.PRNGKey(1))
        # nonzero accumulated grads so speculation selects candidates
        aux = aux._replace(
            xyz_grad_accum=jnp.where(aux.alive, 1.0, 0.0),
            denom=jnp.where(aux.alive, 1.0, 0.0))
        return params, aux

    def _make(self, mesh, spec_size=8):
        from mvs_gaussian_splatting_tpu.models.grow import GrowConfig
        from mvs_gaussian_splatting_tpu.train.grow_step import (
            make_spec_batch_train_step, make_spec_train_step)
        from mvs_gaussian_splatting_tpu.utils.sphere import sphere_points

        grow_cfg = GrowConfig(grow_dir=True, continous_dir=False,
                              grow_distance=False,
                              learn_split_distance=False,
                              learn_split_scale=False, num_dirs=16)
        dirs = sphere_points(16)
        opt_cfg = OptimizationConfig()
        raster = RasterConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                              tile_batch=8, backend="jnp")
        single = make_spec_train_step(opt_cfg, raster, 1.0, grow_cfg, dirs,
                                      spec_size, 10.0)
        batched, place = make_spec_batch_train_step(opt_cfg, raster, 1.0,
                                                    grow_cfg, dirs,
                                                    spec_size, 10.0, mesh)
        return single, batched, place

    def test_b1_matches_single(self, graft):
        width = height = 32
        mesh = make_mesh(1)
        single, batched, place = self._make(mesh)
        params, aux = self._grow_model()
        adam = adam_init(params)
        cam = graft._camera(width, height, 0.35)
        gt = jnp.full((3, height, width), 0.4)
        key = jax.random.PRNGKey(5)

        p1, a1, x1, m1 = single(params, adam, aux, cam, gt, jnp.zeros(3),
                                jnp.int32(600), jnp.asarray(True), key,
                                width=width, height=height, sh_degree=0)
        with mesh:
            bp, ba, bx, bc, bg_, bb = place(
                params, adam, aux, stack_cameras([cam]), gt[None],
                jnp.zeros(3))
            p2, a2, x2, m2 = batched(bp, ba, bx, bc, bg_, bb,
                                     jnp.int32(600), jnp.asarray(True), key,
                                     width=width, height=height, sh_degree=0)
        np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
        for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(x1.denom), np.asarray(x2.denom),
                                   atol=1e-6)

    def test_b4_sharded_runs_and_accumulates_stats(self, graft):
        width = height = 32
        mesh = make_mesh(4)
        _, batched, place = self._make(mesh)
        params, aux = self._grow_model()
        adam = adam_init(params)
        cams = stack_cameras([graft._camera(width, height, 0.3 + 0.2 * i)
                              for i in range(4)])
        gts = jnp.full((4, 3, height, width), 0.4)
        # the batched step donates its state args (and device_put aliases
        # matching-sharding buffers) — read the baseline before calling
        denom_before = float(aux.denom.sum())
        with mesh:
            bp, ba, bx, bc, bg_, bb = place(params, adam, aux, cams, gts,
                                            jnp.zeros(3))
            p2, a2, x2, m2 = batched(bp, ba, bx, bc, bg_, bb,
                                     jnp.int32(600), jnp.asarray(True),
                                     jax.random.PRNGKey(5),
                                     width=width, height=height, sh_degree=0)
        assert np.isfinite(float(m2.loss))
        # stats accumulated across the 4-camera batch: denom grows by the
        # per-camera visibility counts (>= 1 visible camera per point here)
        assert float(x2.denom.sum()) > denom_before
        for leaf in jax.tree.leaves(p2):
            assert np.isfinite(np.asarray(leaf)).all()
