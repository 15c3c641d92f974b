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
