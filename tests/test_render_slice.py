"""Alive-prefix compaction + static render-slice equivalence.

The training loop compacts state after every densify round
(models.gaussians.compact_state) and renders only a [:render_n] prefix
(train.step render_n). Slicing must be an exact no-op w.r.t. the full-
capacity step whenever all alive slots are inside the prefix.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.models.gaussians import (GaussianAux,
                                                         compact_state,
                                                         init_from_pcd)
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
from mvs_gaussian_splatting_tpu.train.loop import _render_bucket
from mvs_gaussian_splatting_tpu.train.optim import adam_init
from mvs_gaussian_splatting_tpu.train.step import make_train_step
from mvs_gaussian_splatting_tpu.utils import graphics


def _scene(capacity=256, n=40, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return init_from_pcd(pts, cols, capacity, sh_degree=1)


def _camera(w=64, h=64):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, w), h)
    W2V = np.eye(4, dtype=np.float32)
    W2V[2, 3] = 4.0
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return CameraView(jnp.asarray(W2V), jnp.asarray(P @ W2V),
                      jnp.asarray(np.linalg.inv(W2V)[:3, 3].astype(np.float32)),
                      jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


class TestCompactState:
    def test_alive_becomes_prefix_and_rows_follow(self):
        params, aux = _scene()
        rng = np.random.RandomState(1)
        # scatter the 40 alive slots across the capacity
        perm = rng.permutation(256)
        scatter = jax.tree.map(lambda a: None if a is None else a[perm],
                               params)
        aux_s = GaussianAux(alive=aux.alive[perm],
                            max_radii2d=jnp.asarray(rng.rand(256), jnp.float32),
                            xyz_grad_accum=jnp.asarray(rng.rand(256), jnp.float32),
                            denom=jnp.asarray(rng.rand(256), jnp.float32))
        adam = adam_init(scatter)
        mu = jax.tree.map(lambda a: None if a is None else a + 1.0, adam.mu)
        p2, mu2, nu2, aux2 = jax.jit(compact_state)(scatter, mu, adam.nu,
                                                    aux_s)
        n_alive = int(aux_s.alive.sum())
        alive2 = np.asarray(aux2.alive)
        assert alive2[:n_alive].all() and not alive2[n_alive:].any()
        # alive rows keep their (stable) relative order and stay aligned
        # across params / moments / stats
        src_alive = np.flatnonzero(np.asarray(aux_s.alive))
        np.testing.assert_array_equal(
            np.asarray(p2.xyz)[:n_alive], np.asarray(scatter.xyz)[src_alive])
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(mu2)[0])[:n_alive],
            np.asarray(jax.tree.leaves(mu)[0])[src_alive])
        np.testing.assert_array_equal(
            np.asarray(aux2.denom)[:n_alive],
            np.asarray(aux_s.denom)[src_alive])


class TestRenderSliceEquivalence:
    def test_sliced_step_matches_full(self):
        params, aux = _scene()
        adam = adam_init(params)
        cam = _camera()
        gt = jnp.asarray(np.random.RandomState(2).rand(3, 64, 64)
                         .astype(np.float32))
        cfg = RasterConfig(backend="jnp", tile_capacity=128,
                           max_tiles_per_gaussian=16, tile_batch=16)
        step = make_train_step(OptimizationConfig(), cfg, 4.0)
        common = (params, adam, aux, cam, gt, jnp.zeros(3), jnp.int32(10),
                  jnp.bool_(True))
        p_full, a_full, aux_full, m_full = step(
            *common, width=64, height=64, sh_degree=1)
        p_sl, a_sl, aux_sl, m_sl = step(
            *common, width=64, height=64, sh_degree=1, render_n=64)
        assert float(m_full.loss) == float(m_sl.loss)
        np.testing.assert_allclose(np.asarray(p_full.xyz),
                                   np.asarray(p_sl.xyz), atol=1e-7)
        np.testing.assert_array_equal(np.asarray(aux_full.denom),
                                      np.asarray(aux_sl.denom))
        np.testing.assert_allclose(np.asarray(aux_full.xyz_grad_accum),
                                   np.asarray(aux_sl.xyz_grad_accum),
                                   atol=1e-7)


class TestRenderBucket:
    def test_buckets(self):
        assert _render_bucket(40, 1 << 16) == 1024
        assert _render_bucket(1000, 1 << 16) == 1536      # 1.5·2^10 ≥ 1200
        assert _render_bucket(60_000, 1 << 16) == 0       # ≥ capacity → full
        assert _render_bucket(25_000, 1 << 16) == 32768   # 2^15 ≥ 30000
        assert _render_bucket(40_000, 1 << 16) == 49152   # 1.5·2^15 ≥ 48000
        assert _render_bucket(0, 1 << 16) == 1024

    def test_bucket_always_covers_alive(self):
        for n in (1, 7, 1023, 1024, 5000, 100_000, 700_000):
            b = _render_bucket(n, 1 << 20)
            assert b == 0 or b >= n


class TestSpecStepSliceEquivalence:
    def test_grow_spec_step_sliced_matches_full(self):
        from mvs_gaussian_splatting_tpu.models.grow import GrowConfig
        from mvs_gaussian_splatting_tpu.train.grow_step import (
            make_spec_train_step)
        from mvs_gaussian_splatting_tpu.utils.sphere import sphere_points

        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.8, 0.8, (40, 3)).astype(np.float32)
        cols = rng.rand(40, 3).astype(np.float32)
        extras = {"grow_dir": True, "grow_distance": True,
                  "continous_dir": False, "learn_split_distance": True,
                  "learn_split_scale": True}
        params, aux = init_from_pcd(pts, cols, 256, sh_degree=1,
                                    extras=extras, num_dirs=16,
                                    key=jax.random.PRNGKey(0))
        # give the stats some gradient signal so candidates are selected
        aux = aux._replace(
            xyz_grad_accum=jnp.asarray(rng.rand(256) * 1e-2, jnp.float32),
            denom=jnp.ones(256))
        adam = adam_init(params)
        cam = _camera()
        gt = jnp.asarray(rng.rand(3, 64, 64).astype(np.float32))
        cfg = RasterConfig(backend="jnp", tile_capacity=128,
                           max_tiles_per_gaussian=16, tile_batch=16)
        gcfg = GrowConfig(grow_dir=True, grow_distance=True, num_dirs=16,
                          learn_split_distance=True, learn_split_scale=True)
        step = make_spec_train_step(OptimizationConfig(), cfg, 4.0, gcfg,
                                    sphere_points(16), spec_size=32,
                                    extent=4.0)
        key = jax.random.PRNGKey(3)
        common = (params, adam, aux, cam, gt, jnp.zeros(3), jnp.int32(10),
                  jnp.bool_(True), key)
        p_full, _, aux_full, m_full = step(*common, width=64, height=64,
                                           sh_degree=1)
        p_sl, _, aux_sl, m_sl = step(*common, width=64, height=64,
                                     sh_degree=1, render_n=64)
        assert float(m_full.loss) == float(m_sl.loss)
        np.testing.assert_allclose(np.asarray(p_full.xyz),
                                   np.asarray(p_sl.xyz), atol=1e-7)
        np.testing.assert_allclose(np.asarray(p_full.dirs_prob),
                                   np.asarray(p_sl.dirs_prob), atol=1e-7)
        np.testing.assert_array_equal(np.asarray(aux_full.denom),
                                      np.asarray(aux_sl.denom))


class TestInstanceBucket:
    """Measured-load instance-cap buckets (train.loop._instance_bucket)."""

    def _rc(self):
        from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
        return RasterConfig(tile_w=32, tile_h=16, max_tiles_per_gaussian=32)

    def test_bucket_covers_margined_load_and_aligns(self):
        from mvs_gaussian_splatting_tpu.train.loop import _instance_bucket
        rc = self._rc()
        for load in (100, 5_000, 123_456, 760_448, 3_000_000):
            b = _instance_bucket(load, 1 << 20, rc)
            assert b % 128 == 0
            assert b >= min(load, b)  # never below what it clips to
        assert _instance_bucket(760_448, 1 << 20, rc) >= 760_448 * 1.3

    def test_bucket_clips_to_enumeration_bound(self):
        from mvs_gaussian_splatting_tpu.ops.binning import stream_instance_bound
        from mvs_gaussian_splatting_tpu.train.loop import _instance_bucket
        rc = self._rc()
        n = 65_536
        bound = stream_instance_bound(n, rc.max_tiles_per_gaussian,
                                      rc.tier_budgets, rc.tier_fracs)
        b = _instance_bucket(10 * bound, n, rc)  # absurd load
        assert b <= bound + 127  # clipped (CHUNK-rounded)

    def test_bucket_can_exceed_auto_heuristic(self):
        """Early training with large splats overflows the a-priori cap; the
        bucket must be able to grow past it (round-2 fix)."""
        from mvs_gaussian_splatting_tpu.ops.binning import auto_instance_cap
        from mvs_gaussian_splatting_tpu.train.loop import _instance_bucket
        rc = self._rc()
        n = 1 << 18
        auto = auto_instance_cap(n, rc.max_tiles_per_gaussian, rc.tile_w,
                                 rc.tile_h, rc.tier_budgets, rc.tier_fracs)
        b = _instance_bucket(int(auto * 1.5), n, rc)
        assert b > auto
