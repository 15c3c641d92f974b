"""Tests for the Gaussian parameter store, optimizer, densification, and PLY I/O."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models import (DensifyConfig, GaussianAux,
                                               activated, add_densification_stats,
                                               densify_and_prune, init_from_pcd,
                                               num_alive, pad_capacity, reset_opacity)
from mvs_gaussian_splatting_tpu.models import ply as plyio
from mvs_gaussian_splatting_tpu.models.gaussians import compact
from mvs_gaussian_splatting_tpu.train import (OptimizationConfig, adam_init,
                                              adam_update, group_lrs)


def small_model(n=20, capacity=64, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return init_from_pcd(pts, cols, capacity, sh_degree=3)


class TestInit:
    def test_shapes_and_alive(self):
        params, aux = small_model()
        assert params.xyz.shape == (64, 3)
        assert params.f_dc.shape == (64, 1, 3)
        assert params.f_rest.shape == (64, 15, 3)
        assert int(num_alive(aux)) == 20

    def test_initial_opacity_tenth(self):
        params, aux = small_model()
        _, _, opac = activated(params)
        np.testing.assert_allclose(np.asarray(opac[:20]), 0.1, rtol=1e-5)

    def test_scales_from_knn(self):
        # two clusters of 4 points with spacing 0.1 vs 1.0 → different scales
        pts = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [0, 0, 0.1],
                        [10, 0, 0], [11, 0, 0], [10, 1, 0], [10, 0, 1]], np.float32)
        cols = np.full((8, 3), 0.5, np.float32)
        params, _ = init_from_pcd(pts, cols, 16)
        s = np.asarray(jnp.exp(params.scaling))
        assert s[0, 0] < s[4, 0]

    def test_dead_slots_inert(self):
        params, aux = small_model()
        scal, _, opac = activated(params)
        assert float(opac[30]) < 1e-4
        assert float(scal[30, 0]) < 1e-4

    def test_pad_capacity(self):
        params, aux = small_model()
        params2, aux2 = pad_capacity(params, aux, 128)
        assert params2.xyz.shape == (128, 3)
        assert int(num_alive(aux2)) == 20
        np.testing.assert_array_equal(np.asarray(params2.xyz[:64]),
                                      np.asarray(params.xyz))


class TestAdam:
    def test_matches_manual_adam(self):
        params, aux = small_model()
        state = adam_init(params)
        opt = OptimizationConfig()
        grads = jax.tree.map(jnp.ones_like, params)
        lrs = group_lrs(opt, 0, 1.0, params)
        new_params, new_state = adam_update(grads, state, params, lrs)
        # first step of Adam with grad g: step = lr·g/(|g|+eps) = lr·sign(g)
        delta = np.asarray(params.scaling - new_params.scaling)
        np.testing.assert_allclose(delta, opt.scaling_lr, rtol=1e-4)
        assert int(new_state.count) == 1

    def test_alive_mask_freezes_dead(self):
        params, aux = small_model()
        state = adam_init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        lrs = group_lrs(OptimizationConfig(), 0, 1.0, params)
        new_params, _ = adam_update(grads, state, params, lrs, alive=aux.alive)
        np.testing.assert_array_equal(np.asarray(new_params.xyz[20:]),
                                      np.asarray(params.xyz[20:]))
        assert not np.array_equal(np.asarray(new_params.xyz[:20]),
                                  np.asarray(params.xyz[:20]))

    def test_xyz_lr_schedule(self):
        opt = OptimizationConfig()
        lrs0 = group_lrs(opt, 0, 2.0, small_model()[0])
        lrs_end = group_lrs(opt, 30_000, 2.0, small_model()[0])
        assert float(lrs0.xyz) == pytest.approx(opt.position_lr_init * 2.0, rel=1e-3)
        assert float(lrs_end.xyz) == pytest.approx(opt.position_lr_final * 2.0, rel=1e-3)


class TestDensify:
    def _setup(self, capacity=64, n=20):
        params, aux = small_model(n=n, capacity=capacity)
        state = adam_init(params)
        return params, state, aux

    def test_clone_small_high_grad(self):
        params, state, aux = self._setup()
        # small scales (clone branch), high grad stat on points 0..4
        params = params._replace(scaling=jnp.full_like(params.scaling, -5.0))
        aux = aux._replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:5].set(1.0),
            denom=aux.denom.at[:20].set(1.0))
        p2, mu, nu, aux2, info = densify_and_prune(
            params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert int(info["n_cloned"]) == 5
        assert int(info["n_split"]) == 0
        assert int(info["n_alive"]) == 25
        # clones landed in previously-dead slots with identical values
        np.testing.assert_allclose(np.asarray(p2.xyz[20:25]),
                                   np.asarray(params.xyz[:5]), atol=1e-6)

    def test_split_large_high_grad(self):
        params, state, aux = self._setup()
        # large scales (split branch) on points 0..3
        params = params._replace(
            scaling=params.scaling.at[:4].set(jnp.log(1.0)))
        aux = aux._replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:4].set(1.0),
            denom=aux.denom.at[:20].set(1.0))
        p2, mu, nu, aux2, info = densify_and_prune(
            params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert int(info["n_split"]) == 4
        assert int(info["n_alive"]) == 24  # 20 + 4 children2 (parents became children1)
        # children scaling = parent/1.6
        np.testing.assert_allclose(np.asarray(jnp.exp(p2.scaling[:4])),
                                   1.0 / 1.6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.exp(p2.scaling[20:24])),
                                   1.0 / 1.6, rtol=1e-5)

    def test_prune_low_opacity(self):
        params, state, aux = self._setup()
        params = params._replace(
            opacity=params.opacity.at[:7].set(-10.0))  # sigmoid ≈ 4.5e-5
        p2, mu, nu, aux2, info = densify_and_prune(
            params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert int(info["n_pruned"]) == 7
        assert int(info["n_alive"]) == 13

    def test_prune_world_size_gated(self):
        params, state, aux = self._setup()
        # all tiny except one huge gaussian: max scale > 0.1 * extent
        params = params._replace(
            scaling=jnp.full_like(params.scaling, -5.0).at[0].set(jnp.log(2.0)))
        for gate, expect in [(False, 20), (True, 19)]:
            _, _, _, aux2, info = densify_and_prune(
                params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
                extent=10.0, cfg=DensifyConfig(), size_threshold_active=gate)
            assert int(info["n_alive"]) == expect

    def test_moments_zeroed_for_new_points(self):
        params, state, aux = self._setup()
        mu = jax.tree.map(lambda x: jnp.ones_like(x), state.mu)
        nu = jax.tree.map(lambda x: jnp.ones_like(x), state.nu)
        params = params._replace(scaling=jnp.full_like(params.scaling, -5.0))
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:5].set(1.0),
                           denom=aux.denom.at[:20].set(1.0))
        p2, mu2, nu2, aux2, info = densify_and_prune(
            params, mu, nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert int(info["n_cloned"]) == 5
        np.testing.assert_array_equal(np.asarray(mu2.xyz[20:25]), 0.0)
        np.testing.assert_array_equal(np.asarray(nu2.xyz[20:25]), 0.0)

    def test_slot_starvation_reported(self):
        params, state, aux = self._setup(capacity=22, n=20)
        params = params._replace(scaling=jnp.full_like(params.scaling, -5.0))
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:10].set(1.0),
                           denom=aux.denom.at[:20].set(1.0))
        _, _, _, _, info = densify_and_prune(
            params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert int(info["n_cloned"]) == 2
        assert int(info["n_dropped"]) == 8

    def test_stats_reset_after_densify(self):
        params, state, aux = self._setup()
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:5].set(1.0),
                           denom=aux.denom.at[:20].set(1.0),
                           max_radii2d=aux.max_radii2d.at[:20].set(5.0))
        _, _, _, aux2, _ = densify_and_prune(
            params, state.mu, state.nu, aux, jax.random.PRNGKey(0),
            extent=10.0, cfg=DensifyConfig(), size_threshold_active=False)
        assert float(aux2.xyz_grad_accum.sum()) == 0.0
        assert float(aux2.denom.sum()) == 0.0
        assert float(aux2.max_radii2d.sum()) == 0.0

    def test_jit_compatible(self):
        params, state, aux = self._setup()
        fn = jax.jit(lambda p, m, n, a, k: densify_and_prune(
            p, m, n, a, k, 10.0, DensifyConfig(), False),
            static_argnames=())
        p2, mu, nu, aux2, info = fn(params, state.mu, state.nu, aux,
                                    jax.random.PRNGKey(1))
        assert int(info["n_alive"]) == 20


class TestOpacityReset:
    def test_clamps_and_zeroes_moments(self):
        params, aux = small_model()
        state = adam_init(params)
        mu = state.mu._replace(opacity=jnp.ones_like(state.mu.opacity))
        p2, mu2, nu2 = reset_opacity(params, mu, state.nu)
        opac = np.asarray(jax.nn.sigmoid(p2.opacity[:20, 0]))
        assert (opac <= 0.01 + 1e-6).all()
        np.testing.assert_array_equal(np.asarray(mu2.opacity), 0.0)


class TestStats:
    def test_accumulation(self):
        params, aux = small_model()
        radii = jnp.zeros(64, jnp.int32).at[:10].set(5)
        grad = jnp.zeros((64, 2)).at[:10].set(jnp.array([3.0, 4.0]))
        aux2 = add_densification_stats(aux, radii, grad, radii > 0)
        np.testing.assert_allclose(np.asarray(aux2.xyz_grad_accum[:10]), 5.0)
        np.testing.assert_allclose(np.asarray(aux2.denom[:10]), 1.0)
        np.testing.assert_allclose(np.asarray(aux2.max_radii2d[:10]), 5.0)
        assert float(aux2.denom[10:].sum()) == 0.0


class TestPly:
    def test_gaussian_roundtrip(self, tmp_path):
        params, aux = small_model()
        comp = compact(params, aux)
        path = str(tmp_path / "point_cloud.ply")
        plyio.save_gaussian_ply(path, comp)
        back = plyio.load_gaussian_ply(path, max_sh_degree=3)
        for k in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            np.testing.assert_allclose(back[k], comp[k], atol=1e-7, err_msg=k)

    def test_gzip_roundtrip_is_exact(self, tmp_path):
        # Retained-model path (.ply.gz): byte-identical payload, transparent
        # via the same reader — validation runs commit the final model this
        # way so it stays re-renderable across rounds.
        params, aux = small_model()
        comp = compact(params, aux)
        path = str(tmp_path / "point_cloud_final.ply.gz")
        plyio.save_gaussian_ply(path, comp)
        back = plyio.load_gaussian_ply(path, max_sh_degree=3)
        for k in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            np.testing.assert_array_equal(back[k], np.asarray(comp[k]),
                                          err_msg=k)
        import gzip
        assert open(path, "rb").read(2) == b"\x1f\x8b"
        assert gzip.open(path, "rb").read(3) == b"ply"

    def test_point_cloud_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        xyz = rng.randn(50, 3).astype(np.float32)
        rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
        path = str(tmp_path / "points3D.ply")
        plyio.store_point_cloud_ply(path, xyz, rgb)
        pts, cols, normals = plyio.fetch_point_cloud_ply(path)
        np.testing.assert_allclose(pts, xyz, atol=1e-7)
        np.testing.assert_allclose(cols, rgb / 255.0, atol=1e-7)

    def test_header_schema_matches_reference(self, tmp_path):
        params, aux = small_model()
        path = str(tmp_path / "pc.ply")
        plyio.save_gaussian_ply(path, compact(params, aux))
        header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
        for field in ("x", "y", "z", "nx", "f_dc_0", "f_dc_2", "f_rest_0",
                      "f_rest_44", "opacity", "scale_0", "scale_2", "rot_0", "rot_3"):
            assert f"property float {field}" in header
        assert "binary_little_endian" in header
