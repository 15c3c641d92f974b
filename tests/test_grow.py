"""Tests for the learnable-densification (grow) research features."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models.densify import (DensifyConfig,
                                                       densify_and_prune_grow)
from mvs_gaussian_splatting_tpu.models.gaussians import (GaussianAux,
                                                         init_from_pcd, num_alive)
from mvs_gaussian_splatting_tpu.models.grow import (GrowConfig, grow_offsets,
                                                    speculative_augment,
                                                    straight_through_argmax)
from mvs_gaussian_splatting_tpu.train.optim import adam_init
from mvs_gaussian_splatting_tpu.utils.sphere import sphere_points


def grow_model(n=20, capacity=64, **extras):
    rng = np.random.RandomState(0)
    flags = {"grow_dir": False, "continous_dir": False, "grow_distance": False,
             "learn_split_distance": False, "learn_split_scale": False}
    flags.update(extras)
    params, aux = init_from_pcd(rng.randn(n, 3).astype(np.float32),
                                rng.rand(n, 3).astype(np.float32), capacity,
                                extras=flags, key=jax.random.PRNGKey(1))
    return params, aux, GrowConfig(**{k: v for k, v in flags.items()})


class TestStraightThrough:
    def test_forward_is_one_hot(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(5, 8))
        y = straight_through_argmax(logits)
        arr = np.asarray(y)
        np.testing.assert_allclose(arr.sum(-1), 1.0, atol=1e-6)
        assert ((arr == arr.max(-1, keepdims=True)) | (np.abs(arr) < 1e-6)).all()

    def test_gradient_is_softmax_jacobian(self):
        logits = jnp.asarray(np.random.RandomState(1).randn(3, 8))
        w = jnp.asarray(np.random.RandomState(2).randn(3, 8))
        g_st = jax.grad(lambda l: (straight_through_argmax(l) * w).sum())(logits)
        g_soft = jax.grad(lambda l: (jax.nn.softmax(l, -1) * w).sum())(logits)
        np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_soft),
                                   atol=1e-6)


class TestGrowOffsets:
    def test_discrete_dirs_unit_displacement(self):
        params, aux, cfg = grow_model(grow_dir=True)
        dirs = jnp.asarray(sphere_points(128), jnp.float32)
        off = grow_offsets(params, dirs, cfg)
        # |Δ| = max_scale (unit sphere dirs, dist=1)
        expected = np.asarray(jnp.exp(params.scaling).max(1))
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(off, axis=1)),
                                   expected, rtol=1e-4)

    def test_continuous_dirs(self):
        params, aux, cfg = grow_model(continous_dir=True)
        off = grow_offsets(params, None, cfg)
        assert np.isfinite(np.asarray(off)).all()

    def test_grow_distance_scales(self):
        params, aux, cfg = grow_model(continous_dir=True, grow_distance=True)
        # grow_dist logits 0 → distance = 2·sigmoid(0) = 1
        off1 = grow_offsets(params, None, cfg)
        params2 = params._replace(grow_dist=jnp.full_like(params.grow_dist, 10.0))
        off2 = grow_offsets(params2, None, cfg)
        np.testing.assert_allclose(np.asarray(off2), np.asarray(off1) * 2.0,
                                   rtol=1e-3)


class TestSpeculativeAugment:
    def _stat_aux(self, aux, hot=5):
        return aux._replace(
            xyz_grad_accum=aux.xyz_grad_accum.at[:hot].set(1.0),
            denom=aux.denom.at[:20].set(1.0))

    def test_grow_block_populated(self):
        params, aux, cfg = grow_model(grow_dir=True)
        aux = self._stat_aux(aux)
        dirs = jnp.asarray(sphere_points(128), jnp.float32)
        g = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1)
        out = speculative_augment(params, aux, g, dirs, cfg, 0.5, 10.0, 0.01,
                                  spec_size=8)
        assert out["xyz"].shape[0] == 64 + 16
        assert int(out["grow_ok"].sum()) == 5
        assert int(out["alive"].sum()) == 20 + 5

    def test_gradients_reach_dirs_prob(self):
        params, aux, cfg = grow_model(grow_dir=True)
        aux = self._stat_aux(aux)
        dirs = jnp.asarray(sphere_points(128), jnp.float32)
        g = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1)

        def loss(p):
            out = speculative_augment(p, aux, g, dirs, cfg, 0.5, 10.0, 0.01,
                                      spec_size=8)
            return (out["xyz"] ** 2).sum()

        grads = jax.grad(loss)(params)
        assert np.abs(np.asarray(grads.dirs_prob)).max() > 0

    def test_split_speculation_with_learned_scale(self):
        params, aux, cfg = grow_model(continous_dir=True, learn_split_scale=True)
        aux = self._stat_aux(aux)
        # make hot points large so they pass the split scale gate
        params = params._replace(scaling=params.scaling.at[:5].set(jnp.log(1.0)))
        g = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1)
        out = speculative_augment(params, aux, g, None, cfg, 0.5, 10.0, 0.01,
                                  spec_size=8, key=jax.random.PRNGKey(0))
        assert out["xyz"].shape[0] == 64 + 16
        # 5 grown + 5-10 split children alive beyond the base 20
        assert int(out["alive"].sum()) > 25

        def loss(p):
            o = speculative_augment(p, aux, g, None, cfg, 0.5, 10.0, 0.01,
                                    spec_size=8, key=jax.random.PRNGKey(0))
            return (o["scaling"] ** 2).sum()
        grads = jax.grad(loss)(params)
        assert np.abs(np.asarray(grads.split_scale)).max() > 0


class TestDensifyGrow:
    def test_grow_commits_points(self):
        params, aux, cfg = grow_model(grow_dir=True)
        adam = adam_init(params)
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:4].set(1.0),
                           denom=aux.denom.at[:20].set(1.0))
        dirs = jnp.asarray(sphere_points(128), jnp.float32)
        p2, mu, nu, aux2, info = densify_and_prune_grow(
            params, adam.mu, adam.nu, aux, jax.random.PRNGKey(0), 10.0,
            DensifyConfig(grad_threshold=0.5), cfg, dirs,
            jnp.asarray(False))
        assert int(info["n_cloned"]) == 4      # grown copies
        assert int(num_alive(aux2)) >= 24
        # grown copies displaced from their sources
        d = np.linalg.norm(np.asarray(p2.xyz[20:24]) - np.asarray(params.xyz[:4]),
                           axis=1)
        assert (d > 1e-4).all()

    def test_dirs_prob_reinitialized(self):
        params, aux, cfg = grow_model(grow_dir=True)
        params = params._replace(
            dirs_prob=params.dirs_prob.at[:4].set(
                jax.nn.one_hot(jnp.zeros(4, jnp.int32), 128)))
        adam = adam_init(params)
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:4].set(1.0),
                           denom=aux.denom.at[:20].set(1.0))
        dirs = jnp.asarray(sphere_points(128), jnp.float32)
        p2, *_ = densify_and_prune_grow(
            params, adam.mu, adam.nu, aux, jax.random.PRNGKey(0), 10.0,
            DensifyConfig(grad_threshold=0.5), cfg, dirs, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(p2.dirs_prob[:4]), 1.0 / 128,
                                   atol=1e-6)

    def test_growsplit_splits_grown_points(self):
        # grown points that are LARGE should immediately split (:690)
        params, aux, cfg = grow_model(continous_dir=True)
        params = params._replace(scaling=jnp.full_like(params.scaling, jnp.log(1.0)))
        adam = adam_init(params)
        aux = aux._replace(xyz_grad_accum=aux.xyz_grad_accum.at[:3].set(1.0),
                           denom=aux.denom.at[:20].set(1.0))
        p2, mu, nu, aux2, info = densify_and_prune_grow(
            params, adam.mu, adam.nu, aux, jax.random.PRNGKey(0), 10.0,
            DensifyConfig(grad_threshold=0.5, percent_dense=0.01), cfg, None,
            jnp.asarray(False))
        # 3 hot + large originals split, and their 3 grown copies split too
        assert int(info["n_split"]) == 6
