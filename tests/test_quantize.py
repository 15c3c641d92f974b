"""Codebook quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.models.quantize import (argmax_quantize,
                                                        compress_gaussians,
                                                        fit_codebook,
                                                        gumbel_quantize,
                                                        nearest_code,
                                                        vq_quantize)


def clustered_data(n=512, k=4, d=8, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 3
    x = centers[rng.randint(0, k, n)] + rng.randn(n, d) * 0.1
    return jnp.asarray(x.astype(np.float32)), centers


class TestVQ:
    def test_nearest_code_exact(self):
        cb = jnp.asarray(np.array([[0.0, 0], [10, 0], [0, 10]], np.float32))
        x = jnp.asarray(np.array([[0.1, 0.1], [9, 1], [1, 9]], np.float32))
        np.testing.assert_array_equal(np.asarray(nearest_code(x, cb)), [0, 1, 2])

    def test_vq_straight_through_grad(self):
        x, _ = clustered_data()
        cb = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        g = jax.grad(lambda x_: (vq_quantize(x_, cb)[0] ** 2).sum())(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_fit_codebook_recovers_clusters(self):
        x, centers = clustered_data()
        state = fit_codebook(jax.random.PRNGKey(1), x, num_codes=16, iters=100)
        q, codes, loss = vq_quantize(x, state.codebook)
        err = float(jnp.abs(q - x).mean())
        assert err < 0.2, err

    def test_gumbel_and_argmax_shapes(self):
        cb = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        logits = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        qg, probs = gumbel_quantize(jax.random.PRNGKey(2), logits, cb, hard=True)
        qa, idx = argmax_quantize(logits, cb)
        assert qg.shape == (32, 8) and qa.shape == (32, 8)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


class TestCompression:
    def test_compress_gaussians_roundtrip_error(self):
        rng = np.random.RandomState(2)
        n = 400
        gaussians = {
            "xyz": rng.randn(n, 3).astype(np.float32),
            "f_dc": rng.randn(n, 1, 3).astype(np.float32),
            "f_rest": (rng.randn(n, 15, 3) * 0.1).astype(np.float32),
            "scaling": rng.randn(n, 3).astype(np.float32),
            "rotation": rng.randn(n, 4).astype(np.float32),
            "opacity": rng.randn(n, 1).astype(np.float32),
        }
        out = compress_gaussians(jax.random.PRNGKey(0), gaussians, num_codes=64)
        assert set(out["codes"]) == {"f_rest", "scaling", "rotation"}
        assert out["xyz"].shape == (n, 3)          # untouched attrs pass through
        deq = out["dequantized"]["f_rest"]
        assert deq.shape == (n, 15, 3)
        rel = float(jnp.abs(deq - gaussians["f_rest"]).mean()
                    / jnp.abs(jnp.asarray(gaussians["f_rest"])).mean())
        assert rel < 1.0  # quantization error bounded
        assert int(out["codes"]["f_rest"].max()) < 64
