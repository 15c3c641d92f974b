"""2D Gaussian-splatting toy: the quick CPU conformance target."""

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.toy2d import fit_image, init_splats, render_splats2d


def target_image(h=48, w=48):
    """A soft two-blob RGB image."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    g1 = np.exp(-(((xs - w * 0.3) ** 2 + (ys - h * 0.3) ** 2) / (2 * (w * 0.12) ** 2)))
    g2 = np.exp(-(((xs - w * 0.7) ** 2 + (ys - h * 0.65) ** 2) / (2 * (w * 0.18) ** 2)))
    img = np.stack([g1, g2, 0.5 * (g1 + g2)], 0)
    return np.clip(img, 0, 1).astype(np.float32)


class TestRender2D:
    def test_render_shape_and_range(self):
        params, alive = init_splats(jax.random.PRNGKey(0), 64, 32)
        img = render_splats2d(params, alive, 32, 40)
        assert img.shape == (3, 32, 40)
        arr = np.asarray(img)
        assert arr.min() >= 0.0 and arr.max() <= 1.0

    def test_dead_slots_invisible(self):
        params, alive = init_splats(jax.random.PRNGKey(0), 64, 32)
        none_alive = jnp.zeros_like(alive)
        img = render_splats2d(params, none_alive, 32, 32)
        np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)

    def test_differentiable(self):
        params, alive = init_splats(jax.random.PRNGKey(1), 32, 16)
        tgt = jnp.asarray(target_image(32, 32))
        g = jax.grad(lambda p: ((render_splats2d(p, alive, 32, 32) - tgt) ** 2
                                ).mean())(params)
        for name, leaf in g._asdict().items():
            assert np.isfinite(np.asarray(leaf)).all(), name
        assert np.abs(np.asarray(g.xy)).max() > 0


class TestFit2D:
    def test_loss_decreases_and_densify_runs(self):
        tgt = target_image()
        params, alive, hist = fit_image(
            tgt, capacity=256, n_init=64, epochs=301,
            densification_interval=100, lr=0.05)
        assert hist["loss"][-1] < 0.5 * hist["loss"][0], hist["loss"]
        assert all(np.isfinite(hist["loss"]))
        # fit quality: L1 under 0.1 on this easy target
        img = render_splats2d(params, alive, tgt.shape[1], tgt.shape[2])
        l1 = float(jnp.abs(img - jnp.asarray(tgt)).mean())
        assert l1 < 0.1, l1


def test_toy2d_cli_with_reference_config(tmp_path):
    """The script entry accepts the reference's config.yml keys
    (2D-Gaussian-Splatting-main/config.yml) and writes a fitted render."""
    import numpy as np
    import yaml
    from PIL import Image

    from mvs_gaussian_splatting_tpu.toy2d import splat2d

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "target.png")
    with open(tmp_path / "config.yml", "w") as f:
        yaml.safe_dump({
            "image_size": [32, 32, 3],
            "primary_samples": 50,
            "backup_samples": 100,
            "num_epochs": 30,
            "densification_interval": 20,
            "learning_rate": 0.02,
            "image_file_name": str(tmp_path / "target.png"),
            "gradient_threshold": 0.002,
            "gaussian_threshold": 0.75,
        }, f)
    out = str(tmp_path / "fit.png")
    splat2d.main(["--config", str(tmp_path / "config.yml"), "--out", out])
    assert Image.open(out).size == (32, 32)
