"""Compression CLI round-trip: PLY → codebook npz → dequantized PLY.

Covers the VQ pathway the reference vendors unused (quantize.py, SURVEY
§2.20) as a user-facing workflow, including render fidelity of the
dequantized model.
"""

import math
import os

import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.cli import compress as compress_cli
from mvs_gaussian_splatting_tpu.models.ply import (load_gaussian_ply,
                                                   save_gaussian_ply)
from mvs_gaussian_splatting_tpu.ops import preprocess, rasterize_reference
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
from mvs_gaussian_splatting_tpu.utils import graphics


def _model_dir(tmp_path, n=200, sh_degree=1, seed=0):
    rng = np.random.RandomState(seed)
    r = 3 * (sh_degree + 1) ** 2 - 3
    gaussians = {
        "xyz": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "f_dc": rng.randn(n, 1, 3).astype(np.float32),
        "f_rest": (rng.randn(n, r // 3, 3) * 0.1).astype(np.float32),
        "opacity": rng.randn(n, 1).astype(np.float32),
        "scaling": rng.uniform(-4, -2, (n, 3)).astype(np.float32),
        "rotation": rng.randn(n, 4).astype(np.float32),
    }
    d = tmp_path / "model" / "point_cloud" / "iteration_50"
    os.makedirs(d)
    save_gaussian_ply(str(d / "point_cloud.ply"), gaussians)
    return str(tmp_path / "model"), gaussians


def _render(g, w=48, h=48):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, w), h)
    W2V = np.eye(4, dtype=np.float32)
    W2V[2, 3] = 4.0
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.asarray(W2V), jnp.asarray(P @ W2V),
                     jnp.asarray(np.linalg.inv(W2V)[:3, 3].astype(np.float32)),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    import jax
    p = preprocess(jnp.asarray(g["xyz"]),
                   jax.nn.sigmoid(jnp.asarray(g["opacity"][:, 0])), cam, w, h,
                   scales=jnp.exp(jnp.asarray(g["scaling"])),
                   rotations=jnp.asarray(g["rotation"]),
                   shs=jnp.concatenate([g["f_dc"], g["f_rest"]], 1),
                   sh_degree=1)
    return np.asarray(rasterize_reference(p, w, h, jnp.zeros(3)))


def test_compress_decompress_roundtrip(tmp_path):
    model, gaussians = _model_dir(tmp_path)
    compress_cli.main(["-m", model, "--num_codes", "64", "--sh_degree", "1"])
    npz = os.path.join(model, "point_cloud", "iteration_50",
                       "point_cloud_compressed.npz")
    assert os.path.exists(npz)
    data = np.load(npz)
    assert data["codes/f_rest"].dtype == np.uint16
    assert data["codebooks/scaling"].shape == (64, 3)
    # untouched attributes stored raw & exact
    np.testing.assert_array_equal(data["raw/xyz"], gaussians["xyz"])

    compress_cli.main(["-m", model, "--decompress", "--sh_degree", "1"])
    dq_path = os.path.join(model, "point_cloud", "iteration_50",
                           "point_cloud_dequant.ply")
    dq = load_gaussian_ply(dq_path, max_sh_degree=1)
    # quantized attributes approximate; raw attributes exact
    np.testing.assert_array_equal(dq["xyz"], gaussians["xyz"])
    np.testing.assert_array_equal(dq["opacity"], gaussians["opacity"])
    assert np.abs(dq["scaling"] - gaussians["scaling"]).mean() < 0.25

    # render fidelity of the dequantized model
    img0 = _render(gaussians)
    img1 = _render(dq)
    mse = float(np.mean((img0 - img1) ** 2))
    psnr = -10 * math.log10(mse + 1e-12)
    assert psnr > 25.0, psnr
