"""Tile-sharded composite vs single-device path on the 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _assemble_image, rasterize)
from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
from mvs_gaussian_splatting_tpu.parallel.tile_parallel import (
    make_tile_sharded_composite)
from mvs_gaussian_splatting_tpu.utils import graphics

W, H = 128, 64   # 8×4 = 32 tiles over 8 devices


def make_scene(n=120, seed=0):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P_ = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.eye(4), jnp.asarray(P_), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    rng = np.random.RandomState(seed)
    z = rng.uniform(2, 6, n)
    means = np.stack([rng.uniform(-0.8, 0.8, n) * z,
                      rng.uniform(-0.6, 0.6, n) * z, z], -1).astype(np.float32)
    return preprocess(
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)), cam, W, H,
        scales=jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        rotations=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))


def test_tile_sharded_matches_single_device():
    p = make_scene()
    bg = jnp.array([0.2, 0.3, 0.4])
    cfg = RasterConfig(tile_capacity=128, tile_batch=8, backend="jnp")
    ref_img, _ = rasterize(p, W, H, bg, cfg)

    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_composite(mesh, "tile", W, H, cfg)
    with mesh:
        tiles_out, final_T, aux = jax.jit(fn)(p, bg)
    img = _assemble_image(tiles_out, W // 16, H // 16, 16, 16, W, H)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5, rtol=1e-4)


def test_tile_sharded_gradients():
    p_in = make_scene(80, 3)
    bg = jnp.zeros(3)
    cfg = RasterConfig(tile_capacity=128, tile_batch=8, backend="jnp")
    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_composite(mesh, "tile", W, H, cfg)

    def loss_sharded(xy):
        p2 = p_in._replace(xy=xy)
        with mesh:
            tiles_out, _, _ = fn(p2, bg)
        return (tiles_out ** 2).sum()

    def loss_ref(xy):
        p2 = p_in._replace(xy=xy)
        img, _ = rasterize(p2, W, H, bg, cfg)
        return (img ** 2).sum()

    with mesh:
        g_s = jax.jit(jax.grad(loss_sharded))(p_in.xy)
    g_r = jax.jit(jax.grad(loss_ref))(p_in.xy)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               atol=1e-3, rtol=1e-3)
