"""Visible-prefix compaction (RasterConfig.visible_cap, round 4).

Masked rows sort to the depth order's tail, so truncating to a bound on the
visible count must be EXACTLY invisible to the stream pipeline whenever the
bound covers every visible Gaussian: identical packed rows, segments, and
gradients. When the bound is too small, the shortfall must be counted in
overflow_visible — never silent.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      bin_and_pack_stream)
from mvs_gaussian_splatting_tpu.utils import graphics
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W = H = 64
CFG = RasterConfig(max_tiles_per_gaussian=16, backend="stream",
                   tier_budgets=(4,), tier_fracs=(0.25,))


def _scene(n=200, seed=0):
    """Half the cloud in front of the camera, half behind/off-frustum."""
    rng = np.random.RandomState(seed)
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.asarray(np.eye(4, dtype=np.float32)),
                     jnp.asarray(P.astype(np.float32)), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    pts = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    pts[n // 2:, 2] -= 8.0          # behind the camera → masked
    scales = rng.uniform(0.05, 0.15, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return cam, pts, scales, quats, opac, cols


def _pack(cam, pts, scales, quats, opac, cols, cfg):
    p = preprocess(jnp.asarray(pts), jnp.asarray(opac), cam, W, H,
                   scales=jnp.asarray(scales),
                   rotations=normalize(jnp.asarray(quats)),
                   colors_precomp=jnp.asarray(cols),
                   tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    tx, ty = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
    return p, bin_and_pack_stream(p, tx, ty, cfg)


def test_generous_cap_is_invisible():
    cam, *scene = _scene()
    p, (bins_f, attrs_f) = _pack(cam, *scene, CFG)
    n_vis = int(np.asarray(p.mask).sum())
    v = n_vis + 8
    p2, (bins_v, attrs_v) = _pack(cam, *scene,
                                  CFG._replace(visible_cap=v))
    np.testing.assert_array_equal(np.asarray(attrs_f), np.asarray(attrs_v))
    np.testing.assert_array_equal(np.asarray(bins_f.seg_start),
                                  np.asarray(bins_v.seg_start))
    np.testing.assert_array_equal(np.asarray(bins_f.counts),
                                  np.asarray(bins_v.counts))
    np.testing.assert_array_equal(np.asarray(bins_f.inst_rank),
                                  np.asarray(bins_v.inst_rank))
    assert int(bins_v.overflow_visible) == 0
    assert int(bins_f.overflow_visible) == 0


def test_gradient_parity():
    cam, pts, scales, quats, opac, cols = _scene(seed=1)

    def loss(xyz, cfg):
        p = preprocess(xyz, jnp.asarray(opac), cam, W, H,
                       scales=jnp.asarray(scales),
                       rotations=normalize(jnp.asarray(quats)),
                       colors_precomp=jnp.asarray(cols),
                       tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        tx, ty = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
        _, attrs = bin_and_pack_stream(p, tx, ty, cfg)
        w = jnp.sin(jnp.arange(attrs.size, dtype=jnp.float32)
                    ).reshape(attrs.shape)
        return (attrs * w).sum()

    xyz = jnp.asarray(pts)
    g_full = jax.grad(lambda x: loss(x, CFG))(xyz)
    p0 = preprocess(xyz, jnp.asarray(opac), cam, W, H,
                    scales=jnp.asarray(scales),
                    rotations=normalize(jnp.asarray(quats)),
                    colors_precomp=jnp.asarray(cols))
    v = int(np.asarray(p0.mask).sum()) + 4
    g_cap = jax.grad(lambda x: loss(x, CFG._replace(visible_cap=v)))(xyz)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_cap),
                               rtol=1e-6, atol=1e-7)


def test_tight_cap_counts_overflow():
    cam, *scene = _scene(seed=2)
    p, (bins_f, _) = _pack(cam, *scene, CFG)
    n_vis = int(np.asarray(p.mask).sum())
    assert n_vis > 16
    v = n_vis - 10
    _, (bins_v, _) = _pack(cam, *scene, CFG._replace(visible_cap=v))
    assert int(bins_v.overflow_visible) == 10
    # the kept rows are the NEAREST v visible ones: instance count shrinks
    assert int(bins_v.counts_raw.sum()) <= int(bins_f.counts_raw.sum())


def test_bucketed_scatter_matches_plain():
    """The bucketed backward scatter (ops.rasterize._bucketed_scatter_add)
    must be exactly the plain scatter-add for any bucket split."""
    from mvs_gaussian_splatting_tpu.ops.rasterize import _bucketed_scatter_add

    rng = np.random.RandomState(0)
    m, n, w = 1000, 331, 16
    idx = jnp.asarray(rng.randint(0, n, m).astype(np.int32))
    rows = jnp.asarray(rng.rand(m, w).astype(np.float32))
    want = jnp.zeros((n, w)).at[idx].add(rows)
    for fast_rows in (50, 100, 331, 1000):
        for widened in (False, True):
            got = _bucketed_scatter_add(rows, idx, n, fast_rows=fast_rows,
                                        widened=widened)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6, atol=1e-7)


def test_gather_inst_rows_custom_vjp():
    """Forward and gradient of the custom pack gather match the plain
    where(valid, table[rank], 0) expression (incl. under vmap — the DP
    batch step vmaps the render)."""
    from mvs_gaussian_splatting_tpu.ops.rasterize import _gather_inst_rows

    rng = np.random.RandomState(1)
    n, m, w = 97, 400, 16
    table = jnp.asarray(rng.rand(n, w).astype(np.float32))
    rank = jnp.asarray(rng.randint(0, n, m).astype(np.int32))
    valid = jnp.asarray(rng.rand(m) > 0.3)
    wts = jnp.asarray(rng.rand(m, w).astype(np.float32))

    def plain(t):
        return (jnp.where(valid[:, None], t[rank], 0.0) * wts).sum()

    def custom(t):
        return (_gather_inst_rows(t, rank, valid).T * wts).sum()

    np.testing.assert_allclose(float(custom(table)), float(plain(table)),
                               rtol=1e-6)
    g_p = jax.grad(plain)(table)
    g_c = jax.grad(custom)(table)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p),
                               rtol=1e-6, atol=1e-7)

    # vmap over a batch of tables (the camera-DP structure)
    tb = jnp.stack([table, table * 0.5])
    g_b = jax.vmap(jax.grad(custom))(tb)
    np.testing.assert_allclose(np.asarray(g_b[0]), np.asarray(g_p),
                               rtol=1e-6, atol=1e-7)


def test_cap_larger_than_n_is_noop():
    cam, *scene = _scene(seed=3)
    _, (bins_f, attrs_f) = _pack(cam, *scene, CFG)
    _, (bins_v, attrs_v) = _pack(cam, *scene,
                                 CFG._replace(visible_cap=10_000))
    np.testing.assert_array_equal(np.asarray(attrs_f), np.asarray(attrs_v))
    assert int(bins_v.overflow_visible) == 0
