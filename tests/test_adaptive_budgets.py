"""Adaptive offline-eval tier budgets (round 4).

Tier caps are fractions of the rendered row count, so the SAME model gets
different per-Gaussian tile budgets depending on how many rows it is rendered
with — the train loop renders a padded capacity bucket while offline render
uses the exact compacted N. On a big-splat view-dependent scene that clipped
splats at tile boundaries and skewed offline PSNR ~0.9 dB below the loop eval
(runs/specscale). adaptive_tier_layout sizes the caps from MEASURED per-view
tile needs so the tiered enumeration equals the flat budget by construction.
"""

import math

import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.models.gaussians import GaussianParams
from mvs_gaussian_splatting_tpu.ops.binning import (adaptive_tier_layout,
                                                    stream_instance_bound)
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _rasterize_stream)
from mvs_gaussian_splatting_tpu.utils import graphics
from mvs_gaussian_splatting_tpu.utils.transforms import normalize


def test_layout_from_counts():
    needs = np.array([2] * 1000 + [10] * 300 + [50] * 40 + [200] * 10)
    d, budgets, fracs, clipped = adaptive_tier_layout(
        needs, 512, (4, 12, 64), (0.0, 0.0, 0.0))
    assert d == 512 and budgets == (4, 12, 64) and clipped == 0
    n = len(needs)
    # counts: need>4 → 350, need>12 → 50, need>64 → 10 (margin 1.1)
    assert fracs[0] >= 350 * 1.1 / n and fracs[1] >= 50 * 1.1 / n
    assert fracs[2] >= 10 * 1.1 / n
    assert fracs[0] >= fracs[1] >= fracs[2]


def test_user_generosity_wins():
    needs = np.zeros(4000, np.int64) + 2   # nobody needs an upgrade
    _, _, fracs, _ = adaptive_tier_layout(needs, 512, (4, 12, 64),
                                          (0.25, 0.1, 0.01))
    assert fracs == (0.25, 0.1, 0.01)


def test_top_budget_escalates_to_need():
    needs = np.array([2] * 2000 + [1500])   # one splat needs 1500 tiles
    d, budgets, fracs, clipped = adaptive_tier_layout(
        needs, 512, (4, 12, 64), (0.25, 0.1, 0.01))
    assert d == 2048 and clipped == 0
    assert budgets == (4, 12, 64)


def test_slot_limit_guard_counts_clipping():
    # 100K rows all claiming the full 512 budget cannot fit in 1M slots;
    # the guard must scale back AND report a nonzero clipped count.
    needs = np.full(100_000, 512, np.int64)
    d, budgets, fracs, clipped = adaptive_tier_layout(
        needs, 512, (4, 12, 64), (0.0, 0.0, 0.0), slot_limit=1_000_000)
    assert stream_instance_bound(len(needs), d, budgets, fracs) <= 1_000_000
    assert clipped > 0


def test_flat_layout_passthrough():
    needs = np.full(1000, 20, np.int64)
    d, budgets, fracs, clipped = adaptive_tier_layout(
        needs, 64, (), ())
    assert (d, budgets, fracs, clipped) == (64, (), (), 0)


def test_eval_config_converts_flat_to_needs_sized_tiers():
    from mvs_gaussian_splatting_tpu.cli.render import adaptive_eval_config
    n = 50_000
    needs = np.full(n, 3, np.int64)
    needs[:400] = 100
    cfg = RasterConfig(max_tiles_per_gaussian=512, tier_budgets=(),
                       tier_fracs=())
    out = adaptive_eval_config(cfg, needs, log=lambda *_: None)
    assert out.tier_budgets == (4, 12, 64)
    # the literal flat budget would demand n*512 = 25.6M slots
    assert out.instance_cap < 2_000_000


def _big_splat_scene(n=2000, n_big=600, seed=0):
    """n rows where ``n_big`` cover ~3x3 tiles: with a (4,)@0.01 tier layout
    the 512-row cap floor leaves n_big-512 of them clipped to 4 tiles."""
    rng = np.random.RandomState(seed)
    W = H = 128
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.asarray(np.eye(4, dtype=np.float32)),
                     jnp.asarray(P.astype(np.float32)), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    pts = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.5, 3.5, n)
    scales = rng.uniform(0.004, 0.01, (n, 3)).astype(np.float32)
    scales[:n_big] = rng.uniform(0.12, 0.2, (n_big, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    p = preprocess(jnp.asarray(pts), jnp.asarray(opac), cam, W, H,
                   scales=jnp.asarray(scales),
                   rotations=normalize(jnp.asarray(quats)),
                   colors_precomp=jnp.asarray(cols),
                   tile_w=16, tile_h=16)
    return p, W, H


def test_adaptive_render_matches_flat_oracle():
    p, W, H = _big_splat_scene()
    needs = np.asarray(jnp.where(
        p.mask,
        jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 0)
        * jnp.maximum(p.rect_max[:, 1] - p.rect_min[:, 1], 0), 0))
    assert int((needs > 4).sum()) > 512, "scene must overflow the cap floor"

    bg = jnp.zeros(3)
    base = RasterConfig(max_tiles_per_gaussian=64, backend="stream",
                        tile_w=16, tile_h=16,
                        tier_budgets=(4,), tier_fracs=(0.01,))
    flat = base._replace(tier_budgets=(), tier_fracs=())
    tx, ty = -(-W // 16), -(-H // 16)

    def run(cfg):
        return _rasterize_stream(p, W, H, bg, cfg, tx, ty, interpret=True)

    img_flat, _ = run(flat)
    img_def, aux_def = run(base)
    assert float(jnp.abs(img_def - img_flat).max()) > 1e-3, \
        "default tiering should visibly clip this scene"
    assert int(aux_def["overflow_tiles"]) > 0

    d, budgets, fracs, clipped = adaptive_tier_layout(
        needs, base.max_tiles_per_gaussian, base.tier_budgets,
        base.tier_fracs)
    assert clipped == 0
    bound = stream_instance_bound(len(needs), d, budgets, fracs)
    ada = base._replace(max_tiles_per_gaussian=d, tier_budgets=budgets,
                        tier_fracs=fracs,
                        instance_cap=bound + (-bound) % 128)
    img_ada, aux_ada = run(ada)
    assert int(aux_ada["overflow_tiles"]) == 0
    np.testing.assert_allclose(np.asarray(img_ada), np.asarray(img_flat),
                               atol=1e-6)
