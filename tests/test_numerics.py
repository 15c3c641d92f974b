"""Numerical-containment regression tests (round-3 stability fixes).

Root cause of the round-2 reference-scale divergence: a splat crossing the
camera plane (w_hom ~ -1e-7) produced inf in the perspective divide; although
every consumer of its outputs is visibility-masked, reverse-mode AD turns the
zero cotangent into 0*inf = NaN, which poisons the row's Adam moments, then
its parameters, then (through a NaN depth sort key) the whole instance
ordering — observed as the black-render collapse in runs/refscale2. The CUDA
reference cannot hit this because culled splats never enter its backward
(submodules/diff-gaussian-rasterization preprocessCUDA culls before any math).

Three independent layers are tested: the sanitized preprocess backward, the
optimizer-side scrub_grads guard, and the densify-time quarantine of rows
with non-finite parameters.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.models.densify import (DensifyConfig,
                                                       densify_and_prune)
from mvs_gaussian_splatting_tpu.models.gaussians import (GaussianAux,
                                                         init_from_pcd)
from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
from mvs_gaussian_splatting_tpu.train.optim import adam_init, scrub_grads
from mvs_gaussian_splatting_tpu.train.step import make_train_step
from mvs_gaussian_splatting_tpu.utils import graphics


def _camera(width=64, height=64):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, width), height)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    w2c = np.eye(4, dtype=np.float32)
    return CameraView(jnp.asarray(w2c), jnp.asarray(P.astype(np.float32)),
                      jnp.zeros(3), jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


# positions that historically produced non-finite backward values: exactly on
# the w = -1e-7 singularity, at the camera center (SH view-dir normalize),
# just behind the camera, and on the near-cull boundary
BAD_POSITIONS = [
    [0.1, 0.1, -1e-7],
    [0.0, 0.0, 0.0],
    [0.05, -0.05, -0.01],
    [0.0, 0.1, 0.2],
]


@pytest.mark.parametrize("bad", BAD_POSITIONS)
def test_preprocess_grads_finite_at_singular_positions(bad):
    cam = _camera()
    means = jnp.array([[0.0, 0.0, 5.0], bad], jnp.float32)
    scales = jnp.full((2, 3), 0.1)
    quats = jnp.array([[1.0, 0, 0, 0]] * 2, jnp.float32)
    opac = jnp.array([0.9, 0.9])
    shs = jnp.zeros((2, 16, 3)).at[:, 0].set(0.7)

    def f(m, s, q, o, sh):
        p = preprocess(m, o, cam, 64, 64, scales=s, rotations=q, shs=sh,
                       sh_degree=3)
        mask = p.mask[:, None]
        # touch every differentiable output the way the composite would
        return (jnp.sum(jnp.where(mask, p.xy, 0.0))
                + jnp.sum(jnp.where(mask, p.conic, 0.0))
                + jnp.sum(jnp.where(mask, p.rgb, 0.0))
                + jnp.sum(jnp.where(p.mask, p.opacity, 0.0))
                + jnp.sum(jnp.where(p.mask, p.depth, 0.0)))

    grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(means, scales, quats, opac,
                                                 shs)
    for g in grads:
        assert bool(jnp.isfinite(g).all()), g


def test_preprocess_visible_outputs_unchanged_by_sanitization():
    """The w-guard replacement only touches culled rows: a visible splat's
    outputs must match the raw unsanitized divide bit-for-bit."""
    cam = _camera()
    means = jnp.array([[0.3, -0.2, 4.0]], jnp.float32)
    p = preprocess(means, jnp.array([0.8]), cam, 64, 64,
                   scales=jnp.full((1, 3), 0.2),
                   rotations=jnp.array([[1.0, 0, 0, 0]]),
                   colors_precomp=jnp.ones((1, 3)))
    w = float(means[0, 2])
    x_ndc = float(means[0, 0] * cam.projmatrix[0, 0]) / (w + 1e-7)
    assert np.isclose(float(p.xy[0, 0]), ((x_ndc + 1) * 64 - 1) * 0.5,
                      rtol=1e-6)
    assert bool(p.mask[0])


def test_scrub_grads_zeros_only_bad_rows():
    params, aux = init_from_pcd(
        np.random.RandomState(0).uniform(-1, 1, (8, 3)).astype(np.float32),
        np.random.RandomState(1).rand(8, 3).astype(np.float32), 8,
        sh_degree=1)
    grads = jax.tree.map(jnp.ones_like, params)
    grads = grads._replace(
        xyz=grads.xyz.at[2, 1].set(jnp.nan),
        scaling=grads.scaling.at[5, 0].set(jnp.inf))
    out, n_bad = scrub_grads(grads)
    assert int(n_bad) == 2
    g = np.asarray(out.xyz)
    assert (g[2] == 0).all() and (g[5] == 0).all()
    assert (np.asarray(out.opacity)[2] == 0).all()
    keep = [i for i in range(8) if i not in (2, 5)]
    assert (g[keep] == 1).all()
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.isfinite(leaf).all())


def test_train_step_survives_camera_plane_crossing():
    """End-to-end: a splat sitting on the w singularity must not poison the
    step — params stay finite, the bad row is counted, healthy rows update."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32) + [0, 0, 5.0]
    pts[7] = [0.1, 0.1, -1e-7]   # exactly on the singularity
    params, aux = init_from_pcd(pts, rng.rand(32, 3).astype(np.float32), 32,
                                sh_degree=1)
    adam = adam_init(params)
    cfg = RasterConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                       tile_batch=16, backend="jnp")
    step = make_train_step(OptimizationConfig(), cfg, 1.0)
    cam = _camera()
    gt = jnp.full((3, 64, 64), 0.4)
    p2, a2, aux2, m = step(params, adam, aux, cam, gt, jnp.zeros(3),
                           jnp.int32(1), jnp.asarray(True), width=64,
                           height=64, sh_degree=1)
    for leaf in jax.tree.leaves(p2):
        assert bool(jnp.isfinite(leaf).all())
    for leaf in jax.tree.leaves(a2.mu) + jax.tree.leaves(a2.nu):
        assert bool(jnp.isfinite(leaf).all())
    assert bool(jnp.isfinite(m.loss))
    # healthy rows actually moved
    assert not np.allclose(np.asarray(p2.xyz[:7]), pts[:7])


def test_densify_quarantines_nonfinite_rows():
    rng = np.random.RandomState(0)
    params, aux = init_from_pcd(
        rng.uniform(-1, 1, (16, 3)).astype(np.float32),
        rng.rand(16, 3).astype(np.float32), 32, sh_degree=1)
    params = params._replace(xyz=params.xyz.at[3].set(jnp.nan))
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    cfg = DensifyConfig()
    # extent large enough that the 0.1*extent world-size prune stays silent
    p2, mu2, nu2, aux2, info = densify_and_prune(
        params, mu, nu, aux, jax.random.PRNGKey(0), 100.0, cfg,
        jnp.asarray(True))
    alive = np.asarray(aux2.alive)
    assert not alive[3]
    assert alive[:16].sum() == 15
