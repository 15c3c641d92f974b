"""Gaussian scene state as a fixed-capacity functional pytree.

Replaces the reference's mutable ``GaussianModel`` (scene/gaussian_model.py:
25-777). Where the reference resizes parameter tensors and performs Adam-state
surgery on every densification (cat/prune/replace_tensor_to_optimizer,
:386-507), this design keeps **capacity-padded arrays with an alive mask**:
shapes never change inside jit; densification is masked scatter; the Python
driver grows capacity geometrically (one recompile per doubling).

Parameter semantics match the reference exactly:
- activations: exp(scaling), normalize(rotation), sigmoid(opacity)
  (setup_functions :27-42)
- init from point cloud: RGB→SH dc, zero rest, log(sqrt(knn mean-sq-dist))
  scales, identity quats, opacity logit(0.1) (create_from_pcd :200-238)
- research extras (grow-direction/distance, learned split distance/scale)
  use the same parameterizations (:151-165, :223-237)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_sq_dist_to_knn
from ..utils.sh import rgb2sh
from ..utils.transforms import inverse_sigmoid, normalize


class GaussianParams(NamedTuple):
    """Optimized parameters, all [C, ...] with C = capacity (raw, unactivated)."""

    xyz: jnp.ndarray        # [C, 3]
    f_dc: jnp.ndarray       # [C, 1, 3]
    f_rest: jnp.ndarray     # [C, (deg+1)^2-1, 3]
    scaling: jnp.ndarray    # [C, 3] log-scale
    rotation: jnp.ndarray   # [C, 4] unnormalized quaternion (w, x, y, z)
    opacity: jnp.ndarray    # [C, 1] logit
    # Research extras (None when the feature is off → no pytree leaves).
    dirs_prob: Optional[jnp.ndarray] = None       # [C, num_dirs]
    conti_dirs: Optional[jnp.ndarray] = None      # [C, 3]
    grow_dist: Optional[jnp.ndarray] = None       # [C, 1]
    split_distance: Optional[jnp.ndarray] = None  # [C, 3]
    split_scale: Optional[jnp.ndarray] = None     # [C, 1]


class GaussianAux(NamedTuple):
    """Non-optimized per-Gaussian training state."""

    alive: jnp.ndarray           # [C] bool
    max_radii2d: jnp.ndarray     # [C] float32
    xyz_grad_accum: jnp.ndarray  # [C] float32 (accumulated |dL/d ndc_xy|)
    denom: jnp.ndarray           # [C] float32


def activated(params: GaussianParams):
    """(scaling, rotation, opacity) through their activations."""
    return (jnp.exp(params.scaling), normalize(params.rotation),
            jax.nn.sigmoid(params.opacity[:, 0]))


def get_features(params: GaussianParams) -> jnp.ndarray:
    """[C, (deg+1)^2, 3] SH coefficients, dc first."""
    return jnp.concatenate([params.f_dc, params.f_rest], axis=1)


def get_grow_dist(params):
    return 2.0 * jax.nn.sigmoid(params.grow_dist)


def get_split_distance(params):
    return 2.2 * jax.nn.sigmoid(params.split_distance)


def get_split_scale(params):
    return 0.6 * jax.nn.sigmoid(params.split_scale) + 0.5


def num_alive(aux: GaussianAux) -> jnp.ndarray:
    return aux.alive.sum()


def _dead_fill(capacity: int, sh_rest: int, num_dirs: int, with_extras: dict):
    """Safe parameter values for dead slots (never rendered, but keep all math
    finite: tiny scale, identity quat, ~0 opacity)."""
    p = GaussianParams(
        xyz=jnp.zeros((capacity, 3)),
        f_dc=jnp.zeros((capacity, 1, 3)),
        f_rest=jnp.zeros((capacity, sh_rest, 3)),
        scaling=jnp.full((capacity, 3), -10.0),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (capacity, 1)),
        opacity=jnp.full((capacity, 1), -10.0),
        dirs_prob=(jnp.full((capacity, num_dirs), 1.0 / num_dirs)
                   if with_extras.get("grow_dir") else None),
        conti_dirs=(jnp.tile(jnp.array([[1.0, 0, 0]]), (capacity, 1))
                    if with_extras.get("continous_dir") else None),
        grow_dist=(jnp.zeros((capacity, 1)) if with_extras.get("grow_distance") else None),
        split_distance=(jnp.zeros((capacity, 3))
                        if with_extras.get("learn_split_distance") else None),
        split_scale=(jnp.zeros((capacity, 1))
                     if with_extras.get("learn_split_scale") else None),
    )
    return p


def init_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                  sh_degree: int = 3, *, extras: Optional[dict] = None,
                  num_dirs: int = 128,
                  key: Optional[jax.Array] = None):
    """Build (params, aux) from a COLMAP/random point cloud.

    points/colors: [N, 3] numpy. capacity >= N; slots N..C start dead.
    extras: dict of research-feature flags (grow_dir, continous_dir,
    grow_distance, learn_split_distance, learn_split_scale).
    """
    extras = extras or {}
    n = points.shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial points {n}")
    sh_rest = (sh_degree + 1) ** 2 - 1

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_sq_dist_to_knn(pts), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    params = _dead_fill(capacity, sh_rest, num_dirs, extras)
    params = params._replace(
        xyz=params.xyz.at[:n].set(pts),
        f_dc=params.f_dc.at[:n].set(rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        scaling=params.scaling.at[:n].set(scales),
        opacity=params.opacity.at[:n].set(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
    )
    if extras.get("continous_dir"):
        if key is None:
            key = jax.random.PRNGKey(0)
        dirs = normalize(jax.random.normal(key, (n, 3)))
        params = params._replace(conti_dirs=params.conti_dirs.at[:n].set(dirs))

    alive = jnp.arange(capacity) < n
    aux = GaussianAux(alive=alive,
                      max_radii2d=jnp.zeros(capacity),
                      xyz_grad_accum=jnp.zeros(capacity),
                      denom=jnp.zeros(capacity))
    return params, aux


def pad_capacity(params: GaussianParams, aux: GaussianAux, new_capacity: int):
    """Grow storage to ``new_capacity`` (host-side; triggers one recompile)."""
    old = params.xyz.shape[0]
    if new_capacity < old:
        raise ValueError("capacity can only grow")
    extras = {
        "grow_dir": params.dirs_prob is not None,
        "continous_dir": params.conti_dirs is not None,
        "grow_distance": params.grow_dist is not None,
        "learn_split_distance": params.split_distance is not None,
        "learn_split_scale": params.split_scale is not None,
    }
    num_dirs = params.dirs_prob.shape[1] if params.dirs_prob is not None else 128
    fill = _dead_fill(new_capacity, params.f_rest.shape[1], num_dirs, extras)
    new_params = jax.tree.map(
        lambda f, p: f.at[:old].set(p) if p is not None else None, fill, params)
    new_aux = GaussianAux(
        alive=jnp.zeros(new_capacity, bool).at[:old].set(aux.alive),
        max_radii2d=jnp.zeros(new_capacity).at[:old].set(aux.max_radii2d),
        xyz_grad_accum=jnp.zeros(new_capacity).at[:old].set(aux.xyz_grad_accum),
        denom=jnp.zeros(new_capacity).at[:old].set(aux.denom),
    )
    return new_params, new_aux


def compact(params: GaussianParams, aux: GaussianAux):
    """Host-side: gather alive Gaussians to the front (e.g. before PLY export).

    Returns (params_np dict of numpy arrays [n_alive, ...]).
    """
    alive = np.asarray(aux.alive)
    idx = np.nonzero(alive)[0]
    out = {}
    for name, arr in params._asdict().items():
        if arr is not None:
            out[name] = np.asarray(arr)[idx]
    return out


def compact_state(params: GaussianParams, mu, nu, aux: GaussianAux):
    """Permute every per-point array so the alive slots form a PREFIX.

    Jit-safe (fixed shapes, stable order among the alive). Densification
    writes into arbitrary free slots and pruning leaves holes; compacting
    after each densify round lets the training step render a static
    [:render_n] slice instead of the full padded capacity — the binning
    sort, row pack, and backward scatter all scale with the rendered array
    length, which is otherwise 2-4× the live count (initial_capacity_factor
    + geometric growth).
    """
    perm = jnp.argsort(~aux.alive, stable=True)

    def take(leaf):
        return None if leaf is None else leaf[perm]

    new_params = jax.tree.map(take, params)
    new_mu = jax.tree.map(take, mu)
    new_nu = jax.tree.map(take, nu)
    new_aux = GaussianAux(alive=aux.alive[perm],
                          max_radii2d=aux.max_radii2d[perm],
                          xyz_grad_accum=aux.xyz_grad_accum[perm],
                          denom=aux.denom[perm])
    return new_params, new_mu, new_nu, new_aux
