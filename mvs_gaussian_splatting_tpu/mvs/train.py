"""Training driver for the generalizable MVS→Gaussian branch.

Optimizes the MVSGaussianModel network weights (not a per-scene point
cloud): each step picks a (ref, srcs, target) group, predicts a pixel-
aligned Gaussian cloud in the reference camera frame, transforms it to
world, renders the held-out target through the production
preprocess+rasterize path, and backprops the photometric L1 + D-SSIM loss
into the CNNs — the DTU 3-view generalizable setting of BASELINE config #4
(no MVS code exists in the reference tree to port, SURVEY §0).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.preprocess import CameraView, preprocess
from ..ops.rasterize import RasterConfig, rasterize
from ..utils import graphics
from ..utils.losses import l1_loss, psnr, ssim
from ..utils.transforms import (normalize, quat_multiply, rotmat_to_quat)
from .dataset import MVSGroup
from .model import MVSGaussianModel


@dataclass
class MVSConfig:
    iterations: int = 2000
    lr: float = 5e-4
    lr_final_factor: float = 0.1
    num_depths: int = 32
    lambda_dssim: float = 0.2
    # optional depth supervision: L1 between the cost-volume expected depth
    # and the reference view's GT depth map (synthetic fixtures render one;
    # MVSView.depth None disables per group). Normalized by (far - near).
    lambda_depth: float = 0.0
    eval_every: int = 500
    model_path: str = ""
    num_src: int = 2
    seed: int = 0
    backend: str = "auto"
    feat_dims: tuple = (16, 32, 32)


class MVSBatch(NamedTuple):
    """One group as device arrays (a jit-friendly pytree)."""

    ref_image: jnp.ndarray       # [3, H, W]
    src_images: jnp.ndarray      # [V, 3, H, W]
    k_ref_feat: jnp.ndarray      # [3, 3] intrinsics at feature (H/4) scale
    k_src_feats: jnp.ndarray     # [V, 3, 3]
    rel_rs: jnp.ndarray          # [V, 3, 3] ref-cam → src-cam
    rel_ts: jnp.ndarray          # [V, 3]
    near: jnp.ndarray            # []
    far: jnp.ndarray             # []
    w2c_ref: jnp.ndarray         # [4, 4]
    target_cam: CameraView
    target_image: jnp.ndarray    # [3, H, W]
    ref_depth: jnp.ndarray       # [H, W] GT depth (0 where unknown)
    has_depth: jnp.ndarray       # [] 1.0 when ref_depth is real


def _feat_k(K: np.ndarray, scale: float = 0.25) -> np.ndarray:
    k = K.copy().astype(np.float32)
    k[0] *= scale
    k[1] *= scale
    return k


def _camera_view(view) -> CameraView:
    fovx = 2.0 * math.atan(view.width / (2.0 * view.K[0, 0]))
    fovy = 2.0 * math.atan(view.height / (2.0 * view.K[1, 1]))
    P = graphics.projection_matrix(0.05 * view.near, 10.0 * view.far,
                                   fovx, fovy)
    w2c = view.w2c.astype(np.float32)
    return CameraView(jnp.asarray(w2c),
                      jnp.asarray((P @ w2c).astype(np.float32)),
                      jnp.asarray(np.linalg.inv(w2c)[:3, 3].astype(np.float32)),
                      jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


def group_to_batch(g: MVSGroup) -> MVSBatch:
    ref = g.ref
    R_r = ref.w2c[:3, :3]
    t_r = ref.w2c[:3, 3]
    rel_rs, rel_ts, k_srcs = [], [], []
    for s in g.srcs:
        R_s = s.w2c[:3, :3]
        t_s = s.w2c[:3, 3]
        R_rel = R_s @ R_r.T
        rel_rs.append(R_rel)
        rel_ts.append(t_s - R_rel @ t_r)
        k_srcs.append(_feat_k(s.K))
    return MVSBatch(
        ref_image=jnp.asarray(ref.image),
        src_images=jnp.stack([jnp.asarray(s.image) for s in g.srcs]),
        k_ref_feat=jnp.asarray(_feat_k(ref.K)),
        k_src_feats=jnp.asarray(np.stack(k_srcs)),
        rel_rs=jnp.asarray(np.stack(rel_rs).astype(np.float32)),
        rel_ts=jnp.asarray(np.stack(rel_ts).astype(np.float32)),
        near=jnp.float32(ref.near),
        far=jnp.float32(ref.far),
        w2c_ref=jnp.asarray(ref.w2c),
        target_cam=_camera_view(g.target),
        target_image=jnp.asarray(g.target.image),
        ref_depth=jnp.asarray(
            ref.depth if ref.depth is not None
            else np.zeros(ref.image.shape[1:], np.float32)),
        has_depth=jnp.float32(0.0 if ref.depth is None else 1.0),
    )


def gaussians_to_world(out: dict, w2c_ref: jnp.ndarray):
    """Predicted ref-camera-frame Gaussians → world frame.

    X_w = Rᵀ(X_c − t); rotations compose with the cam→world quaternion."""
    R = w2c_ref[:3, :3]
    t = w2c_ref[:3, 3]
    xyz_w = (out["xyz_cam"] - t) @ R        # rows: Rᵀ @ x
    q_c2w = rotmat_to_quat(R.T)
    rot_w = quat_multiply(q_c2w[None, :], normalize(out["rotation"]))
    return xyz_w, rot_w


def render_predicted(out: dict, batch: MVSBatch, width: int, height: int,
                     raster_cfg: RasterConfig):
    xyz_w, rot_w = gaussians_to_world(out, batch.w2c_ref)
    p = preprocess(xyz_w, jax.nn.sigmoid(out["opacity_logit"][:, 0]),
                   batch.target_cam, width, height,
                   scales=jnp.exp(out["log_scaling"]),
                   rotations=rot_w,
                   colors_precomp=out["colors"],
                   tile_w=raster_cfg.tile_w, tile_h=raster_cfg.tile_h)
    img, aux = rasterize(p, width, height, jnp.zeros(3), raster_cfg)
    return img, aux


def make_mvs_train_step(model: MVSGaussianModel, cfg: MVSConfig,
                        raster_cfg: RasterConfig, width: int, height: int,
                        tx: optax.GradientTransformation):
    def apply_model(variables, batch: MVSBatch):
        return model.apply(variables, batch.ref_image, batch.src_images,
                           batch.k_ref_feat, batch.k_src_feats,
                           batch.rel_rs, batch.rel_ts, batch.near, batch.far)

    @jax.jit
    def train_step(variables, opt_state, batch: MVSBatch):
        def loss_fn(vs):
            out = apply_model(vs, batch)
            img, _ = render_predicted(out, batch, width, height, raster_cfg)
            l1 = l1_loss(img, batch.target_image)
            loss = ((1.0 - cfg.lambda_dssim) * l1
                    + cfg.lambda_dssim * (1.0 - ssim(img, batch.target_image)))
            if cfg.lambda_depth > 0:
                # supervise the cost-volume expected depth against the ref
                # view's GT depth (resized to feature scale, masked where
                # the GT map has no coverage), scale-normalized. The GT map
                # encodes holes as 0: a bilinear resize of the raw map would
                # blend those zeros into valid pixels across hole boundaries,
                # supervising boundary depths toward attenuated values — so
                # resize the coverage mask separately and keep only pixels
                # fully inside valid coverage (resized mask ≈ 1).
                pred = out["depth"]                                 # [h, w]
                gt = jax.image.resize(batch.ref_depth, pred.shape,
                                      "bilinear")
                cov = jax.image.resize(
                    (batch.ref_depth > 0).astype(jnp.float32), pred.shape,
                    "bilinear")
                m = (cov >= 0.999).astype(jnp.float32) * batch.has_depth
                derr = (jnp.abs(pred - gt) * m).sum() / jnp.maximum(
                    m.sum(), 1.0) / (batch.far - batch.near)
                loss = loss + cfg.lambda_depth * derr
            return loss, l1

        (loss, l1), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss, l1

    @jax.jit
    def eval_step(variables, batch: MVSBatch):
        out = apply_model(variables, batch)
        img, _ = render_predicted(out, batch, width, height, raster_cfg)
        img = jnp.clip(img, 0.0, 1.0)
        return psnr(img, jnp.clip(batch.target_image, 0.0, 1.0))[0], img

    return train_step, eval_step


def train_mvs(cfg: MVSConfig, groups: List[MVSGroup],
              eval_groups: Optional[List[MVSGroup]] = None,
              log_fn: Callable[[str], None] = print):
    """Train the generalizable model on a list of MVS groups.

    Returns (variables, history) with history["psnr_eval"] keyed by iteration.
    """
    if not groups:
        raise ValueError("no training groups")
    height, width = groups[0].target.image.shape[1:]
    backend = cfg.backend
    if backend == "auto":
        backend = "stream" if jax.default_backend() == "tpu" else "jnp"
    raster_cfg = RasterConfig(tile_capacity=512, max_tiles_per_gaussian=16,
                              tile_batch=32, backend=backend)

    model = MVSGaussianModel(num_depths=cfg.num_depths,
                             feat_dims=cfg.feat_dims)
    batches = [group_to_batch(g) for g in groups]
    eval_batches = [group_to_batch(g) for g in (eval_groups or [])]

    b0 = batches[0]
    variables = model.init(jax.random.PRNGKey(cfg.seed), b0.ref_image,
                           b0.src_images, b0.k_ref_feat, b0.k_src_feats,
                           b0.rel_rs, b0.rel_ts, b0.near, b0.far)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    log_fn(f"MVS model: {n_params / 1e3:.1f}K parameters, "
           f"{len(batches)} train groups, {width}x{height}, "
           f"backend={backend}")

    sched = optax.exponential_decay(cfg.lr, cfg.iterations,
                                    cfg.lr_final_factor)
    tx = optax.adam(sched)
    opt_state = tx.init(variables)
    train_step, eval_step = make_mvs_train_step(model, cfg, raster_cfg,
                                                width, height, tx)

    rng = np.random.RandomState(cfg.seed)
    history = {"loss": [], "psnr_eval": {}}
    ema = None
    t0 = time.perf_counter()
    for it in range(1, cfg.iterations + 1):
        batch = batches[rng.randint(len(batches))]
        variables, opt_state, loss, l1 = train_step(variables, opt_state,
                                                    batch)
        if it % 10 == 0 or it == cfg.iterations:
            lv = float(loss)
            ema = lv if ema is None else 0.4 * lv + 0.6 * ema
            history["loss"].append((it, lv))
        if it % max(1, cfg.eval_every) == 0 or it == cfg.iterations:
            evb = eval_batches or batches[:4]
            ps = float(np.mean(jax.device_get(
                [eval_step(variables, b)[0] for b in evb])))
            history["psnr_eval"][it] = ps
            dt = time.perf_counter() - t0
            log_fn(f"[ITER {it}] loss {ema:.5f} eval PSNR {ps:.2f} "
                   f"({it / dt:.1f} it/s)")
    if cfg.model_path:
        save_mvs_checkpoint(f"{cfg.model_path}/mvs_model.msgpack", variables,
                            cfg)
        log_fn(f"saved {cfg.model_path}/mvs_model.msgpack")
    return variables, history


def save_mvs_checkpoint(path: str, variables, cfg: MVSConfig) -> None:
    import os

    from flax import serialization
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    meta = {"num_depths": cfg.num_depths, "feat_dims": list(cfg.feat_dims),
            "num_src": cfg.num_src}
    import json
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_mvs_checkpoint(path: str):
    """Returns (model, variables) reconstructed from a saved checkpoint."""
    import json

    from flax import serialization
    with open(path + ".json") as f:
        meta = json.load(f)
    model = MVSGaussianModel(num_depths=meta["num_depths"],
                             feat_dims=tuple(meta["feat_dims"]))
    # template init on dummy shapes happens at first apply; restore raw bytes
    with open(path, "rb") as f:
        data = f.read()

    def restore(template_variables):
        return serialization.from_bytes(template_variables, data)

    return model, restore
