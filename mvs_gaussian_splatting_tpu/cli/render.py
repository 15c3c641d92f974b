"""Render CLI — the equivalent of the reference's render.py.

Loads a trained model at iteration N and renders train/test sets to PNG
(renders/ + gt/), reading cfg_args.json from the model dir like
get_combined_args (arguments/__init__.py:110-130, minus the eval()).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data.scene import Scene
from ..models.gaussians import GaussianParams
from ..models.ply import load_gaussian_ply
from ..ops.render import render
from ..train.config import ModelConfig, PipelineConfig, load_cfg_args
from ..train.loop import raster_config_from_pipe
from ..utils.system import search_max_iteration
from .args import add_dataclass_args, extract, merge_with_saved


def params_from_ply(path: str, sh_degree: int) -> GaussianParams:
    d = load_gaussian_ply(path, max_sh_degree=sh_degree)
    return GaussianParams(xyz=jnp.asarray(d["xyz"]),
                          f_dc=jnp.asarray(d["f_dc"]),
                          f_rest=jnp.asarray(d["f_rest"]),
                          scaling=jnp.asarray(d["scaling"]),
                          rotation=jnp.asarray(d["rotation"]),
                          opacity=jnp.asarray(d["opacity"]))


def save_image(img, path: str) -> None:
    arr = np.asarray(jnp.clip(img, 0.0, 1.0))
    Image.fromarray((arr.transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)
                    ).save(path)


def eval_raster_config(pipe_cfg, n_gaussians: int = 0):
    """Offline rendering is an EVAL surface: exact compositing and GENEROUS
    per-Gaussian tile budgets, whatever the training-side defaults say.

    The training loop can afford tight budgets because densification
    statistics and pruning co-adapt to them; a saved model rendered with a
    small flat budget clips large splats to partial tile patches — measured
    6.7 dB on a converged model carrying large smooth splats (21.95 with the
    (4,12)@128 default vs 28.62 with (4,12,64)@512, runs/cleanscale).
    User-passed flags still win when they ask for MORE.

    ``n_gaussians``: when given, the stream instance capacity is set to the
    exact tier-enumeration bound so GLOBAL capacity overflow (which drops
    whole tiles, tile-major) is impossible by construction — the a-priori
    auto heuristic undersizes for big-splat models and cost ~4 dB on the
    first corrected render of runs/cleanscale."""
    from ..ops.rasterize import widen_eval_budgets
    cfg = widen_eval_budgets(
        raster_config_from_pipe(pipe_cfg)._replace(fast_math=False))
    if n_gaussians:
        from ..ops.binning import stream_instance_bound
        bound = stream_instance_bound(n_gaussians, cfg.max_tiles_per_gaussian,
                                      cfg.tier_budgets, cfg.tier_fracs)
        cfg = cfg._replace(instance_cap=bound + (-bound) % 128)
    return cfg


def measure_tile_needs(params: GaussianParams, cameras, tile_w: int,
                       tile_h: int) -> np.ndarray:
    """Per-Gaussian worst-case tile count over ``cameras``: the projected
    rect area of each visible splat, maxed across views (preprocess only —
    ~N-row cost per camera, no rasterization)."""
    import functools

    import jax

    from ..models.gaussians import activated
    from ..ops.preprocess import preprocess

    scales, rotations, opacity = activated(params)
    dummy_rgb = jnp.zeros_like(params.xyz)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def one(view, w, h):
        p = preprocess(params.xyz, opacity, view, w, h, scales=scales,
                       rotations=rotations, colors_precomp=dummy_rgb,
                       tile_w=tile_w, tile_h=tile_h)
        area = (jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 0)
                * jnp.maximum(p.rect_max[:, 1] - p.rect_min[:, 1], 0))
        return jnp.where(p.mask, area, 0).astype(jnp.int32)

    needs = np.zeros(params.xyz.shape[0], np.int64)
    for cam in cameras:
        w, h = int(cam.image.shape[2]), int(cam.image.shape[1])
        needs = np.maximum(needs, np.asarray(one(cam.view(), w, h)))
    return needs


def adaptive_eval_config(cfg, needs: np.ndarray, log=print):
    """Resize ``cfg``'s tier layout from measured tile needs (see
    ops/binning.adaptive_tier_layout) and re-derive the exact instance cap.
    Tier caps are fractions of the rendered row count, so the same model
    clips differently in the loop (padded capacity bucket) and offline
    (exact N); measuring needs makes offline rendering clip-free by
    construction — the n-dependent ~1 dB eval skew seen on big-splat
    view-dependent scenes (runs/specscale)."""
    from ..ops.binning import adaptive_tier_layout, stream_instance_bound
    n = int(needs.shape[0])
    # A flat () layout means "never clip" — with measured needs, a
    # needs-sized tier ladder renders EXACTLY the same image (parity test in
    # tests/test_adaptive_budgets.py) at a fraction of the n·d instance
    # slots a literal flat budget implies (59M at 115K rows), so adaptive
    # honors the intent, not the encoding.
    budgets_in = cfg.tier_budgets or (4, 12, 64)
    fracs_in = cfg.tier_fracs if cfg.tier_budgets else (0.0, 0.0, 0.0)
    d, budgets, fracs, n_clipped = adaptive_tier_layout(
        needs, cfg.max_tiles_per_gaussian, budgets_in, fracs_in,
        quantize=True)
    if n_clipped:
        log(f"WARNING: adaptive budgets hit the slot limit — {n_clipped} "
            f"Gaussians render with fewer tiles than they need")
    bound = stream_instance_bound(n, d, budgets, fracs)
    log(f"adaptive eval budgets: max_tiles {d}, tiers {budgets} @ "
        f"fracs {tuple(round(f, 4) for f in fracs)} "
        f"(need max {int(needs.max()) if n else 0}, instance cap {bound})")
    return cfg._replace(max_tiles_per_gaussian=d, tier_budgets=budgets,
                        tier_fracs=fracs,
                        instance_cap=bound + (-bound) % 128)


def render_set(model_path, name, iteration, cameras, params, bg, sh_degree,
               raster_cfg):
    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gt_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gt_path, exist_ok=True)
    for idx, cam in enumerate(cameras):
        out = render(cam.view(), cam.image.shape[2], cam.image.shape[1],
                     params, bg, sh_degree=sh_degree, raster_config=raster_cfg)
        save_image(out["render"], os.path.join(render_path, f"{idx:05d}.png"))
        save_image(jnp.asarray(cam.image), os.path.join(gt_path, f"{idx:05d}.png"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="Testing script parameters")
    add_dataclass_args(parser, ModelConfig, sentinel=True)
    add_dataclass_args(parser, PipelineConfig)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--adaptive_budgets",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="size tier budgets from the measured per-view "
                        "tile needs so no splat is clipped (default on)")
    args = parser.parse_args(argv)

    try:
        saved = load_cfg_args(args.model_path)
    except (FileNotFoundError, TypeError):
        saved = None
    model_cfg = merge_with_saved(ModelConfig, args, saved)
    model_cfg.model_path = args.model_path
    pipe_cfg = extract(PipelineConfig, args)

    retained = os.path.join(model_cfg.model_path, "point_cloud_final.ply.gz")
    iteration = args.iteration
    if iteration == -1:
        try:
            iteration = search_max_iteration(
                os.path.join(model_cfg.model_path, "point_cloud"))
        except (FileNotFoundError, ValueError):
            iteration = -1
    if iteration == -1:
        if os.path.exists(retained):
            iteration = "final"
        else:
            raise FileNotFoundError(
                f"no checkpoint under "
                f"{os.path.join(model_cfg.model_path, 'point_cloud')} and no "
                f"retained point_cloud_final.ply.gz — nothing to render")
    print(f"Rendering {model_cfg.model_path} at iteration {iteration}")

    scene = Scene(model_cfg, load_iteration=iteration, shuffle=False)
    ply = os.path.join(model_cfg.model_path, "point_cloud",
                       f"iteration_{iteration}", "point_cloud.ply")
    if not os.path.exists(ply) and os.path.exists(retained):
        # Validation runs retain only the gzipped final model (run artifacts
        # gitignore the raw point_cloud/ tree) — fall back to it so committed
        # runs stay re-renderable across rounds.
        print(f"using retained final model {retained}")
        ply = retained
    params = params_from_ply(ply, model_cfg.sh_degree)
    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    raster_cfg = eval_raster_config(pipe_cfg,
                                    n_gaussians=int(params.xyz.shape[0]))
    if args.adaptive_budgets:
        cams = (([] if args.skip_train else list(scene.get_train_cameras()))
                + ([] if args.skip_test else list(scene.get_test_cameras())))
        if cams:
            needs = measure_tile_needs(params, cams, raster_cfg.tile_w,
                                       raster_cfg.tile_h)
            raster_cfg = adaptive_eval_config(raster_cfg, needs)

    if not args.skip_train:
        render_set(model_cfg.model_path, "train", iteration,
                   scene.get_train_cameras(), params, bg,
                   model_cfg.sh_degree, raster_cfg)
    if not args.skip_test:
        render_set(model_cfg.model_path, "test", iteration,
                   scene.get_test_cameras(), params, bg,
                   model_cfg.sh_degree, raster_cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
