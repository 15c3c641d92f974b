"""High-level render(): the equivalent of gaussian_renderer/__init__.py:19-313.

Pure function from (camera, Gaussian params, pipeline flags, bg) to a render
dict. The reference's speculative grow/split augmentation lives in
models/grow.py and is applied by the train step before calling this.

Returns dict(render [3,H,W], radii [N] int32, visibility_filter [N] bool,
final_T [H,W], overflow counters). Viewspace gradients are obtained by
differentiating w.r.t. the ``ndc_offset`` argument (see
ops/preprocess.py docstring).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..models.gaussians import GaussianParams, activated, get_features
from ..utils.transforms import covariance_from_scaling_rotation, strip_symmetric
from .preprocess import CameraView, preprocess
from .rasterize import RasterConfig, rasterize


def render(camera: CameraView, image_width: int, image_height: int,
           params: GaussianParams, bg_color: jnp.ndarray, *,
           sh_degree: int, alive: Optional[jnp.ndarray] = None,
           scale_modifier: float = 1.0,
           override_color: Optional[jnp.ndarray] = None,
           ndc_offset: Optional[jnp.ndarray] = None,
           compute_cov3d_python: bool = False,
           convert_shs_python: bool = False,
           raster_config: RasterConfig = RasterConfig()):
    scales, rotations, opacity = activated(params)

    kwargs = {}
    if compute_cov3d_python:
        # Oracle path parity flag (PipelineParams.compute_cov3D_python): build
        # Σ3D outside the rasterizer from the same activations.
        cov = covariance_from_scaling_rotation(scales, rotations, scale_modifier)
        kwargs["cov3d_precomp"] = strip_symmetric(cov)
    else:
        kwargs["scales"] = scales
        kwargs["rotations"] = rotations

    if override_color is not None:
        kwargs["colors_precomp"] = override_color
    elif convert_shs_python:
        # Oracle path parity flag (PipelineParams.convert_SHs_python,
        # gaussian_renderer/__init__.py:74-88): evaluate SH→RGB outside the
        # rasterizer and feed precomputed colors.
        from ..utils.sh import sh_to_rgb_clamped
        dirs = params.xyz - camera.campos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb, _ = sh_to_rgb_clamped(sh_degree, get_features(params), dirs)
        kwargs["colors_precomp"] = rgb
    else:
        kwargs["shs"] = get_features(params)
        kwargs["sh_degree"] = sh_degree

    processed = preprocess(
        params.xyz, opacity, camera, image_width, image_height,
        scale_modifier=scale_modifier, ndc_offset=ndc_offset, mask=alive,
        tile_w=raster_config.tile_w, tile_h=raster_config.tile_h, **kwargs)

    image, aux = rasterize(processed, image_width, image_height, bg_color,
                           raster_config)
    return {
        "render": image,
        "radii": aux["radii"],
        "visibility_filter": aux["radii"] > 0,
        "final_T": aux["final_T"],
        "overflow_tiles": aux["overflow_tiles"],
        "overflow_capacity": aux["overflow_capacity"],
        "overflow_visible": aux.get("overflow_visible", 0),
        # total tile instances this frame — the live load the static
        # instance capacity must cover (train loop cap-bucket feedback)
        "instance_load": aux["tile_counts"].sum(),
        # per-camera visible count — visible_cap bucket feedback (round 4)
        "n_mask_visible": aux.get("n_mask_visible", 0),
        # per-frame tier demand — tier_fracs calibration feedback (round 5)
        "tier_need_counts": aux.get("tier_need_counts",
                                    jnp.zeros((0,), jnp.int32)),
    }
