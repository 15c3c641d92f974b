"""Reference-workload training benchmark: full train step at fern-r=4 scale.

The reference's measured training throughput is ~35-36 it/s late-training on
LLFF fern at r=4 (504x378, ~10K init -> ~250K densified points) on one Ampere
GPU (SURVEY §6, slurm-36838919.out). This benchmark times OUR full jitted
train step — render fwd, L1+D-SSIM loss, backward to every parameter, Adam
update, densification-stats accumulation — at the late-training point count
(250K Gaussians, 504x378) on one TPU chip.

Prints one JSON line: {"metric": "fern_r4_train_it_s", ...,
"vs_baseline": it_s / 35.0}. (bench.py remains the driver-facing 1080p
benchmark; this one exists for the reference-workload comparison and is
referenced from README.md / BASELINE.md.)
"""

import argparse
import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# Reference workloads (BASELINE.md): fern r=4 late-training and MipNeRF-360
# bicycle r=4. The bicycle baseline (~10-19 it/s on Ampere,
# slurm-37710266.out) does not publish its densified point count; 500K is a
# mid-range assumption from exp.xlsx ("25w"-"121w") — recorded in extras.
WORKLOADS = {
    "fern": dict(width=504, height=378, n=250_000, base=35.0,
                 base_note="reference ~35 it/s late-training, 1x Ampere "
                           "(slurm-36838919.out)"),
    "bicycle": dict(width=1237, height=822, n=500_000, base=15.0,
                    base_note="reference ~10-19 it/s, 1x Ampere "
                              "(slurm-37710266.out); 500K assumed "
                              "late-training count"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exact", action="store_true",
                        help="exact compositing (fast_math is the "
                             "PSNR-validated train default since round 3)")
    parser.add_argument("--workload", choices=sorted(WORKLOADS),
                        default="fern")
    parser.add_argument("--visible_frac", type=float, default=1.0,
                        help="fraction of the cloud inside this camera's "
                             "frustum (round 4): real 360-degree captures "
                             "sit at ~0.4-0.7 for any one camera (the rest "
                             "is behind/off-frustum — the reference's CUDA "
                             "path culls those before binning); 1.0 keeps "
                             "the legacy all-visible workload")
    parser.add_argument("--visible_cap", action="store_true",
                        help="enable visible-prefix compaction "
                             "(RasterConfig.visible_cap) calibrated from "
                             "the measured visible count")
    wargs = parser.parse_args()
    wl = WORKLOADS[wargs.workload]
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from bench import build_scene
    from mvs_gaussian_splatting_tpu.models.gaussians import (GaussianAux,
                                                             GaussianParams)
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
    from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
    from mvs_gaussian_splatting_tpu.train.optim import adam_init
    from mvs_gaussian_splatting_tpu.train.step import make_train_step

    width, height = wl["width"], wl["height"]
    n = wl["n"]
    backend = "stream" if jax.default_backend() == "tpu" else "jnp"
    tile_w, tile_h = (32, 16) if backend == "stream" else (16, 16)
    cfg = RasterConfig(tile_w=tile_w, tile_h=tile_h, tile_capacity=1024,
                       max_tiles_per_gaussian=32, tile_batch=256,
                       backend=backend, fast_math=not wargs.exact)
    cam, (means, log_scales, quats, opac_logit, shs) = build_scene(
        n, width, height)
    if wargs.visible_frac < 1.0:
        # move the tail of the cloud behind the camera (z < near): the
        # preprocess masks them exactly like a real 360-degree scene's
        # out-of-frustum points
        rng_v = np.random.RandomState(7)
        n_out = int(n * (1.0 - wargs.visible_frac))
        out_idx = rng_v.choice(n, n_out, replace=False)
        m = np.array(means)                      # copy: jax arrays are r/o
        m[out_idx, 2] = -np.abs(m[out_idx, 2]) - 1.0
        import jax.numpy as _jnp
        means = _jnp.asarray(m)
    params = GaussianParams(xyz=means, f_dc=shs[:, :1], f_rest=shs[:, 1:],
                            scaling=log_scales, rotation=quats,
                            opacity=opac_logit[:, None])
    aux = GaussianAux(alive=jnp.ones((n,), bool),
                      max_radii2d=jnp.zeros((n,)),
                      xyz_grad_accum=jnp.zeros((n,)),
                      denom=jnp.zeros((n,)))
    adam = adam_init(params)
    opt_cfg = OptimizationConfig()
    step_fn = make_train_step(opt_cfg, cfg, spatial_lr_scale=4.4)

    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.rand(3, height, width).astype(np.float32))
    bg = jnp.zeros(3)

    # CHAINED timing with a terminal VALUE fetch: each step consumes the
    # previous step's outputs (exactly like the real training loop), and the
    # timed region ends with a host fetch of the final scalar loss. Both are
    # required on the serving tunnel: an unchained salted burst of this step
    # measured a fake 0.56 ms/step, and even a chained burst that only calls
    # block_until_ready (no value fetch) reports ~0.5 ms/step — the tunnel
    # resolves readiness of never-fetched large outputs without executing.
    # A chained burst anchored by a scalar fetch reproduces the synchronous
    # per-step time minus dispatch round-trip (~460 ms → ~73 ms real device
    # time at this workload after the separable-SSIM fix).
    salt = (time.time_ns() % 997) * 1e-9
    params = params._replace(xyz=means + salt)
    # NB: every step_fn call below passes instance_cap/visible_cap/
    # tier_fracs EXPLICITLY — jax.jit's cache key distinguishes a defaulted
    # static kwarg from an explicitly-passed equal value, so a mixed calling
    # style compiles duplicate programs (one landed INSIDE the timed loop:
    # 28 s of compile amortized into the 20-step window read as 1.4 s/step,
    # round 5).
    params, adam, aux, m = step_fn(params, adam, aux, cam, gt, bg,
                                   jnp.int32(20_000), jnp.bool_(True),
                                   width=width, height=height, sh_degree=3,
                                   instance_cap=0, visible_cap=0,
                                   tier_fracs=())
    # calibrate the static instance cap to the measured load (the train
    # loop's _instance_bucket feedback, one-shot here); overflow ⇒ auto
    inst_cap = 0
    vis_cap = 0
    tier_fracs = ()
    if backend == "stream":
        load = int(m.instance_load)
        inst_cap = load + int(0.12 * load)
        inst_cap += (-inst_cap) % 128
        if wargs.visible_cap:
            # visible-prefix compaction bucket (loop feedback, one-shot)
            vis_cap = int(int(m.mask_visible) * 1.15)
            if vis_cap >= n:
                vis_cap = 0
        # scene-calibrated tier prefixes from the measured per-frame tier
        # demand (round 5): the static (0.25, 0.1) fracs over-enumerate the
        # packed sort on dense scenes; counts + margin keep coverage (the
        # overflow_tiles counter below guards regressions)
        counts = [int(c) for c in np.asarray(m.tier_need_counts)]
        if counts:
            # fracs are applied against the row count binning actually
            # sees — the visible-cap prefix when compaction is on, not N
            n_rows = vis_cap if vis_cap else n
            tier_fracs = tuple(min(1.0, 1.15 * c / n_rows) for c in counts)
    base_overflow_tiles = int(m.overflow_tiles)
    for _ in range(2):  # compile + warm the calibrated program
        params, adam, aux, m = step_fn(params, adam, aux, cam, gt, bg,
                                       jnp.int32(20_000), jnp.bool_(True),
                                       width=width, height=height,
                                       sh_degree=3, instance_cap=inst_cap,
                                       visible_cap=vis_cap,
                                       tier_fracs=tier_fracs)
    # tolerance: overflow_tiles drifts a few counts step-to-step (the warm
    # steps' Adam updates move splats across tier thresholds) — only treat a
    # MATERIAL increase as calibration-induced clipping
    ovf_tol = base_overflow_tiles + max(256, base_overflow_tiles // 10)
    if (inst_cap or tier_fracs) and (
            int(m.overflow_capacity) > 0 or int(m.overflow_visible) > 0
            or int(m.overflow_tiles) > ovf_tol):
        inst_cap = 0
        vis_cap = 0
        tier_fracs = ()
        for _ in range(2):
            params, adam, aux, m = step_fn(params, adam, aux, cam, gt, bg,
                                           jnp.int32(20_000), jnp.bool_(True),
                                           width=width, height=height,
                                           sh_degree=3, instance_cap=0,
                                           visible_cap=0, tier_fracs=())
    float(m.loss)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, adam, aux, m = step_fn(params, adam, aux, cam, gt, bg,
                                       jnp.int32(20_000), jnp.bool_(True),
                                       width=width, height=height,
                                       sh_degree=3, instance_cap=inst_cap,
                                       visible_cap=vis_cap,
                                       tier_fracs=tier_fracs)
    float(m.loss)           # terminal value fetch anchors the whole chain
    dt = (time.perf_counter() - t0) / iters

    it_s = 1.0 / dt
    print(json.dumps({
        "metric": f"{wargs.workload}_r4_train_it_s",
        "value": round(it_s, 2),
        "unit": (f"full train steps/s ({width}x{height}, "
                 f"{n // 1000}K gaussians, 1 chip)"),
        "vs_baseline": round(it_s / wl["base"], 4),
        "extra": {
            "ms_per_step": round(dt * 1000, 2),
            "backend": backend,
            "device": str(jax.devices()[0]),
            "baseline": wl["base_note"],
            "visible_frac": wargs.visible_frac,
            "visible_cap": vis_cap,
            "mask_visible": int(m.mask_visible),
            "overflow_visible": int(m.overflow_visible),
        },
    }))


if __name__ == "__main__":
    main()
