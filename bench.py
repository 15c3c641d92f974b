"""Benchmark: 1080p differentiable-render forward+backward on one TPU chip.

Measures the full hot path of a training iteration — preprocess, tile
binning, Pallas composite, backward to all Gaussian parameters — at
1920×1088 with a realistically-sized synthetic scene (post-densification
scale distribution), and prints ONE JSON line.

Metric: fwd+bwd steps/sec at 1080p ("training-render fps equivalent").
Baseline: the reference's headline ≥30 fps at 1080p (README.md:14) — which
is forward-only rendering on a consumer GPU; we compare our HARDER fwd+bwd
number against it, so vs_baseline = fps / 30.
"""

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_scene(n: int, width: int, height: int, seed: int = 0):
    import jax.numpy as jnp
    from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
    from mvs_gaussian_splatting_tpu.utils import graphics

    rng = np.random.RandomState(seed)
    fovx = math.radians(65.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, width), height)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.eye(4), jnp.asarray(P), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    # depth-stratified cloud filling the frustum; log-normal world scales
    # roughly matching a densified scene (most splats a few pixels).
    z = rng.uniform(2.0, 12.0, n)
    x = rng.uniform(-0.95, 0.95, n) * z * math.tan(fovx / 2)
    y = rng.uniform(-0.95, 0.95, n) * z * math.tan(fovy / 2)
    means = np.stack([x, y, z], -1).astype(np.float32)
    focal = width / (2 * math.tan(fovx / 2))
    px_target = rng.lognormal(mean=np.log(2.5), sigma=0.6, size=n)  # pixels
    world_scale = px_target * z / focal
    scales = (world_scale[:, None] *
              rng.uniform(0.6, 1.4, (n, 3))).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    shs = (rng.randn(n, 16, 3) * 0.2).astype(np.float32)
    return cam, (jnp.asarray(means), jnp.asarray(np.log(scales)),
                 jnp.asarray(quats),
                 jnp.asarray(np.log(opac / (1 - opac)).astype(np.float32)),
                 jnp.asarray(shs))


def main():
    import jax
    # persistent compile cache: the first bench compile is minutes over the
    # remote-compile tunnel; later runs (and the driver's) hit this cache.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig, rasterize
    from mvs_gaussian_splatting_tpu.utils.transforms import normalize

    width, height = 1920, 1088
    n = 200_000
    # fast_math is the production TRAIN default since round 3 (PSNR-validated
    # at reference scale, runs/fastval); bench the step users actually run.
    # --exact restores the exact-compositing measurement (104.3 ms baseline).
    fast = "--exact" not in sys.argv
    # --forward: render-only (no backward) — the apples-to-apples measurement
    # against the reference's headline "≥30 fps at 1080p" which is
    # forward-only rendering (README.md:14). VERDICT r3 item #5.
    forward = "--forward" in sys.argv
    backend = "stream" if jax.default_backend() == "tpu" else "jnp"
    tile_w, tile_h = (32, 16) if backend == "stream" else (16, 16)
    cfg = RasterConfig(tile_w=tile_w, tile_h=tile_h, tile_capacity=1024,
                       max_tiles_per_gaussian=32, tile_batch=256,
                       backend=backend, fast_math=fast)
    cam, (means, log_scales, quats, opac_logit, shs) = build_scene(n, width, height)
    bg = jnp.zeros(3)

    def loss_fn(means, log_scales, quats, opac_logit, shs):
        p = preprocess(means, jax.nn.sigmoid(opac_logit), cam, width, height,
                       scales=jnp.exp(log_scales), rotations=normalize(quats),
                       shs=shs, sh_degree=3,
                       tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        img, aux = rasterize(p, width, height, bg, cfg)
        return img.mean(), aux

    def fwd_fn(means, log_scales, quats, opac_logit, shs):
        p = preprocess(means, jax.nn.sigmoid(opac_logit), cam, width, height,
                       scales=jnp.exp(log_scales), rotations=normalize(quats),
                       shs=shs, sh_degree=3,
                       tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        img, aux = rasterize(p, width, height, bg, cfg)
        # grads ↔ img: keep the timed fetch structurally identical so the
        # honesty analysis below (unchained burst + salts) carries over;
        # the image (~25 MB) is the same order as the grad pytree.
        return img, aux

    def make_step():
        if forward:
            return jax.jit(fwd_fn)
        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                has_aux=True))

    step = make_step()

    # warmup / compile — plus two salted executions: the first run of a fresh
    # executable with new input buffers pays a one-time ~400ms dispatch cost
    # (tunnel-side setup), which is not per-step work. Warmup salts are
    # negative so no timed iteration can ever hit a memoized (program, input)
    # pair from warmup.
    grads, aux = step(means, log_scales, quats, opac_logit, shs)
    jax.block_until_ready(grads)
    overflow = int(aux["overflow_capacity"])

    if backend == "stream":
        # Calibrate the static instance capacity to the measured tile load
        # (+12% headroom) instead of the a-priori 5.7·N heuristic — every
        # per-instance stage (tile sort, row pack, backward scatter-add)
        # scales with this STATIC capacity. The training loop does the same
        # via its overflow-driven bucket logic; here one calibration compile
        # suffices. Honesty guard: re-read the overflow counter and fall
        # back to the auto cap if the tight cap would drop entries.
        load = int(aux["tile_counts"].sum())
        cap = load + int(0.12 * load)
        cap += (-cap) % 128
        cfg = cfg._replace(instance_cap=cap)
        step = make_step()
        grads, aux = step(means, log_scales, quats, opac_logit, shs)
        jax.block_until_ready(grads)
        overflow = int(aux["overflow_capacity"])
        if overflow:
            cfg = cfg._replace(instance_cap=None)
            step = make_step()
            grads, aux = step(means, log_scales, quats, opac_logit, shs)
            jax.block_until_ready(grads)
            overflow = int(aux["overflow_capacity"])
    warm_salt = -(time.time_ns() % 997) * 1e-9
    for i in range(2):
        grads, aux = step(means + (warm_salt - 1e-6 * (i + 1)), log_scales,
                          quats, opac_logit, shs)
    jax.block_until_ready(grads)

    # Vary one input per iteration AND per run: the serving tunnel memoizes
    # executions with previously-seen (program, input-value) pairs, which
    # would fake arbitrarily fast steps. A time-derived base offset makes
    # every run's inputs unique; 1e-9-scale offsets don't change the
    # workload shape. Deliberately UNCHAINED: chaining each input on the
    # previous grads (tried) serializes dispatch and inflates the number
    # with per-step host latency (191 vs 110 ms measured). Honesty of the
    # unchained burst was verified for THIS program by scaling iters
    # (3/10/30 → converging per-step times) and against synchronous
    # dispatch (134 ms incl. round-trip); the tunnel's output-elision
    # hazard only bit programs with much larger outputs (train_bench.py).
    iters = 10
    run_salt = (time.time_ns() % 997) * 1e-9
    t0 = time.perf_counter()
    for i in range(iters):
        grads, aux = step(means + (run_salt + 1e-6 * (i + 1)),
                          log_scales, quats, opac_logit, shs)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    mpix_s = (width * height) * fps / 1e6
    what = "forward-only" if forward else "fwd+bwd"

    # Roofline/MFU figure (VERDICT r4 next #7): whole-step achieved HBM
    # bandwidth and FLOP rate from the compiled program's own cost analysis,
    # expressed against the v5e peaks (197 TFLOP/s bf16 MXU, 819 GB/s HBM).
    # This workload is NOT matmul-shaped — the kernels sit at the VPU issue
    # floor (PROFILE_FLOOR.md round-5 census: ~85-90% of the one-(8,128)-
    # vop/cycle issue rate) and the XLA stages at the gather/scatter/sort
    # rates — so the meaningful speed-of-light fraction is bytes-based:
    # sol_fraction_hbm = achieved GB/s / 819. flops as reported by XLA
    # undercount Pallas custom calls, noted in the field name.
    util = {}
    try:
        comp = step.lower(means, log_scales, quats, opac_logit,
                          shs).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ba = float(ca.get("bytes accessed", 0.0))
        fl = float(ca.get("flops", 0.0))
        util = {
            "hbm_gbytes_per_step": round(ba / 1e9, 3),
            "achieved_hbm_gbps": round(ba / 1e9 / dt, 1),
            "sol_fraction_hbm": round(ba / 1e9 / dt / 819.0, 4),
            "xla_gflops_per_step_excl_pallas": round(fl / 1e9, 2),
            "kernel_vpu_issue_util": ("~0.85-0.90 (op census vs one-"
                                      "(8,128)-vop/cycle, PROFILE_FLOOR "
                                      "round-5)"),
        }
    except Exception as e:
        util = {"unavailable": str(e)}

    result = {
        "metric": "1080p_forward_fps" if forward else "1080p_fwdbwd_fps",
        "value": round(fps, 3),
        "unit": f"steps/s (1920x1088 {what}, 200K gaussians, 1 chip)",
        "vs_baseline": round(fps / 30.0, 4),
        "extra": {
            "mpix_per_s": round(mpix_s, 1),
            "backend": backend + ("+fast" if fast else ""),
            "device": str(jax.devices()[0]),
            "tile_capacity_overflow_entries": overflow,
            "ms_per_step": round(dt * 1000, 2),
            "utilization": util,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
