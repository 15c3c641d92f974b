"""North-star config #5 as ONE pipeline (VERDICT r4 next #4).

Connects "tiles+primitives sharded training" to "quantize.py compression"
end-to-end: train a synthetic scene with the GAUSS-SHARDED train step on an
N-device mesh (virtual CPU mesh here; the same shardings drive real chips),
save the model through the standard PLY path, compress it with the
cli/compress codebook quantizer, offline-render BOTH models with the exact
eval operator, and record the fidelity delta + size ratio.

    python scripts/sharded_compress_pipeline.py --out runs/shardcompress

BASELINE.json config #5; cli/compress (SURVEY §2.20); gauss sharding
parallel/gauss_train.py (round 4). Every stage has unit tests; this script
(and tests/test_shard_compress_pipeline.py) exercises them as one chain.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_cpu_mesh(n_dev: int):
    import os as _os
    flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        _os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_dev}")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return jax


def run(out_dir: str, n_dev: int = 8, width: int = 128, height: int = 128,
        capacity: int = 4096, iters: int = 300, num_codes: int = 256,
        log=print):
    jax = _ensure_cpu_mesh(n_dev)
    import jax.numpy as jnp

    from mvs_gaussian_splatting_tpu.cli.compress import compress, decompress
    from mvs_gaussian_splatting_tpu.cli.render import params_from_ply
    from mvs_gaussian_splatting_tpu.models.gaussians import (compact,
                                                             init_from_pcd)
    from mvs_gaussian_splatting_tpu.models.ply import save_gaussian_ply
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
    from mvs_gaussian_splatting_tpu.ops.render import render
    from mvs_gaussian_splatting_tpu.parallel.gauss_train import (
        make_gauss_train_step)
    from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
    from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
    from mvs_gaussian_splatting_tpu.train.optim import adam_init
    from mvs_gaussian_splatting_tpu.utils.losses import psnr, ssim

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    rng = np.random.RandomState(0)

    def make_camera(angle: float):
        return graft._camera(width, height, angle)

    # ground-truth scene: a blobby soup rendered by our own exact renderer
    n_true = capacity // 2
    true_xyz = rng.uniform(-1.0, 1.0, (n_true, 3)).astype(np.float32)
    true_rgb = rng.rand(n_true, 3).astype(np.float32)
    true_params, true_aux = init_from_pcd(true_xyz, true_rgb, n_true)
    eval_cfg = RasterConfig(backend="jnp", tile_capacity=512,
                            max_tiles_per_gaussian=64)
    bg = jnp.zeros(3)

    def render_params(params, alive, cam):
        out = render(cam, width, height, params, bg, sh_degree=0,
                     alive=alive, raster_config=eval_cfg)
        return jnp.clip(out["render"], 0.0, 1.0)

    rp = jax.jit(render_params)
    train_cams = [make_camera(2 * math.pi * i / 10) for i in range(10)]
    test_cams = [make_camera(2 * math.pi * (i + 0.5) / 4) for i in range(4)]
    gts_train = [rp(true_params, true_aux.alive, c) for c in train_cams]
    gts_test = [rp(true_params, true_aux.alive, c) for c in test_cams]

    # noisy init, gauss-sharded training on the mesh
    init_xyz = (true_xyz[: n_true // 2]
                + rng.normal(0, 0.05, (n_true // 2, 3))).astype(np.float32)
    init_rgb = np.clip(true_rgb[: n_true // 2]
                       + rng.normal(0, 0.1, (n_true // 2, 3)), 0, 1)
    params, aux = init_from_pcd(init_xyz.astype(np.float32),
                                init_rgb.astype(np.float32), capacity)
    adam = adam_init(params)
    mesh = make_mesh(n_dev, axes=("gauss",))
    train_cfg = RasterConfig(backend="stream", tile_capacity=256,
                             max_tiles_per_gaussian=16, instance_cap=1 << 15)
    step, place = make_gauss_train_step(OptimizationConfig(), train_cfg, 1.0,
                                        mesh)

    placed = [place(params, adam, aux, c, g, bg)
              for c, g in zip(train_cams, gts_train)]
    p, a, x = placed[0][:3]
    b_bg = placed[0][5]
    cam_gt_placed = [(t[3], t[4]) for t in placed]

    def psnr_of(params_h, alive_h, cams, gts):
        vals = [float(psnr(rp(params_h, alive_h, c), g)[0])
                for c, g in zip(cams, gts)]
        return float(np.mean(vals))

    t0 = time.perf_counter()
    psnr_init = psnr_of(jax.device_get(p),
                        jnp.asarray(jax.device_get(x.alive)), test_cams,
                        gts_test)
    for i in range(iters):
        b_cam, b_gt = cam_gt_placed[i % len(cam_gt_placed)]
        p, a, x, m = step(p, a, x, b_cam, b_gt, b_bg, jnp.int32(i + 1),
                          jnp.bool_(False), width=width, height=height,
                          sh_degree=0)
    jax.block_until_ready(m)
    wall = time.perf_counter() - t0

    host_params = jax.device_get(p)
    host_alive = jnp.asarray(jax.device_get(x.alive))
    psnr_trained = psnr_of(host_params, host_alive, test_cams, gts_test)

    # ---- save through the standard PLY path ----------------------------
    os.makedirs(out_dir, exist_ok=True)
    it_dir = os.path.join(out_dir, "point_cloud", f"iteration_{iters}")
    os.makedirs(it_dir, exist_ok=True)
    from mvs_gaussian_splatting_tpu.models.gaussians import GaussianAux
    aux_host = GaussianAux(alive=host_alive,
                           max_radii2d=jnp.zeros_like(host_params.xyz[:, 0]),
                           xyz_grad_accum=jnp.zeros_like(
                               host_params.xyz[:, 0]),
                           denom=jnp.zeros_like(host_params.xyz[:, 0]))
    compacted = compact(host_params, aux_host)
    save_gaussian_ply(os.path.join(it_dir, "point_cloud.ply"),
                      {k: np.asarray(v) for k, v in compacted.items()})

    # ---- compress + decompress through the CLI functions ----------------
    npz = compress(out_dir, iters, num_codes,
                   ("f_rest", "scaling", "rotation"), sh_degree=3)
    deq_ply = decompress(npz)

    raw_size = os.path.getsize(os.path.join(it_dir, "point_cloud.ply"))
    npz_size = os.path.getsize(npz)

    # ---- offline-render both with the exact eval operator ---------------
    trained = params_from_ply(os.path.join(it_dir, "point_cloud.ply"), 3)
    dequant = params_from_ply(deq_ply, 3)
    alive_all = jnp.ones((trained.xyz.shape[0],), bool)

    def metrics_of(pp):
        ps, ss = [], []
        for c, g in zip(test_cams, gts_test):
            img = rp(pp, alive_all, c)
            ps.append(float(psnr(img, g)[0]))
            ss.append(float(ssim(img, g)))
        return float(np.mean(ps)), float(np.mean(ss))

    psnr_raw, ssim_raw = metrics_of(trained)
    psnr_cmp, ssim_cmp = metrics_of(dequant)

    result = {
        "pipeline": "gauss-sharded train -> PLY -> cli/compress -> "
                    "offline render (exact)",
        "mesh": f"{n_dev}-device virtual CPU mesh, axis 'gauss'",
        "scene": f"{width}x{height}, {n_true} GT / {capacity} capacity, "
                 f"{iters} iters",
        "train_wall_s": round(wall, 1),
        "psnr_init": round(psnr_init, 2),
        "psnr_trained_loop_eval": round(psnr_trained, 2),
        "psnr_offline_raw_ply": round(psnr_raw, 2),
        "psnr_offline_compressed": round(psnr_cmp, 2),
        "ssim_offline_raw_ply": round(ssim_raw, 4),
        "ssim_offline_compressed": round(ssim_cmp, 4),
        "compression_delta_db": round(psnr_raw - psnr_cmp, 3),
        "num_codes": num_codes,
        "raw_ply_bytes": raw_size,
        "compressed_npz_bytes": npz_size,
        "size_ratio": round(raw_size / max(npz_size, 1), 2),
    }
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(result, f, indent=2)
    log(json.dumps(result, indent=2))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/shardcompress")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--num_codes", type=int, default=256)
    args = ap.parse_args()
    run(args.out, n_dev=args.devices, iters=args.iters,
        capacity=args.capacity, num_codes=args.num_codes)


if __name__ == "__main__":
    main()
