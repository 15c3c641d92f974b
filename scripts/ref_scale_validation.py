"""Reference-scale synthetic validation run (VERDICT round-1 item #2).

The strongest available proxy for real-scene parity in a zero-egress
container: a bicycle-r4-scale workload — 1237x822 images, ~54K COLMAP-style
init points (bicycle: 54,275), 30K iterations with densification to a few
hundred thousand alive Gaussians through multiple opacity resets — run on
real TPU hardware through the SAME on-disk dataset path a real scene uses
(COLMAP binary files + PNGs → Scene → train()).

Ground truth is a structured synthetic scene (textured ground + colored
blob clusters) rendered by this framework's own rasterizer from a dense
Gaussian set; the sparse init subsamples it with noise, like a COLMAP
reconstruction. Reference PSNR milestones for the trajectory shape:
slurm-37442026.out (bicycle r4: 23.54@7K, 25.10@15K, 25.75@40K).

Writes: <out>/dataset (COLMAP layout), <out>/model (checkpoints, PLY),
<out>/history.json, <out>/train.log. Run:
    python scripts/ref_scale_validation.py --out /root/runs/refscale
    python scripts/ref_scale_validation.py --smoke   # tiny CPU sanity run
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


def build_gt_scene(n_target: int = 150_000, seed: int = 0,
                   style: str = "speckle"):
    """Structured GT Gaussian soup: textured ground plane + blob clusters +
    scattered dust. Returns dict of numpy arrays.

    ``style``: "speckle" (round-2 scene — per-point color noise + random
    colored dust bound achievable PSNR in the low 24s), "clean" (smooth
    surfaces, no random dust — measures the trainer's headroom rather than
    the scene's noise floor), or "specular" (round 4, VERDICT #6: clean
    geometry + VIEW-DEPENDENT materials via per-point SH to degree 3 + thin
    wire structures — exercises the SH-degree warmup, f_rest densification
    dynamics, and thin-structure splitting that view-independent scenes
    never touch). "specular" adds an ``shs`` [N, 16, 3] key to the dict."""
    clean = style in ("clean", "specular")
    specular = style == "specular"
    rng = np.random.RandomState(seed)
    parts = []

    def add(xyz, scale, color, opac):
        parts.append((xyz.astype(np.float32), scale.astype(np.float32),
                      color.astype(np.float32), opac.astype(np.float32)))

    # ground plane y = +1.5 (camera looks slightly down), procedural texture
    ng = int(n_target * 0.40)
    gx = rng.uniform(-8, 8, ng)
    gz = rng.uniform(-8, 8, ng)
    gy = 1.5 + 0.06 * np.sin(1.7 * gx) * np.cos(2.3 * gz) + rng.normal(0, 0.01, ng)
    checker = ((np.floor(gx * 1.5) + np.floor(gz * 1.5)) % 2)
    tex = 0.5 + 0.5 * np.sin(3.1 * gx) * np.sin(2.7 * gz)
    col = np.stack([0.25 + 0.5 * checker,
                    0.35 + 0.4 * tex,
                    0.30 + 0.35 * (1 - checker) * tex], -1)
    if not clean:
        col += rng.normal(0, 0.05, col.shape)
    add(np.stack([gx, gy, gz], -1),
        rng.uniform(0.03, 0.09, (ng, 3)), np.clip(col, 0, 1),
        rng.uniform(0.7, 0.98, ng))

    # blob clusters (objects)
    n_clusters = 24
    nb = int(n_target * 0.35) // n_clusters
    for c in range(n_clusters):
        center = np.array([rng.uniform(-5, 5), rng.uniform(-0.8, 1.2),
                           rng.uniform(-5, 5)])
        radius = rng.uniform(0.3, 1.0)
        base = rng.rand(3)
        pts = center + rng.normal(0, radius / 2.2, (nb, 3))
        freq = 1.5 if clean else 7.0
        amp = 0.2 if clean else 0.35
        col = np.clip(base + amp * np.sin(freq * pts[:, :3]), 0, 1)
        add(pts, rng.uniform(0.02, 0.07, (nb, 3)) * (radius + 0.4), col,
            rng.uniform(0.6, 0.97, nb))

    # enclosing background shell: real 360° captures have full-frame content
    # behind the scene; without it, huge transparent floaters can bloat over
    # empty-black regions nearly free of photometric penalty (observed as
    # post-densification PSNR decay in the first validation run)
    ns = int(n_target * 0.18)
    u = rng.normal(0, 1, (ns, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r_shell = rng.uniform(15.0, 17.0, ns)
    sp = u * r_shell[:, None]
    scol = np.stack([0.35 + 0.3 * np.sin(2.1 * sp[:, 0]) * np.cos(1.3 * sp[:, 1]),
                     0.40 + 0.25 * np.sin(1.7 * sp[:, 1] + 1.0),
                     0.45 + 0.3 * np.cos(1.9 * sp[:, 2])], -1)
    add(sp, rng.uniform(0.25, 0.6, (ns, 3)), np.clip(scol, 0, 1),
        rng.uniform(0.8, 0.99, ns))

    # thin wire structures (specular style): bright rods of closely-spaced
    # tiny splats — the content class that drives the reference's
    # densification behavior on real scenes (bicycle spokes, branches) and
    # that blob/plane scenes never exercise
    if specular:
        n_rods = 40
        per_rod = max(8, int(n_target * 0.05) // n_rods)
        for r in range(n_rods):
            a = np.array([rng.uniform(-6, 6), rng.uniform(-1.2, 1.3),
                          rng.uniform(-6, 6)])
            d = rng.normal(0, 1, 3)
            d /= np.linalg.norm(d)
            length = rng.uniform(1.0, 3.0)
            t = np.linspace(0, length, per_rod)[:, None]
            pts = a + t * d + rng.normal(0, 0.008, (per_rod, 3))
            base = np.clip(rng.rand(3) * 0.7 + 0.3, 0, 1)
            col = np.broadcast_to(base, (per_rod, 3)).copy()
            col += 0.1 * np.sin(4.0 * t)      # slow variation along the rod
            add(pts, np.full((per_rod, 3), 0.012, np.float32),
                np.clip(col, 0, 1), rng.uniform(0.85, 0.99, per_rod))

    # dust: same tiny geometry in both styles (bigger/denser motes turn the
    # scene into participating-medium fog — measured 13.3 dB@1K on the first
    # clean attempt); clean style only smooths the COLORS
    nd = max(256, n_target - sum(p[0].shape[0] for p in parts))
    dx_ = rng.uniform(-7, 7, nd)
    dz_ = rng.uniform(-7, 7, nd)
    dy_ = rng.uniform(-1.5, 1.4, nd)
    if clean:
        dcol = np.clip(np.stack([0.4 + 0.25 * np.sin(0.9 * dx_),
                                 0.45 + 0.25 * np.sin(0.7 * dy_ + 2.0),
                                 0.5 + 0.25 * np.cos(0.8 * dz_)], -1), 0, 1)
    else:
        dcol = rng.rand(nd, 3)
    add(np.stack([dx_, dy_, dz_], -1),
        rng.uniform(0.01, 0.05, (nd, 3)), dcol,
        rng.uniform(0.3, 0.9, nd))

    xyz = np.concatenate([p[0] for p in parts])
    scale = np.concatenate([p[1] for p in parts])
    color = np.concatenate([p[2] for p in parts])
    opac = np.concatenate([p[3] for p in parts])
    quats = rng.randn(xyz.shape[0], 4).astype(np.float32)
    out = dict(xyz=xyz, scale=scale, color=color, opac=opac, quats=quats)

    if specular:
        # View-dependent materials: full degree-3 SH per point. The l=1 band
        # is a smooth directional-gain field (a "glossy highlight" toward a
        # spatially varying direction v(x) with strength k(x)); l=2/l=3 add
        # small higher-order lobes so degree-3 warmup has real signal to
        # recover. Coefficient c·Y gives color excursion ≈ c·0.49 for l=1,
        # so k≈0.2 keeps colors in range under the renderer's 0-clamp.
        n = xyz.shape[0]
        C0, C1 = 0.28209479177387814, 0.4886025119029199
        px, py, pz = xyz.T
        shs = np.zeros((n, 16, 3), np.float32)
        shs[:, 0] = (color - 0.5) / C0
        k = (0.16 + 0.10 * np.sin(0.7 * px) * np.cos(0.6 * pz)).astype(np.float32)
        v = np.stack([np.sin(0.5 * px + 1.3),
                      0.4 * np.cos(0.4 * py),
                      np.cos(0.5 * pz)], -1)
        v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-6
        # radiance ≈ DC + k·dot(dir, v): c_{1,-1}=-k·vy/C1, c_{1,0}=k·vz/C1,
        # c_{1,1}=-k·vx/C1 (PlenOctree basis sign convention, utils/sh.py)
        for c, gain in enumerate((1.0, 0.75, 1.15)):
            shs[:, 1, c] = -(k * gain) * v[:, 1] / C1
            shs[:, 2, c] = (k * gain) * v[:, 2] / C1
            shs[:, 3, c] = -(k * gain) * v[:, 0] / C1
        ph = np.stack([px, py, pz, px + pz, py - pz], -1)   # [N, 5]
        for c, phase in enumerate((0.0, 2.1, 4.2)):
            shs[:, 4:9, c] = (0.04 * np.sin(1.3 * ph + phase)).astype(np.float32)
        shs[:, 9:16, 0] = 0.015 * np.sin(0.9 * px)[:, None]
        shs[:, 9:16, 1] = 0.015 * np.cos(0.8 * py)[:, None]
        shs[:, 9:16, 2] = 0.015 * np.sin(0.7 * pz + 0.5)[:, None]
        out["shs"] = shs
    return out


def orbit_cameras(n_views: int, width: int, height: int, fovx_deg: float,
                  seed: int = 1):
    from mvs_gaussian_splatting_tpu.utils import graphics
    rng = np.random.RandomState(seed)
    fovx = math.radians(fovx_deg)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, width), height)
    cams = []
    for i in range(n_views):
        a = 2 * math.pi * i / n_views + rng.normal(0, 0.02)
        r = 9.0 + 2.0 * math.sin(2.3 * a) + rng.normal(0, 0.2)
        eye = np.array([r * math.sin(a),
                        -1.2 - 0.8 * math.cos(1.7 * a),
                        -r * math.cos(a)])
        target = np.array([rng.normal(0, 0.3), 0.5, rng.normal(0, 0.3)])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        Rw2c = np.stack([right, np.cross(fwd, right), fwd])
        cams.append((Rw2c, -Rw2c @ eye, fovx, fovy))
    return cams


def write_dataset(out_dir: str, width: int, height: int, n_views: int,
                  n_gt: int, n_init: int, seed: int, log,
                  style: str = "speckle"):
    """Render GT views and write a COLMAP-layout dataset."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mvs_gaussian_splatting_tpu.data.colmap import (
        CameraIntrinsics, ImageExtrinsics, write_cameras_binary,
        write_images_binary, write_points3d_binary)
    from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView, preprocess
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig, rasterize
    from mvs_gaussian_splatting_tpu.utils import graphics
    from mvs_gaussian_splatting_tpu.utils.transforms import normalize

    gt = build_gt_scene(n_gt, seed, style=style)
    cams = orbit_cameras(n_views, width, height, 65.0, seed + 1)
    backend = "stream" if jax.default_backend() == "tpu" else "jnp"
    cfg = RasterConfig(tile_w=32 if backend == "stream" else 16, tile_h=16,
                       tile_capacity=1024, max_tiles_per_gaussian=32,
                       tile_batch=64, backend=backend)

    means = jnp.asarray(gt["xyz"])
    scales = jnp.asarray(gt["scale"])
    quats = normalize(jnp.asarray(gt["quats"]))
    opac = jnp.asarray(gt["opac"])
    colors = jnp.asarray(gt["color"])
    shs = jnp.asarray(gt["shs"]) if "shs" in gt else None

    @jax.jit
    def render_one(viewmat, projmat, campos, tanx, tany):
        cam = CameraView(viewmat, projmat, campos, tanx, tany)
        if shs is not None:
            # view-dependent GT: full degree-3 SH evaluation per view
            p = preprocess(means, opac, cam, width, height, scales=scales,
                           rotations=quats, shs=shs, sh_degree=3,
                           tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        else:
            p = preprocess(means, opac, cam, width, height, scales=scales,
                           rotations=quats, colors_precomp=colors,
                           tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        img, _ = rasterize(p, width, height, jnp.zeros(3), cfg)
        return jnp.clip(img, 0.0, 1.0)

    img_dir = os.path.join(out_dir, "images")
    sparse = os.path.join(out_dir, "sparse", "0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sparse, exist_ok=True)

    fx = graphics.fov2focal(cams[0][2], width)
    fy = graphics.fov2focal(cams[0][3], height)
    write_cameras_binary(
        {1: CameraIntrinsics(id=1, model="PINHOLE", width=width,
                             height=height,
                             params=np.array([fx, fy, width / 2, height / 2]))},
        os.path.join(sparse, "cameras.bin"))

    from mvs_gaussian_splatting_tpu.data.colmap import rotmat2qvec
    images = {}
    t0 = time.time()
    P = graphics.projection_matrix(0.01, 100.0, cams[0][2], cams[0][3])
    for i, (R, t, fovx, fovy) in enumerate(cams):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        img = np.asarray(render_one(
            jnp.asarray(w2c), jnp.asarray((P @ w2c).astype(np.float32)),
            jnp.asarray(np.linalg.inv(w2c)[:3, 3].astype(np.float32)),
            jnp.float32(math.tan(fovx / 2)), jnp.float32(math.tan(fovy / 2))))
        name = f"view_{i:04d}.png"
        Image.fromarray((img.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name))
        images[i + 1] = ImageExtrinsics(
            id=i + 1, qvec=rotmat2qvec(R), tvec=t.astype(np.float64),
            camera_id=1, name=name)
        if i % 20 == 0:
            log(f"rendered {i + 1}/{n_views} GT views "
                f"({time.time() - t0:.0f}s)")
    write_images_binary(images, os.path.join(sparse, "images.bin"))

    # sparse init: subsample GT with noise (a COLMAP-like point cloud)
    rng = np.random.RandomState(seed + 2)
    idx = rng.choice(gt["xyz"].shape[0], n_init, replace=False)
    pts = gt["xyz"][idx] + rng.normal(0, 0.02, (n_init, 3)).astype(np.float32)
    rgb = (np.clip(gt["color"][idx] + rng.normal(0, 0.03, (n_init, 3)), 0, 1)
           * 255).astype(np.uint8)
    write_points3d_binary(pts, rgb, os.path.join(sparse, "points3D.bin"))
    log(f"dataset written to {out_dir} ({n_views} views, {n_init} init pts)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/runs/refscale")
    ap.add_argument("--width", type=int, default=1237)
    ap.add_argument("--height", type=int, default=822)
    ap.add_argument("--views", type=int, default=120)
    ap.add_argument("--gt_points", type=int, default=150_000)
    ap.add_argument("--init_points", type=int, default=54_000)
    ap.add_argument("--iterations", type=int, default=30_000)
    ap.add_argument("--max_capacity", type=int, default=1_000_000)
    ap.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    ap.add_argument("--percent_dense", type=float, default=0.01)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU sanity configuration")
    ap.add_argument("--grow_dir", action="store_true",
                    help="learnable grow-direction mode (the fork's research "
                         "feature; compare dynamics to slurm-36894046.out)")
    ap.add_argument("--growdirs_lr", type=float, default=0.01)
    ap.add_argument("--resume", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resume from the newest chkpnt*.npz in <out>/model "
                         "(default ON: rounds are wall-clock bounded and an "
                         "interrupted run must continue, not restart — the "
                         "round-2 refscale2 relaunch retrained from scratch; "
                         "--no-resume forces a fresh start)")
    ap.add_argument("--divergence_psnr_drop", type=float, default=3.0,
                    help="abort+checkpoint when test PSNR sits this many dB "
                         "below its best for 3 consecutive evals (0=off)")
    ap.add_argument("--scene_style", choices=("speckle", "clean", "specular"),
                    default="speckle",
                    help="GT scene flavor: 'speckle' = the round-2 scene "
                         "(noise-floor-bounded ~24 dB), 'clean' = smooth "
                         "surfaces measuring trainer headroom, 'specular' = "
                         "clean geometry + degree-3 view-dependent SH "
                         "materials + thin wires (VERDICT r3 #6)")
    ap.add_argument("--fast", action="store_true",
                    help="train with fast_math compositing (evals stay "
                         "exact) — the PSNR-impact validation for the "
                         "RasterConfig.fast_math speed/accuracy trade")
    args = ap.parse_args()
    if args.smoke:
        args.width, args.height = 160, 120
        args.views, args.gt_points, args.init_points = 12, 3000, 500
        args.iterations = 300

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "pid.txt"), "w") as f:
        f.write(f"{os.path.basename(args.out)} pid {os.getpid()}\n")
    logf = open(os.path.join(args.out, "train.log"), "a", buffering=1)

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        logf.write(line + "\n")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    log(f"devices: {jax.devices()}")

    dataset = os.path.join(args.out, "dataset")
    if not os.path.exists(os.path.join(dataset, "sparse", "0", "points3D.bin")):
        write_dataset(dataset, args.width, args.height, args.views,
                      args.gt_points, args.init_points, seed=0, log=log,
                      style=args.scene_style)

    from mvs_gaussian_splatting_tpu.train.config import (ModelConfig,
                                                         OptimizationConfig,
                                                         PipelineConfig,
                                                         TrainRunConfig)
    from mvs_gaussian_splatting_tpu.train.loop import train

    model_cfg = ModelConfig(source_path=dataset,
                            model_path=os.path.join(args.out, "model"),
                            eval=True, resolution=1,
                            grow_dir=args.grow_dir,
                            num_dirs=128 if args.grow_dir else 128)
    opt_cfg = OptimizationConfig(iterations=args.iterations,
                                 densify_grad_threshold=args.densify_grad_threshold,
                                 percent_dense=args.percent_dense,
                                 max_capacity=args.max_capacity,
                                 growdirs_lr=args.growdirs_lr)
    # 32x16 tiles: the measured-fastest stream config at ~1080p on v5e
    # (PROFILE_FLOOR.md); the 16x16 default costs ~40% more tile instances.
    # Generous top tile-budget tier: with the old flat max of 32, an early-
    # training bloated splat covering ~2000 tiles rendered as a 32-tile patch
    # with a ~60x-diluted densification gradient — the split/prune machinery
    # stopped seeing exactly the splats that most needed it (the 1000-3000
    # loss climb + iter-3000 collapse in runs/refscale{,2}).
    pipe_cfg = PipelineConfig(tile_w=32, tile_h=16,
                              max_tiles_per_gaussian=512,
                              tier_budgets=(4, 12, 64),
                              tier_fracs=(0.25, 0.1, 0.01),
                              fast_math=args.fast)
    start_checkpoint = ""
    if args.resume:
        import glob
        import re
        # only digit-bearing names participate (ADVICE r2: a stray
        # 'chkpnt.npz' must not crash the resume path)
        cands = [(int(m.group(1)), p)
                 for p in glob.glob(os.path.join(args.out, "model",
                                                 "chkpnt*.npz"))
                 for m in [re.search(r"chkpnt(\d+)\.npz$",
                                     os.path.basename(p))] if m]
        if cands:
            it, best = max(cands)
            if it >= args.iterations:
                # ADVICE r2: resuming at/past the target would train zero
                # iterations and silently overwrite the final outputs
                log(f"resume: checkpoint {best} is at iteration {it} >= "
                    f"--iterations {args.iterations}; nothing to do, exiting")
                return
            start_checkpoint = best
            log(f"resuming from {start_checkpoint}")
        else:
            log("resume: no checkpoint found, starting fresh")

    # Dense late milestones (22-28K): the fork's grow-mode decay window is
    # ~30K (slurm-36894046.out); a wall-clock-bounded run records each one
    # in train.log even if killed before the final history.json write.
    mile = [1000, 3000, 5000, 7000, 10_000, 15_000, 20_000, 22_000,
            24_000, 25_000, 26_000, 28_000, 30_000, 35_000, args.iterations]
    run_cfg = TrainRunConfig(
        test_iterations=sorted({m for m in mile if m <= args.iterations}),
        save_iterations=[args.iterations],
        checkpoint_iterations=[m for m in (7000, 15_000, 22_000, 30_000,
                                           36_000)
                               if m < args.iterations],
        start_checkpoint=start_checkpoint,
        divergence_psnr_drop=args.divergence_psnr_drop)

    t0 = time.time()
    params, aux, scene, history = train(model_cfg, opt_cfg, pipe_cfg, run_cfg,
                                        log_fn=log)
    wall = time.time() - t0

    # Retain the final model as an EXACT gzipped PLY (committable; the raw
    # point_cloud/ tree is gitignored as heavy). Round-4 lesson: the
    # specscale eval-gap investigation had no model left to re-render.
    ply = os.path.join(args.out, "model", "point_cloud",
                       f"iteration_{args.iterations}", "point_cloud.ply")
    if os.path.exists(ply):
        import gzip
        import shutil
        gz = os.path.join(args.out, "model", "point_cloud_final.ply.gz")
        with open(ply, "rb") as fi, gzip.open(gz, "wb",
                                              compresslevel=6) as fo:
            shutil.copyfileobj(fi, fo)
        log(f"retained exact final model: {gz} "
            f"({os.path.getsize(gz) / 1e6:.1f} MB)")
    from mvs_gaussian_splatting_tpu.models.gaussians import num_alive
    summary = {
        "workload": f"{args.width}x{args.height}, {args.views} views, "
                    f"{args.init_points} init pts, {args.iterations} iters",
        "wall_seconds": round(wall, 1),
        "final_alive": int(num_alive(aux)),
        "psnr_test": history["psnr_test"],
        "n_alive": history["n_alive"],
        "iter_time": history["iter_time"][-20:],
        "loss_tail": history["loss"][-20:],
        "reference_milestones": {
            "bicycle_r4_slurm-37442026": {"7000": 23.54, "15000": 25.10,
                                          "40000": 25.75}},
    }
    with open(os.path.join(args.out, "history.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"DONE in {wall / 3600:.2f} h — final alive {summary['final_alive']}, "
        f"PSNR {history['psnr_test']}")


if __name__ == "__main__":
    main()
