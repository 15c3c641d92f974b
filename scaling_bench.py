"""Scaling harness: camera-batched train-step weak scaling over the mesh.

Prints a JSON dict of {device_count: {ms, cams_per_ms, efficiency}} for the
north-star ≥80%-at-2-hosts criterion. Runs on any platform — on a CPU dev box
use JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8; on
a pod slice call mvs_gaussian_splatting_tpu.parallel.multihost.initialize
first (one process per host).
"""

import json
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count (ignored with --tpu)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU backend instead of the "
                         "virtual CPU mesh")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        # Self-provision a virtual CPU mesh (the axon sitecustomize
        # pre-imports jax pointed at one remote TPU; env vars alone are too
        # late — same pattern as __graft_entry__.dryrun_multichip).
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{args.devices}")
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
    from mvs_gaussian_splatting_tpu.parallel.data_parallel import (
        make_batch_train_step, stack_cameras)
    from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
    from mvs_gaussian_splatting_tpu.parallel.multihost import measure_scaling
    from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
    from mvs_gaussian_splatting_tpu.train.optim import adam_init

    import importlib.util
    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    width = height = 128
    rng = np.random.RandomState(0)
    params, aux = init_from_pcd(
        rng.uniform(-0.8, 0.8, (2000, 3)).astype(np.float32),
        rng.rand(2000, 3).astype(np.float32), 4096)
    adam = adam_init(params)
    on_tpu = jax.default_backend() == "tpu"
    raster_cfg = RasterConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                              tile_batch=16,
                              backend="stream" if on_tpu else "jnp",
                              instance_cap=1 << 16)
    opt_cfg = OptimizationConfig()

    def factory(n_dev):
        mesh = make_mesh(n_dev)
        step, place = make_batch_train_step(opt_cfg, raster_cfg, 1.0, mesh)
        cams = stack_cameras([graft._camera(width, height, 2 * math.pi * i / n_dev)
                              for i in range(n_dev)])
        gts = jnp.zeros((n_dev, 3, height, width)) + 0.5
        # deep-copy the model state: device_put aliases buffers when the
        # sharding already matches, and the step donates its inputs
        params_c = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        adam_c = jax.tree.map(lambda x: jnp.array(x, copy=True), adam)
        aux_c = jax.tree.map(lambda x: jnp.array(x, copy=True), aux)
        p0, a0, x0, b_cams, b_gts, b_bg = place(params_c, adam_c, aux_c, cams,
                                                gts, jnp.zeros(3))
        # the step donates params/opt-state, so thread outputs back as inputs
        # (steady-state training behavior)
        holder = {"s": (p0, a0, x0)}

        def run():
            pp, aa, xx = holder["s"]
            with mesh:
                p2, a2, x2, m = step(pp, aa, xx, b_cams, b_gts, b_bg,
                                     jnp.int32(1), jnp.asarray(False),
                                     width=width, height=height, sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    results = measure_scaling(factory)

    # ---- tile-sharded stream leg: weak scaling in IMAGE area ------------
    # (the production multi-chip composite path; rows grow with the mesh)
    from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
    from mvs_gaussian_splatting_tpu.parallel.tile_stream import (
        make_tile_sharded_stream)
    from mvs_gaussian_splatting_tpu.parallel.gauss_stream import (
        make_gauss_sharded_stream)
    from mvs_gaussian_splatting_tpu.utils.transforms import normalize
    from bench import build_scene
    import time as _time

    interp = not on_tpu

    def tile_factory(n_dev):
        w, h = 256, 128 * n_dev           # pixels ∝ devices
        mesh = make_mesh(n_dev)
        cfg = raster_cfg._replace(instance_cap=0)
        cam, (means, ls, q, ol, shs) = build_scene(4000, w, h, seed=1)
        fn = make_tile_sharded_stream(mesh, "data", w, h, cfg,
                                      interpret=interp, round_robin=True)

        def loss(m):
            p = preprocess(m, jax.nn.sigmoid(ol), cam, w, h,
                           scales=jnp.exp(ls), rotations=normalize(q),
                           shs=shs, sh_degree=1,
                           tile_w=cfg.tile_w, tile_h=cfg.tile_h)
            img, _ = fn(p, jnp.zeros(3))
            return img.mean()

        with mesh:
            step = jax.jit(jax.grad(loss))
        holder = {"x": means}

        def run():
            with mesh:
                g = step(holder["x"])
            holder["x"] = holder["x"] + 1e-9 * g   # perturb, defeat memoize
            jax.block_until_ready(holder["x"])
        return run

    def gauss_factory(n_dev):
        w, h = 256, 256
        mesh = make_mesh(n_dev)
        cfg = raster_cfg._replace(instance_cap=0)
        n = 4096 * n_dev                  # gaussians ∝ devices
        cam, (means, ls, q, ol, shs) = build_scene(n, w, h, seed=2)
        fn = make_gauss_sharded_stream(mesh, "data", w, h, cfg,
                                       n_total=n, interpret=interp)

        def loss(m):
            p = preprocess(m, jax.nn.sigmoid(ol), cam, w, h,
                           scales=jnp.exp(ls), rotations=normalize(q),
                           shs=shs, sh_degree=1,
                           tile_w=cfg.tile_w, tile_h=cfg.tile_h)
            img, _ = fn(p, jnp.zeros(3))
            return img.mean()

        with mesh:
            step = jax.jit(jax.grad(loss))
        holder = {"x": means}

        def run():
            with mesh:
                g = step(holder["x"])
            holder["x"] = holder["x"] + 1e-9 * g
            jax.block_until_ready(holder["x"])
        return run

    # ---- tile-parallel TRAIN step: strong scaling at fixed image ---------
    # (round-3: the full train step — loss, psum'd backward, Adam, stats —
    # with one camera's tiles sharded; the path to the per-host 1080p
    # north star that camera-DP can't reach)
    from mvs_gaussian_splatting_tpu.parallel.tile_train import (
        make_tile_train_step)

    def tile_train_factory(n_dev):
        w, h = 256, 256                   # fixed frame: strong scaling
        mesh = make_mesh(n_dev, axes=("tile",))
        # the tile-sharded composite is the stream path (interpret off-TPU)
        step, place_t = make_tile_train_step(
            opt_cfg, raster_cfg._replace(backend="stream"), 1.0, mesh,
            interpret=interp)
        cam = graft._camera(w, h)
        gt = jnp.zeros((3, h, w)) + 0.5
        params_c = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        adam_c = jax.tree.map(lambda x: jnp.array(x, copy=True), adam)
        aux_c = jax.tree.map(lambda x: jnp.array(x, copy=True), aux)
        p0, a0, x0, b_cam, b_gt, b_bg = place_t(params_c, adam_c, aux_c, cam,
                                                gt, jnp.zeros(3))
        holder = {"s": (p0, a0, x0)}

        def run():
            pp, aa, xx = holder["s"]
            p2, a2, x2, m = step(pp, aa, xx, b_cam, b_gt, b_bg, jnp.int32(1),
                                 jnp.asarray(False), width=w, height=h,
                                 sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    tile_results = measure_scaling(tile_factory, iters=3)
    gauss_results = measure_scaling(gauss_factory, iters=3)
    tile_train_results = measure_scaling(tile_train_factory, iters=3)

    # ---- compile-only check at 1080p shapes over the full mesh ----------
    # regress-tests that the sharded 1080p programs keep compiling; no
    # execution (interpret-mode execution at 1080p is impractical on CPU)
    n_all = len(jax.devices())
    w1080, h1080 = 1920, 1088
    mesh = make_mesh(n_all)
    cfg1080 = RasterConfig(tile_w=32, tile_h=16, backend="stream",
                           max_tiles_per_gaussian=32)
    cam, (means, ls, q, ol, shs) = build_scene(50_000, w1080, h1080, seed=3)
    fn1080 = make_tile_sharded_stream(mesh, "data", w1080, h1080, cfg1080,
                                      interpret=interp, round_robin=True)

    def loss1080(m):
        p = preprocess(m, jax.nn.sigmoid(ol), cam, w1080, h1080,
                       scales=jnp.exp(ls), rotations=normalize(q),
                       shs=shs, sh_degree=3, tile_w=32, tile_h=16)
        img, _ = fn1080(p, jnp.zeros(3))
        return img.mean()

    t0 = _time.perf_counter()
    with mesh:
        compiled = jax.jit(jax.grad(loss1080)).lower(means).compile()
    compile_1080p = {"ok": compiled is not None,
                     "seconds": round(_time.perf_counter() - t0, 1),
                     "devices": n_all}

    print(json.dumps({
        "metric": "weak_scaling_all_modes",
        "camera_dp": results,
        "tile_sharded_stream": tile_results,
        "gauss_sharded_stream": gauss_results,
        "tile_parallel_train_step": tile_train_results,
        "compile_only_1080p_tile_sharded": compile_1080p,
        "note": ("efficiency is meaningful on real multi-chip hardware only; "
                 "virtual host-platform devices share one CPU and weak-scale "
                 "at ~1/n by construction"),
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
