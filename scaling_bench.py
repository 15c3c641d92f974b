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

    # ---- 2D grid TRAIN step (round 4): 2 cameras × tiles ---------------
    # data axis fixed at 2; the tile axis takes the rest (strong scaling in
    # tiles at fixed batch — the "chips per host" shape of BASELINE #3/#4)
    from jax.sharding import Mesh as _Mesh
    from mvs_gaussian_splatting_tpu.parallel.grid_train import (
        make_grid_train_step)

    def grid_train_factory(n_dev):
        w, h = 256, 256
        n_tile = max(1, n_dev // 2)
        devs = np.array(jax.devices()[:2 * n_tile]).reshape(2, n_tile)
        mesh = _Mesh(devs, ("data", "tile"))
        step, place_g = make_grid_train_step(
            opt_cfg, raster_cfg._replace(backend="stream"), 1.0, mesh,
            interpret=interp)
        cams = stack_cameras([graft._camera(w, h, 0.0),
                              graft._camera(w, h, 0.4)])
        gts = jnp.zeros((2, 3, h, w)) + 0.5
        params_c = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        adam_c = jax.tree.map(lambda x: jnp.array(x, copy=True), adam)
        aux_c = jax.tree.map(lambda x: jnp.array(x, copy=True), aux)
        p0, a0, x0, b_cams, b_gts, b_bg = place_g(params_c, adam_c, aux_c,
                                                  cams, gts, jnp.zeros(3))
        holder = {"s": (p0, a0, x0)}

        def run():
            pp, aa, xx = holder["s"]
            p2, a2, x2, m = step(pp, aa, xx, b_cams, b_gts, b_bg,
                                 jnp.int32(1), jnp.asarray(False),
                                 width=w, height=h, sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    # ---- gauss-sharded TRAIN step (round 4): weak scaling in N ----------
    from mvs_gaussian_splatting_tpu.parallel.gauss_train import (
        make_gauss_train_step)

    def gauss_train_factory(n_dev):
        w, h = 256, 256
        mesh = make_mesh(n_dev, axes=("gauss",))
        cap = 4096 * n_dev                # primitives ∝ devices
        params_g, aux_g = init_from_pcd(
            rng.uniform(-0.8, 0.8, (cap // 2, 3)).astype(np.float32),
            rng.rand(cap // 2, 3).astype(np.float32), cap)
        adam_g = adam_init(params_g)
        step, place_gs = make_gauss_train_step(
            opt_cfg, raster_cfg._replace(backend="stream",
                                         instance_cap=0), 1.0, mesh,
            interpret=interp)
        cam = graft._camera(w, h)
        gt = jnp.zeros((3, h, w)) + 0.5
        p0, a0, x0, b_cam, b_gt, b_bg = place_gs(params_g, adam_g, aux_g,
                                                 cam, gt, jnp.zeros(3))
        holder = {"s": (p0, a0, x0)}

        def run():
            pp, aa, xx = holder["s"]
            p2, a2, x2, m = step(pp, aa, xx, b_cam, b_gt, b_bg, jnp.int32(1),
                                 jnp.asarray(False), width=w, height=h,
                                 sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    # ---- tile-parallel FORWARD (render-only) strong scaling -------------
    # (round 4, VERDICT #5: the 30 fps projection should be measured
    # single-chip fast-forward fps × the measured FORWARD tile-scaling
    # efficiency, not the fwd+bwd train-step proxy)
    def tile_forward_factory(n_dev):
        w, h = 256, 256                   # fixed frame: strong scaling
        mesh = make_mesh(n_dev, axes=("tile",))
        cfg = raster_cfg._replace(backend="stream", instance_cap=0,
                                  fast_math=on_tpu)
        cam, (means, ls, q, ol, shs) = build_scene(8000, w, h, seed=4)
        fn = make_tile_sharded_stream(mesh, "tile", w, h, cfg,
                                      interpret=interp, round_robin=True)

        def fwd(m):
            p = preprocess(m, jax.nn.sigmoid(ol), cam, w, h,
                           scales=jnp.exp(ls), rotations=normalize(q),
                           shs=shs, sh_degree=1,
                           tile_w=cfg.tile_w, tile_h=cfg.tile_h)
            img, _ = fn(p, jnp.zeros(3))
            return img

        with mesh:
            step = jax.jit(fwd)
        holder = {"x": means}

        def run():
            with mesh:
                img = step(holder["x"])
            holder["x"] = holder["x"] + 1e-9 * img.mean()
            jax.block_until_ready(holder["x"])
        return run

    tile_results = measure_scaling(tile_factory, iters=3)
    gauss_results = measure_scaling(gauss_factory, iters=3)
    tile_train_results = measure_scaling(tile_train_factory, iters=3)
    tile_forward_results = measure_scaling(tile_forward_factory, iters=3)
    grid_counts = [c for c in (2, 4, 8) if c <= len(jax.devices())]
    grid_train_results = measure_scaling(grid_train_factory,
                                         device_counts=grid_counts, iters=3)
    gauss_train_results = measure_scaling(gauss_train_factory, iters=3)

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

    # ---- tile-ownership balance artifact (round 4, VERDICT #8) ----------
    # Sky-heavy scene: content confined to the bottom 45% of the frame, top
    # rows nearly empty — the load shape that motivates round-robin tile
    # ownership (SURVEY §7 "load imbalance"). Reports the per-device
    # instance-count spread for contiguous strips vs round-robin at D=4/8.
    from mvs_gaussian_splatting_tpu.ops.binning import (auto_instance_cap,
                                                        bin_instances_stream)

    def tile_balance_artifact():
        wb, hb = 512, 512
        camb, (mb, lsb, qb, olb, shsb) = build_scene(20_000, wb, hb, seed=7)
        # push all content into the bottom of the frame (y-down convention:
        # positive camera-space y renders low); the top half becomes sky
        mb = mb.at[:, 1].set(jnp.abs(mb[:, 1]) * 0.9 + 0.05 * mb[:, 2])
        cfgb = raster_cfg._replace(backend="stream", instance_cap=0)
        p = preprocess(mb, jax.nn.sigmoid(olb), camb, wb, hb,
                       scales=jnp.exp(lsb), rotations=normalize(qb),
                       shs=shsb, sh_degree=1,
                       tile_w=cfgb.tile_w, tile_h=cfgb.tile_h)
        tx, ty = -(-wb // cfgb.tile_w), -(-hb // cfgb.tile_h)
        cap = auto_instance_cap(mb.shape[0], cfgb.max_tiles_per_gaussian,
                                cfgb.tile_w, cfgb.tile_h, cfgb.tier_budgets,
                                cfgb.tier_fracs)
        bins = jax.jit(lambda pp: bin_instances_stream(
            pp, tx, ty, cfgb.max_tiles_per_gaussian, cap,
            tile_w=cfgb.tile_w, tile_h=cfgb.tile_h,
            tier_budgets=cfgb.tier_budgets,
            tier_fracs=cfgb.tier_fracs))(jax.lax.stop_gradient(p))
        counts = np.asarray(bins.counts_raw)
        t = counts.shape[0]
        out = {"scene": "sky-heavy (content in bottom 45%)",
               "tiles": int(t), "total_instances": int(counts.sum())}
        for d in (4, 8):
            pad = (-t) % d
            cpad = np.concatenate([counts, np.zeros(pad, counts.dtype)])
            strips = cpad.reshape(d, -1).sum(1)             # contiguous
            rr = np.array([cpad[i::d].sum() for i in range(d)])  # round-robin
            out[f"D{d}"] = {
                "contiguous_per_device": strips.tolist(),
                "round_robin_per_device": rr.tolist(),
                # max/mean = the straggler factor: the slowest device's load
                # relative to perfect balance (1.0 = balanced)
                "contiguous_straggler": round(float(strips.max()
                                                    / strips.mean()), 3),
                "round_robin_straggler": round(float(rr.max() / rr.mean()),
                                               3),
            }
        return out

    balance = tile_balance_artifact()

    print(json.dumps({
        "metric": "weak_scaling_all_modes",
        "camera_dp": results,
        "tile_sharded_stream": tile_results,
        "gauss_sharded_stream": gauss_results,
        "tile_parallel_train_step": tile_train_results,
        "tile_parallel_forward": tile_forward_results,
        "grid_train_step_2xT": grid_train_results,
        "gauss_parallel_train_step": gauss_train_results,
        "tile_ownership_balance": balance,
        "compile_only_1080p_tile_sharded": compile_1080p,
        "note": ("efficiency is meaningful on real multi-chip hardware only; "
                 "virtual host-platform devices share one CPU and weak-scale "
                 "at ~1/n by construction"),
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
