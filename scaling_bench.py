"""Scaling harness (round 5): every parallel mode on ONE canonical workload.

VERDICT r4 #3: the round-4 legs were incommensurable — different scenes,
sizes, and scaling recipes (weak vs strong), a toy-size gauss_stream leg,
and a superlinear gauss_parallel artifact from a 1-device baseline that
paid costs the sharded runs didn't. This version measures every mode on
the SAME canonical workload:

    2 cameras x 256x256 x 8192-capacity model (4096 alive), full train
    step (L1+D-SSIM fwd+bwd, Adam, densify stats) — or forward-only for
    the render legs — per "iteration".

All train legs execute exactly this work at every device count (strong
scaling), so per-leg ms are directly comparable. Modes that take one
camera per step (tile_train, gauss_train) run the two cameras
sequentially; batch modes (camera_dp, grid_train) take both at once.

How to read the numbers on the VIRTUAL CPU mesh (the only mesh in this
container): the D virtual devices share ONE physical CPU, so a perfectly
sharded program stays FLAT in wall-time as D grows (total compute is
constant), and `overhead_vs_d1 = ms_D / ms_baseline` measures the
REPLICATED COMPUTE + COLLECTIVE work a mode adds — not real-hardware
speedup. On real chips the replicated work runs concurrently and the
overhead ratio bounds the efficiency loss from below.

Two backend families (per-leg `backend` notes): the stream family
(tile/gauss/grid modes — the production TPU composite, interpret-mode on
CPU) is anchored by `tile_train@1`; the jnp family (camera_dp, whose
vmapped render uses the jnp composite off-TPU) is anchored by
`single_dev_b2`. Cross-family ms are NOT comparable; within-family they
are.

Also emits the grid_train analysis (VERDICT r4 #3): HLO collective
counts/bytes + cost_analysis for grid(2xT) vs its constituent 1D modes on
the same workload, plus the replicated-tail probe (Adam+scrub on a
replicated [CAP] tree vs D) that quantifies the proxy's replication tax.
"""

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

W, H = 256, 256
CAP = 8192
N_INIT = 4096
CANONICAL = f"2 cams x {W}x{H} x cap {CAP} ({N_INIT} alive), stream backend"


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    if not args.tpu:
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
    from jax.sharding import Mesh as _Mesh
    from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
    from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
    from mvs_gaussian_splatting_tpu.parallel.data_parallel import (
        make_batch_train_step, stack_cameras)
    from mvs_gaussian_splatting_tpu.parallel.gauss_stream import (
        make_gauss_sharded_stream)
    from mvs_gaussian_splatting_tpu.parallel.gauss_train import (
        make_gauss_train_step)
    from mvs_gaussian_splatting_tpu.parallel.grid_train import (
        make_grid_train_step)
    from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
    from mvs_gaussian_splatting_tpu.parallel.tile_stream import (
        make_tile_sharded_stream)
    from mvs_gaussian_splatting_tpu.parallel.tile_train import (
        make_tile_train_step)
    from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
    from mvs_gaussian_splatting_tpu.train.optim import adam_init
    from mvs_gaussian_splatting_tpu.utils.transforms import normalize
    from bench import build_scene

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu

    # --- canonical model/scene (one instance, deep-copied per leg: the
    # batch steps donate their inputs) --------------------------------------
    rng = np.random.RandomState(0)
    params0, aux0 = init_from_pcd(
        rng.uniform(-0.8, 0.8, (N_INIT, 3)).astype(np.float32),
        rng.rand(N_INIT, 3).astype(np.float32), CAP)
    adam0 = adam_init(params0)
    cam_a = graft._camera(W, H, 0.0)
    cam_b = graft._camera(W, H, 0.4)
    gt = jnp.zeros((3, H, W)) + 0.5
    opt_cfg = OptimizationConfig()
    stream_cfg = RasterConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                              tile_batch=16, backend="stream",
                              instance_cap=0)
    jnp_cfg = stream_cfg._replace(backend="jnp", instance_cap=1 << 16)

    def fresh_state(p=None, a=None, x=None):
        cp = lambda t: jax.tree.map(lambda v: jnp.array(v, copy=True), t)
        return (cp(params0 if p is None else p),
                cp(adam0 if a is None else a), cp(aux0 if x is None else x))

    def timeit(run, iters):
        run()                                   # warmup / compile
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        return (time.perf_counter() - t0) / iters * 1000

    results = {}

    def record(leg, n_dev, ms, baseline_key=None, **notes):
        entry = {"ms": round(ms, 2)}
        if baseline_key is not None and baseline_key in results \
                and "1" in results[baseline_key]["by_devices"]:
            base = results[baseline_key]["by_devices"]["1"]["ms"]
            entry["overhead_vs_d1"] = round(ms / base, 3)
        results.setdefault(leg, {"by_devices": {}, **notes})
        results[leg]["by_devices"][str(n_dev)] = entry

    # --- stream-family TRAIN legs -----------------------------------------
    def tile_train_run(n_dev):
        mesh = make_mesh(n_dev, axes=("tile",))
        step, place = make_tile_train_step(opt_cfg, stream_cfg, 1.0, mesh,
                                           interpret=interp)
        st = {}
        st["a"] = place(*fresh_state(), cam_a, gt, jnp.zeros(3))
        st["b"] = place(*fresh_state(), cam_b, gt, jnp.zeros(3))

        def run():
            for k in ("a", "b"):                # 2 cams sequentially
                p, a, x, c, g, b = st[k]
                p2, a2, x2, m = step(p, a, x, c, g, b, jnp.int32(1),
                                     jnp.asarray(False), width=W, height=H,
                                     sh_degree=0)
                st[k] = (p2, a2, x2, c, g, b)
            jax.block_until_ready(m)
        return run

    def gauss_train_run(n_dev):
        mesh = make_mesh(n_dev, axes=("gauss",))
        step, place = make_gauss_train_step(
            opt_cfg, stream_cfg, 1.0, mesh, interpret=interp)
        st = {}
        st["a"] = place(*fresh_state(), cam_a, gt, jnp.zeros(3))
        st["b"] = place(*fresh_state(), cam_b, gt, jnp.zeros(3))

        def run():
            for k in ("a", "b"):
                p, a, x, c, g, b = st[k]
                p2, a2, x2, m = step(p, a, x, c, g, b, jnp.int32(1),
                                     jnp.asarray(False), width=W, height=H,
                                     sh_degree=0)
                st[k] = (p2, a2, x2, c, g, b)
            jax.block_until_ready(m)
        return run

    def grid_train_make(n_dev):
        n_tile = max(1, n_dev // 2)
        devs = np.array(jax.devices()[:2 * n_tile]).reshape(2, n_tile)
        mesh = _Mesh(devs, ("data", "tile"))
        step, place = make_grid_train_step(opt_cfg, stream_cfg, 1.0, mesh,
                                           interpret=interp)
        cams = stack_cameras([cam_a, cam_b])
        gts = jnp.stack([gt, gt])
        placed = place(*fresh_state(), cams, gts, jnp.zeros(3))
        return mesh, step, placed

    def grid_train_run(n_dev):
        mesh, step, placed = grid_train_make(n_dev)
        holder = {"s": placed[:3]}
        b_cams, b_gts, b_bg = placed[3:]

        def run():
            p, a, x = holder["s"]
            p2, a2, x2, m = step(p, a, x, b_cams, b_gts, b_bg, jnp.int32(1),
                                 jnp.asarray(False), width=W, height=H,
                                 sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    for d in (1, 2, 4, 8):
        record("tile_train", d, timeit(tile_train_run(d), args.iters),
               baseline_key="tile_train",
               backend="stream", scaling="strong (tiles of each frame)")
    for d in (1, 2, 4, 8):
        record("gauss_train", d, timeit(gauss_train_run(d), args.iters),
               baseline_key="tile_train",
               backend="stream",
               scaling=f"strong (cap {CAP} sharded over gauss axis)")
    for d in (4, 8):
        record("grid_train_2xT", d, timeit(grid_train_run(d), args.iters),
               baseline_key="tile_train",
               backend="stream",
               scaling="strong (2 cams on data axis x tiles)")

    # --- jnp-family TRAIN legs (camera-DP; its vmapped render uses the jnp
    # composite off-TPU, so it anchors on its own 1-device baseline) --------
    def dp_run(n_dev):
        mesh = make_mesh(n_dev)
        step, place = make_batch_train_step(opt_cfg, jnp_cfg, 1.0, mesh)
        cams = stack_cameras([cam_a, cam_b])
        gts = jnp.stack([gt, gt])
        p0, a0, x0, b_cams, b_gts, b_bg = place(*fresh_state(), cams, gts,
                                                jnp.zeros(3))
        holder = {"s": (p0, a0, x0)}

        def run():
            p, a, x = holder["s"]
            with mesh:
                p2, a2, x2, m = step(p, a, x, b_cams, b_gts, b_bg,
                                     jnp.int32(1), jnp.asarray(False),
                                     width=W, height=H, sh_degree=0)
            holder["s"] = (p2, a2, x2)
            jax.block_until_ready(m)
        return run

    for d in (1, 2):
        record("camera_dp_b2", d, timeit(dp_run(d), args.iters),
               baseline_key="camera_dp_b2",
               backend="jnp", scaling="B=2 sharded over data axis")

    # --- forward-only render legs, canonical scene (non-toy: VERDICT r4
    # #3 flagged the 0.25 ms gauss_stream toy) ------------------------------
    cam_s, (means_s, ls_s, q_s, ol_s, shs_s) = build_scene(CAP, W, H, seed=2)

    def fwd_run(make_fn, n_dev, axis):
        mesh = make_mesh(n_dev, axes=(axis,))
        if make_fn is make_gauss_sharded_stream:
            fn = make_fn(mesh, axis, W, H, stream_cfg, n_total=CAP,
                         interpret=interp)
        else:
            fn = make_fn(mesh, axis, W, H, stream_cfg, interpret=interp,
                         round_robin=True)

        def fwd(m):
            p = preprocess(m, jax.nn.sigmoid(ol_s), cam_s, W, H,
                           scales=jnp.exp(ls_s), rotations=normalize(q_s),
                           shs=shs_s, sh_degree=1,
                           tile_w=stream_cfg.tile_w, tile_h=stream_cfg.tile_h)
            img, _ = fn(p, jnp.zeros(3))
            return img

        with mesh:
            step = jax.jit(fwd)
        holder = {"x": means_s}

        def run():
            for _ in range(2):                  # 2 renders = 2 cams' worth
                with mesh:
                    img = step(holder["x"])
                holder["x"] = holder["x"] + 1e-9 * img.mean()
            jax.block_until_ready(holder["x"])
        return run

    for d in (1, 2, 4, 8):
        record("tile_stream_fwd", d,
               timeit(fwd_run(make_tile_sharded_stream, d, "tile"),
                      args.iters),
               baseline_key="tile_stream_fwd",
               backend="stream", scaling="forward-only, tiles sharded")
    for d in (1, 2, 4, 8):
        record("gauss_stream_fwd", d,
               timeit(fwd_run(make_gauss_sharded_stream, d, "gauss"),
                      args.iters),
               baseline_key="tile_stream_fwd",
               backend="stream",
               scaling=f"forward-only, {CAP} gaussians sharded")

    # --- replicated-tail probe: Adam+scrub on a replicated tree vs D ------
    # On the shared-CPU proxy every device executes replicated compute, so
    # this grows ~linearly with D — the replication tax that strong-scaling
    # train legs pay for params/opt-state kept replicated. Real chips run
    # these copies concurrently (the tax is ~0 there); this row calibrates
    # how much of each leg's overhead_vs_d1 is proxy artifact.
    from mvs_gaussian_splatting_tpu.train.optim import (adam_update,
                                                        group_lrs,
                                                        scrub_grads)
    from mvs_gaussian_splatting_tpu.parallel.mesh import replicated

    def tail_run(n_dev):
        mesh = make_mesh(n_dev)
        repl = replicated(mesh)
        p, a, x = fresh_state()
        p = jax.device_put(p, repl)
        a = jax.device_put(a, repl)
        alive = jax.device_put(x.alive, repl)

        @jax.jit
        def tail(pp, aa, g, i):
            g, _ = scrub_grads(g)
            lrs = group_lrs(opt_cfg, i, 1.0, pp)
            return adam_update(g, aa, pp, lrs, alive=alive)

        g = jax.device_put(jax.tree.map(jnp.ones_like, p), repl)
        holder = {"s": (p, a)}

        def run():
            pp, aa = holder["s"]
            holder["s"] = tail(pp, aa, g, jnp.int32(1))
            jax.block_until_ready(holder["s"][0].xyz)
        return run

    for d in (1, 2, 4, 8):
        record("replicated_adam_tail", d, timeit(tail_run(d), args.iters),
               baseline_key="replicated_adam_tail",
               backend="n/a", scaling="replicated update, no sharded axis")

    # --- grid_train analysis: collectives + cost vs constituent modes -----
    def hlo_stats(compiled):
        txt = compiled.as_text()
        counts = {}
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            counts[op] = txt.count(f" {op}(") + txt.count(f" {op}-start(")
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return {"collectives": counts,
                "flops": float(ca.get("flops", -1.0)),
                "bytes_accessed": float(ca.get("bytes accessed", -1.0))}

    analysis = {}
    # grid at 2x4 (8 devices)
    mesh_g, step_g, placed_g = grid_train_make(8)
    lowered = step_g.lower(*placed_g[:3], *placed_g[3:], jnp.int32(1),
                           jnp.asarray(False), width=W, height=H,
                           sh_degree=0)
    analysis["grid_2x4"] = hlo_stats(lowered.compile())
    # tile_train at 4 (grid's per-camera tile shard count)
    mesh_t = make_mesh(4, axes=("tile",))
    step_t, place_t = make_tile_train_step(opt_cfg, stream_cfg, 1.0, mesh_t,
                                           interpret=interp)
    placed_t = place_t(*fresh_state(), cam_a, gt, jnp.zeros(3))
    lowered_t = step_t.lower(*placed_t, jnp.int32(1), jnp.asarray(False),
                             width=W, height=H, sh_degree=0)
    analysis["tile_4"] = hlo_stats(lowered_t.compile())
    # camera_dp at 2 (grid's data-axis extent)
    mesh_d = make_mesh(2)
    step_d, place_d = make_batch_train_step(opt_cfg, jnp_cfg, 1.0, mesh_d)
    placed_d = place_d(*fresh_state(), stack_cameras([cam_a, cam_b]),
                       jnp.stack([gt, gt]), jnp.zeros(3))
    with mesh_d:
        lowered_d = step_d.lower(*placed_d, jnp.int32(1), jnp.asarray(False),
                                 width=W, height=H, sh_degree=0)
        analysis["camera_dp_2"] = hlo_stats(lowered_d.compile())

    # --- 1080p compile-only regression check (kept from r4) ---------------
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

    t0 = time.perf_counter()
    with mesh:
        compiled = jax.jit(jax.grad(loss1080)).lower(means).compile()
    compile_1080p = {"ok": compiled is not None,
                     "seconds": round(time.perf_counter() - t0, 1),
                     "devices": n_all}

    print(json.dumps({
        "metric": "canonical_workload_scaling",
        "workload": CANONICAL,
        "iteration_definition": "one full train step over BOTH cameras "
                                "(batch modes: B=2 at once; per-camera "
                                "modes: 2 sequential steps); forward legs: "
                                "2 renders",
        "reading": "virtual shared-CPU mesh: flat ms vs D = perfectly "
                   "sharded; overhead_vs_d1 = replicated+collective work "
                   "added by the mode (NOT real-chip speedup). See "
                   "replicated_adam_tail for the proxy's replication tax.",
        "legs": results,
        "grid_analysis": analysis,
        "compile_only_1080p_tile_sharded": compile_1080p,
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
