"""The training driver: the TPU-native equivalent of train.py:34-160.

Host-side orchestration around jitted steps: camera sampling, LR/SH
scheduling, densification cadence, capacity growth, checkpoints and eval.
"""

from __future__ import annotations

import math
import random
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.scene import Scene
from ..models.densify import (DensifyConfig, densify_and_prune,
                              densify_and_prune_grow, reset_opacity)
from ..models.gaussians import (compact, compact_state, init_from_pcd,
                                num_alive, pad_capacity)
from ..models.grow import GrowConfig
from ..ops.rasterize import RasterConfig
from ..utils.losses import psnr
from ..utils.system import seed_everything
from .checkpoint import load_checkpoint, save_checkpoint
from .config import (ModelConfig, OptimizationConfig, PipelineConfig,
                     TrainRunConfig, save_cfg_args)
from .optim import AdamState, adam_init
from .step import make_eval_metrics, make_eval_render, make_train_step


PROFILE_DIR = ""       # set by the CLI --profile_dir flag
_PROFILE_WINDOW = (100, 120)


def raster_config_from_pipe(pipe: PipelineConfig) -> RasterConfig:
    return RasterConfig(backend=pipe.backend,
                        tile_w=pipe.tile_w, tile_h=pipe.tile_h,
                        tile_capacity=pipe.tile_capacity,
                        max_tiles_per_gaussian=pipe.max_tiles_per_gaussian,
                        tile_batch=pipe.tile_batch,
                        fast_math=pipe.fast_math,
                        tier_budgets=tuple(pipe.tier_budgets),
                        tier_fracs=tuple(pipe.tier_fracs))


def eval_config(raster_cfg: RasterConfig) -> RasterConfig:
    """The single source of the eval invariants: every surface that
    produces user-visible images or reported metrics (in-loop eval sweeps,
    val-image dumps, the viewer frame path; cli/render goes through
    eval_raster_config which applies the same rules) composites in EXACT
    mode AND with the generous full-footprint tile budgets
    (ops.rasterize.widen_eval_budgets). fast_math is a train-time
    speed/accuracy trade (~1e-3 pixel error, BASELINE.md); the tight train
    budgets are a train-time perf trade the model co-adapts to — neither
    may contaminate reported PSNR (round 5: the loop evaluating with train
    budgets read 0.34 dB above the offline render of the same model —
    runs/specadapt). tests/test_eval_exact.py locks this invariant."""
    from ..ops.rasterize import widen_eval_budgets
    return widen_eval_budgets(raster_cfg._replace(fast_math=False))


def eval_instance_cap(n_rows: int, eval_cfg: RasterConfig) -> int:
    """Exact tier-enumeration bound for an eval render over ``n_rows`` rows
    (CHUNK-aligned): makes GLOBAL capacity overflow impossible by
    construction, mirroring cli/render.eval_raster_config's cap rule."""
    from ..ops.binning import stream_instance_bound
    bound = stream_instance_bound(n_rows, eval_cfg.max_tiles_per_gaussian,
                                  eval_cfg.tier_budgets, eval_cfg.tier_fracs)
    return bound + (-bound) % 128


def adaptive_eval_layout(params, aux, cameras, eval_cfg: RasterConfig,
                         n_rows: int):
    """((d, budgets, fracs), instance_cap) for a CLIP-FREE in-loop eval.

    Measures per-Gaussian tile needs over the eval cameras (preprocess-only
    sweep, cli/render.measure_tile_needs) and sizes the tier layout so no
    splat loses tiles — the same operator as cli/render's adaptive offline
    chain, so history.json PSNR and offline results.json agree on the same
    model by construction (any two unclipped layouts render identical
    images; round 5 closed the 0.34 dB residual here). Fracs are rounded UP
    to a coarse power-of-two grid so the jitted eval only recompiles when a
    tier crosses a bucket, not on every needs drift."""
    from ..cli.render import measure_tile_needs
    from ..ops.binning import adaptive_tier_layout, stream_instance_bound
    p = jax.tree.map(lambda a: a[:n_rows], params)
    needs = measure_tile_needs(p, cameras, eval_cfg.tile_w, eval_cfg.tile_h)
    # dead slots never render (alive-masked in the eval) — their projected
    # rects must not inflate the layout
    needs = np.where(np.asarray(aux.alive[:n_rows]), needs, 0)
    d, budgets, fracs, n_clipped = adaptive_tier_layout(
        needs, eval_cfg.max_tiles_per_gaussian, eval_cfg.tier_budgets,
        eval_cfg.tier_fracs, quantize=True)
    if n_clipped:
        print(f"WARNING: eval adaptive budgets hit the slot limit — "
              f"{n_clipped} Gaussians render clipped")
    bound = stream_instance_bound(n_rows, d, budgets, fracs)
    return (d, tuple(budgets), tuple(fracs)), bound + (-bound) % 128


def train(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
          pipe_cfg: PipelineConfig, run_cfg: TrainRunConfig,
          scene: Optional[Scene] = None,
          log_fn: Callable[[str], None] = print):
    """Run the full optimization. Returns (params, aux, scene, history)."""
    seed_everything(run_cfg.seed)
    if scene is None:
        scene = Scene(model_cfg)
    if model_cfg.model_path:
        save_cfg_args(model_cfg.model_path, model_cfg)

    raster_cfg = raster_config_from_pipe(pipe_cfg)
    spatial_lr_scale = float(scene.cameras_extent)
    extras = model_cfg.extras()
    use_extras = any(extras.values())

    compact_jit = jax.jit(compact_state)
    first_iter = 0
    active_sh = 0
    if run_cfg.start_checkpoint:
        params, adam, aux, first_iter, active_sh = load_checkpoint(
            run_cfg.start_checkpoint)
        # checkpoints taken mid-training may have alive holes — compact so
        # the render prefix-slice below is valid
        params, mu, nu, aux = compact_jit(params, adam.mu, adam.nu, aux)
        adam = adam._replace(mu=mu, nu=nu)
        log_fn(f"resumed from {run_cfg.start_checkpoint} at iter {first_iter}")
    else:
        n0 = len(scene.info.points)
        capacity = max(1024, int(n0 * opt_cfg.initial_capacity_factor))
        capacity = 1 << math.ceil(math.log2(capacity))
        params, aux = init_from_pcd(
            scene.info.points, scene.info.colors, capacity,
            sh_degree=model_cfg.sh_degree,
            extras=extras if use_extras else None,
            num_dirs=model_cfg.num_dirs,
            key=jax.random.PRNGKey(run_cfg.seed))
        adam = adam_init(params)
        log_fn(f"Number of points at initialisation : {n0} (capacity {capacity})")

    train_step = make_train_step(opt_cfg, raster_cfg, spatial_lr_scale)
    eval_cfg = eval_config(raster_cfg)
    eval_render = make_eval_render(eval_cfg)
    eval_metrics = make_eval_metrics(eval_cfg)
    render_n = _render_bucket(int(num_alive(aux)), params.xyz.shape[0])
    # measured-load instance-cap bucket (stream backend only): 0 = the
    # a-priori auto heuristic; re-bucketed from metrics.instance_load at
    # every densify round, grown immediately on an overflow signal
    stream_caps = (raster_cfg.backend == "stream"
                   or (raster_cfg.backend == "auto"
                       and jax.default_backend() == "tpu"))
    inst_cap = 0
    # visible-prefix compaction bucket (round 4): sized from the measured
    # per-camera visible count, grown immediately on overflow_visible
    use_vis = pipe_cfg.visible_compaction and stream_caps
    vis_cap = 0
    vis_max = 0

    batch_step = None
    mesh = None
    tile_step = None
    if run_cfg.data_parallel > 0 and run_cfg.tile_parallel > 0:
        # 2D mesh: cameras × tiles in ONE train step (round-4, VERDICT #1) —
        # the "one host's chips cooperate per frame, DP across hosts" shape.
        # Uses the batch_step slot: same signature as make_batch_train_step.
        import numpy as _np
        from jax.sharding import Mesh as _Mesh
        from ..parallel.grid_train import make_grid_train_step
        need = run_cfg.data_parallel * run_cfg.tile_parallel
        devs = jax.devices()
        if len(devs) < need:
            raise ValueError(
                f"grid_parallel needs {need} devices "
                f"({run_cfg.data_parallel} data × {run_cfg.tile_parallel} "
                f"tile), have {len(devs)}")
        mesh = _Mesh(_np.array(devs[:need]).reshape(
            run_cfg.data_parallel, run_cfg.tile_parallel), ("data", "tile"))
        batch_step, place_inputs = make_grid_train_step(
            opt_cfg, raster_cfg, spatial_lr_scale, mesh)
        log_fn(f"grid-parallel: {run_cfg.data_parallel} cameras/step × "
               f"{run_cfg.tile_parallel}-way tile sharding "
               f"({mesh.devices.size} devices)")
    elif run_cfg.data_parallel > 0:
        from ..parallel.data_parallel import make_batch_train_step
        from ..parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        mesh = make_mesh(min(n_dev, run_cfg.data_parallel))
        batch_step, place_inputs = make_batch_train_step(
            opt_cfg, raster_cfg, spatial_lr_scale, mesh)
        log_fn(f"data-parallel: {run_cfg.data_parallel} cameras/step over "
               f"{mesh.devices.size} device(s)")
    elif run_cfg.tile_parallel > 0:
        from ..parallel.mesh import make_mesh
        from ..parallel.tile_train import make_tile_train_step
        n_dev = len(jax.devices())
        t_mesh = make_mesh(min(n_dev, run_cfg.tile_parallel), axes=("tile",))
        tile_step, tile_place = make_tile_train_step(
            opt_cfg, raster_cfg, spatial_lr_scale, t_mesh)
        log_fn(f"tile-parallel: 1 camera/step, tiles sharded over "
               f"{t_mesh.devices.size} device(s)")
    elif run_cfg.gauss_parallel > 0:
        # primitive-sharded training (round 4, VERDICT #3): params/Adam/aux
        # live N/D per device; uses the tile_step slot (same signature)
        from ..parallel.mesh import make_mesh
        from ..parallel.gauss_train import make_gauss_train_step
        n_dev = len(jax.devices())
        g_mesh = make_mesh(min(n_dev, run_cfg.gauss_parallel),
                           axes=("gauss",))
        tile_step, tile_place = make_gauss_train_step(
            opt_cfg, raster_cfg, spatial_lr_scale, g_mesh)
        log_fn(f"gauss-parallel: params sharded over "
               f"{g_mesh.devices.size} device(s), one all_to_all "
               f"instance exchange per step")

    grow_cfg = None
    sphere_dirs = None
    spec_step = None
    spec_batch_step = None
    if use_extras:
        from ..utils.sphere import sphere_points
        from .grow_step import make_spec_batch_train_step, make_spec_train_step
        grow_cfg = GrowConfig(
            grow_dir=model_cfg.grow_dir, continous_dir=model_cfg.continous_dir,
            grow_distance=model_cfg.grow_distance,
            learn_split_distance=model_cfg.learn_split_distance,
            learn_split_scale=model_cfg.learn_split_scale,
            num_dirs=model_cfg.num_dirs,
            prob_notreinit=model_cfg.prob_notreinit,
            split_notreinit=model_cfg.split_notreinit,
            symmetric_split=model_cfg.symmetric_split)
        if model_cfg.grow_dir:
            sphere_dirs = sphere_points(model_cfg.num_dirs)
        spec_size = pipe_cfg.spec_capacity
        spec_step = make_spec_train_step(opt_cfg, raster_cfg, spatial_lr_scale,
                                         grow_cfg, sphere_dirs, spec_size,
                                         float(scene.cameras_extent))
        if mesh is not None:
            # grow-mode composes with data parallelism (VERDICT #5): the
            # speculation block is camera-independent, so the batched step
            # renders it against every camera of the batch
            spec_batch_step, spec_place = make_spec_batch_train_step(
                opt_cfg, raster_cfg, spatial_lr_scale, grow_cfg, sphere_dirs,
                spec_size, float(scene.cameras_extent), mesh)
    densify_cfg = DensifyConfig(
        grad_threshold=opt_cfg.densify_grad_threshold,
        min_opacity=opt_cfg.min_opacity,
        percent_dense=opt_cfg.percent_dense,
        symmetric_split=model_cfg.symmetric_split)
    densify_jit = jax.jit(
        lambda p, m, n, a, k, gate: densify_and_prune(
            p, m, n, a, k, scene.cameras_extent, densify_cfg, gate))
    densify_grow_jit = None
    if use_extras and (model_cfg.grow_dir or model_cfg.continous_dir):
        sd = (jnp.asarray(sphere_dirs, jnp.float32)
              if sphere_dirs is not None else None)
        densify_grow_jit = jax.jit(
            lambda p, m, n, a, k, gate: densify_and_prune_grow(
                p, m, n, a, k, scene.cameras_extent, densify_cfg,
                grow_cfg, sd, gate))
    reset_jit = jax.jit(reset_opacity)

    bg_np = np.ones(3, np.float32) if model_cfg.white_background else np.zeros(3, np.float32)
    bg = jnp.asarray(bg_np)
    key = jax.random.PRNGKey(run_cfg.seed + 1)

    tb_writer = _make_tb_writer(model_cfg.model_path)
    viewpoint_stack: list = []
    history = {"loss": [], "psnr_test": {}, "n_alive": {}, "iter_time": []}
    best_test_psnr = -1.0
    diverged_evals = 0
    ema_loss = 0.0
    t_last = time.perf_counter()
    progress = _make_progress(first_iter, opt_cfg.iterations)

    for iteration in range(first_iter + 1, opt_cfg.iterations + 1):
        if PROFILE_DIR and iteration == _PROFILE_WINDOW[0]:
            jax.profiler.start_trace(PROFILE_DIR)
        if PROFILE_DIR and iteration == _PROFILE_WINDOW[1]:
            jax.profiler.stop_trace()
            log_fn(f"[ITER {iteration}] profiler trace written to {PROFILE_DIR}")
        _gui_pump(model_cfg, params, aux, eval_cfg, active_sh, iteration,
                  opt_cfg.iterations)
        if iteration % 1000 == 0 and active_sh < model_cfg.sh_degree:
            active_sh += 1

        if not viewpoint_stack:
            viewpoint_stack = scene.get_train_cameras().copy()
        cam = viewpoint_stack.pop(random.randint(0, len(viewpoint_stack) - 1))

        if opt_cfg.random_background:
            key, sub = jax.random.split(key)
            bg_it = jax.random.uniform(sub, (3,))
        else:
            bg_it = bg

        gt = cam.device_image()
        do_stats = iteration < opt_cfg.densify_until_iter
        # speculative grow/split render window (renderer :92-93, :186-196)
        spec_now = False
        if spec_step is not None:
            grow_window = ((model_cfg.grow_dir or model_cfg.continous_dir)
                           and iteration > (opt_cfg.densify_from_iter
                                            - opt_cfg.densification_interval - 1)
                           and iteration < opt_cfg.densify_until_iter
                           and iteration > opt_cfg.opacity_reset_interval)
            split_only = (not (model_cfg.grow_dir or model_cfg.continous_dir)
                          and (model_cfg.learn_split_distance
                               or model_cfg.learn_split_scale))
            spec_now = grow_window or split_only
        def draw_camera_batch(first_cam):
            """Fill the DP batch with same-size cameras (pad-or-repeat)."""
            nonlocal viewpoint_stack
            size = first_cam.image.shape
            cams = [first_cam]
            tries = 0
            # batch must share one static (H, W); draw same-size cameras
            max_tries = 4 * len(scene.get_train_cameras())
            while len(cams) < run_cfg.data_parallel and tries < max_tries:
                if not viewpoint_stack:
                    viewpoint_stack = scene.get_train_cameras().copy()
                c = viewpoint_stack.pop(
                    random.randint(0, len(viewpoint_stack) - 1))
                tries += 1
                if c.image.shape == size:
                    cams.append(c)
            if len(cams) < run_cfg.data_parallel:
                # mixed-resolution scene with too few same-size cameras:
                # pad the batch by cycling the drawn ones — a short batch
                # would break the static batch shape (shard mismatch) or
                # silently lose throughput. Duplicated cameras only reweight
                # this step's gradient average; statistically harmless.
                if iteration == first_iter + 1:
                    log_fn(f"data-parallel: only {len(cams)} cameras at "
                           f"{size[2]}x{size[1]} — padding batch with "
                           "repeats")
                k = len(cams)
                cams = [cams[i % k] for i in range(run_cfg.data_parallel)]
            return cams, size

        if spec_now and spec_batch_step is not None:
            from ..parallel.data_parallel import stack_cameras
            cams, size = draw_camera_batch(cam)
            gts = jnp.stack([c.device_image() for c in cams])
            key, sub = jax.random.split(key)
            with mesh:
                b_params, b_adam, b_aux, b_cams, b_gts, b_bg = spec_place(
                    params, adam, aux, stack_cameras([c.view() for c in cams]),
                    gts, bg_it)
                params, adam, aux, metrics = spec_batch_step(
                    b_params, b_adam, b_aux, b_cams, b_gts, b_bg,
                    jnp.int32(iteration), jnp.asarray(do_stats), sub,
                    width=size[2], height=size[1], sh_degree=active_sh,
                    render_n=render_n, instance_cap=inst_cap)
        elif spec_now:
            key, sub = jax.random.split(key)
            params, adam, aux, metrics = spec_step(
                params, adam, aux, cam.view(), gt, bg_it,
                jnp.int32(iteration), jnp.asarray(do_stats), sub,
                width=cam.image.shape[2], height=cam.image.shape[1],
                sh_degree=active_sh, render_n=render_n,
                instance_cap=inst_cap)
        elif batch_step is not None:
            from ..parallel.data_parallel import stack_cameras
            cams, size = draw_camera_batch(cam)
            gts = jnp.stack([c.device_image() for c in cams])
            with mesh:
                b_params, b_adam, b_aux, b_cams, b_gts, b_bg = place_inputs(
                    params, adam, aux, stack_cameras([c.view() for c in cams]),
                    gts, bg_it)
                params, adam, aux, metrics = batch_step(
                    b_params, b_adam, b_aux, b_cams, b_gts, b_bg,
                    jnp.int32(iteration), jnp.asarray(do_stats),
                    width=size[2], height=size[1], sh_degree=active_sh,
                    render_n=render_n, instance_cap=inst_cap)
        elif tile_step is not None:
            params, adam, aux, cam_v, gt_p, bg_p = tile_place(
                params, adam, aux, cam.view(), gt, bg_it)
            params, adam, aux, metrics = tile_step(
                params, adam, aux, cam_v, gt_p, bg_p,
                jnp.int32(iteration), jnp.asarray(do_stats),
                width=cam.image.shape[2], height=cam.image.shape[1],
                sh_degree=active_sh, render_n=render_n,
                instance_cap=inst_cap)
        else:
            params, adam, aux, metrics = train_step(
                params, adam, aux, cam.view(), gt, bg_it,
                jnp.int32(iteration), jnp.asarray(do_stats),
                width=cam.image.shape[2], height=cam.image.shape[1],
                sh_degree=active_sh, render_n=render_n,
                instance_cap=inst_cap, visible_cap=vis_cap)

        # Pre-densify state refs for the report (free — JAX arrays are
        # immutable; only eval iterations keep them live past densify)
        eval_state = (params, aux, render_n)

        # ---- densification schedule (train.py:126-137) -------------------
        if iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                n_al = int(num_alive(aux))
                capacity = params.xyz.shape[0]
                if n_al > 0.7 * capacity and capacity < opt_cfg.max_capacity:
                    new_cap = min(int(capacity * opt_cfg.capacity_growth_factor),
                                  opt_cfg.max_capacity)
                    log_fn(f"[ITER {iteration}] capacity {capacity} → {new_cap}")
                    params, aux = pad_capacity(params, aux, new_cap)
                    adam = AdamState(count=adam.count,
                                     mu=_pad_tree(adam.mu, new_cap),
                                     nu=_pad_tree(adam.nu, new_cap))
                key, sub = jax.random.split(key)
                gate = iteration > opt_cfg.opacity_reset_interval
                use_grow = densify_grow_jit is not None and gate
                fn = densify_grow_jit if use_grow else densify_jit
                params, mu, nu, aux, info = fn(
                    params, adam.mu, adam.nu, aux, sub, jnp.asarray(gate))
                adam = adam._replace(mu=mu, nu=nu)
                if int(info["n_dropped"]) > 0:
                    log_fn(f"[ITER {iteration}] WARNING: {int(info['n_dropped'])} "
                           "densification slots dropped (capacity starved)")
                if iteration % 500 == 0:
                    log_fn(f"[ITER {iteration}] densify: "
                           f"+{int(info['n_cloned'])} clone "
                           f"+{int(info['n_split'])} split "
                           f"-{int(info['n_pruned'])} prune "
                           f"→ {int(info['n_alive'])} alive")
                # keep alive slots a prefix so the render slice stays valid,
                # then re-bucket the static render length
                params, mu, nu, aux = compact_jit(params, adam.mu, adam.nu,
                                                  aux)
                adam = adam._replace(mu=mu, nu=nu)
                new_rn = _render_bucket(int(num_alive(aux)),
                                        params.xyz.shape[0])
                if new_rn != render_n:
                    log_fn(f"[ITER {iteration}] render slice "
                           f"{render_n} → {new_rn}")
                    render_n = new_rn
                if stream_caps:
                    new_ic = _instance_bucket(
                        int(metrics.instance_load),
                        render_n or params.xyz.shape[0], raster_cfg)
                    if new_ic != inst_cap:
                        log_fn(f"[ITER {iteration}] instance cap "
                               f"{inst_cap or 'auto'} → {new_ic or 'auto'}")
                        inst_cap = new_ic
                if use_vis and vis_max > 0:
                    # re-bucket from the max visible count seen since the
                    # last densify round (covers camera-to-camera spread);
                    # 0 = off when the bucket wouldn't beat the render slice
                    new_vc = _render_bucket(vis_max,
                                            render_n or params.xyz.shape[0],
                                            margin=1.3)
                    if new_vc != vis_cap:
                        log_fn(f"[ITER {iteration}] visible cap "
                               f"{vis_cap or 'off'} → {new_vc or 'off'}")
                        vis_cap = new_vc
                    vis_max = 0
            if (iteration % opt_cfg.opacity_reset_interval == 0
                    or (model_cfg.white_background
                        and iteration == opt_cfg.densify_from_iter)):
                params, mu, nu = reset_jit(params, adam.mu, adam.nu)
                adam = adam._replace(mu=mu, nu=nu)

        # ---- logging / eval / save --------------------------------------
        # Fetch the loss scalar only at display/log points: a per-iteration
        # float() is a host-device sync that stalls the dispatch pipeline
        # every step (and a full round trip on a tunneled device). The EMA
        # therefore blends SAMPLED losses (every 10th) — display-only
        # smoothing, slightly noisier than the reference's per-iteration EMA.
        if iteration % 10 == 0 or iteration % run_cfg.log_every == 0:
            loss, oc_now, il_now, nf_now, mv_now, ov_now = (
                float(v) for v in jax.device_get(
                    (metrics.loss, metrics.overflow_capacity,
                     metrics.instance_load, metrics.nonfinite_grad_rows,
                     metrics.mask_visible, metrics.overflow_visible)))
            if use_vis:
                vis_max = max(vis_max, int(mv_now))
                if ov_now > 0:
                    # the bucket dropped real (farthest) visible rows —
                    # grow to cover the measured count right away
                    new_vc = _render_bucket(int(mv_now),
                                            render_n or params.xyz.shape[0],
                                            margin=1.3)
                    if new_vc != vis_cap:
                        log_fn(f"[ITER {iteration}] visible cap overflow "
                               f"({int(ov_now)} rows) → {new_vc or 'off'}")
                        vis_cap = new_vc
            ema_loss = 0.4 * loss + 0.6 * ema_loss
            if nf_now > 0:
                log_fn(f"[ITER {iteration}] WARNING: {int(nf_now)} rows had "
                       "non-finite gradients (zeroed by scrub_grads)")
            if stream_caps and oc_now > 0:
                # cap too tight — either the measured-load bucket after a
                # load spike (e.g. right after an opacity reset) or the
                # a-priori auto heuristic under early-training large splats.
                # Grow to the bucket covering the spilled load.
                grown = _instance_bucket(int(il_now + oc_now),
                                         render_n or params.xyz.shape[0],
                                         raster_cfg)
                if grown != inst_cap:
                    inst_cap = grown
                    log_fn(f"[ITER {iteration}] instance cap overflow "
                           f"({int(oc_now)} entries) → {inst_cap}")
        if progress is not None and iteration % 10 == 0:
            progress.set_postfix({"Loss": f"{ema_loss:.7f}",
                                  "pts": int(num_alive(aux))})
            progress.update(10)
        if iteration % run_cfg.log_every == 0:
            now = time.perf_counter()
            it_s = run_cfg.log_every / (now - t_last)
            t_last = now
            history["loss"].append((iteration, loss))
            history["iter_time"].append((iteration, it_s))
            if tb_writer is not None:
                tb_writer.add_scalar("train_loss_patches/l1_loss",
                                     float(metrics.l1), iteration)
                tb_writer.add_scalar("train_loss_patches/total_loss", loss,
                                     iteration)
                tb_writer.add_scalar("iter_time", 1000.0 / it_s, iteration)
        if iteration % 500 == 0:
            log_fn(f"[ITER {iteration}] loss {ema_loss:.5f} "
                   f"alive {int(num_alive(aux))} "
                   f"({history['iter_time'][-1][1]:.1f} it/s)"
                   if history["iter_time"] else f"[ITER {iteration}]")
        if iteration % 100 == 0 and int(metrics.overflow_capacity) > 0:
            log_fn(f"[ITER {iteration}] WARNING: tile capacity overflow "
                   f"{int(metrics.overflow_capacity)} entries")

        eval_now = (iteration in run_cfg.test_iterations
                    or (run_cfg.eval_every and iteration % run_cfg.eval_every == 0))
        if eval_now:
            # training-report parity (train.py:210-236): full test set AND
            # 5 fixed train views, L1 + PSNR for both. Evaluates the
            # PRE-densify/reset state captured above, matching the
            # reference's report-before-densify order (train.py:111-137) —
            # an eval at an opacity-reset iteration must not see the reset.
            e_params, e_aux, e_rn = eval_state
            train_all = scene.get_train_cameras()
            configs = [("test", scene.get_test_cameras()),
                       ("train", [train_all[idx % len(train_all)]
                                  for idx in range(5, 30, 5)]
                        if train_all else [])]
            e_layout, e_cap = None, 0
            test_layout, test_cap = None, 0
            for split, cams in configs:
                if not cams:
                    continue
                if stream_caps:
                    # per-SPLIT layout: the test split's measured needs (and
                    # therefore its clip-free operator) must match what
                    # cli/render computes for the same split, so
                    # history.json PSNR == offline results.json by
                    # construction
                    e_layout, e_cap = adaptive_eval_layout(
                        e_params, e_aux, cams, eval_cfg,
                        e_rn or e_params.xyz.shape[0])
                l1v, ps = evaluate_split(eval_metrics, e_params, e_aux, cams,
                                         bg, active_sh, render_n=e_rn,
                                         instance_cap=e_cap,
                                         tier_layout=e_layout)
                log_fn(f"[ITER {iteration}] Evaluating {split}: "
                       f"L1 {l1v:.6f} PSNR {ps:.2f}")
                if tb_writer is not None:
                    tb_writer.add_scalar(
                        f"{split}/loss_viewpoint - l1_loss", l1v, iteration)
                    tb_writer.add_scalar(
                        f"{split}/loss_viewpoint - psnr", ps, iteration)
                if split == "test":
                    history["psnr_test"][iteration] = ps
                    history["n_alive"][iteration] = int(num_alive(e_aux))
                    test_layout, test_cap = e_layout, e_cap
            # per-eval shape diagnostics (VERDICT round-2 weak #1): opacity /
            # scale distributions and floater extents, one fetch each
            al_np = np.asarray(e_aux.alive)
            if al_np.any():
                op = np.asarray(jax.nn.sigmoid(e_params.opacity[:, 0]))[al_np]
                sc = np.exp(np.asarray(e_params.scaling))[al_np].max(axis=1)
                r = np.linalg.norm(np.asarray(e_params.xyz)[al_np], axis=1)
                log_fn(f"[ITER {iteration}] diag: opacity med {np.median(op):.3f} "
                       f"frac<0.005 {(op < 0.005).mean():.3f} | "
                       f"scale med {np.median(sc):.4f} p99 {np.percentile(sc, 99):.3f} "
                       f"max {sc.max():.2f} | xyz-radius p99 "
                       f"{np.percentile(r, 99):.1f} max {r.max():.1f}")
            # divergence guard (VERDICT round-2 item #5): unattended runs must
            # stop and checkpoint instead of burning hardware on garbage
            ps_now = history["psnr_test"].get(iteration)
            if run_cfg.divergence_psnr_drop > 0 and ps_now is not None:
                if ps_now > best_test_psnr:
                    best_test_psnr = ps_now
                    diverged_evals = 0
                elif ps_now < best_test_psnr - run_cfg.divergence_psnr_drop:
                    diverged_evals += 1
                    log_fn(f"[ITER {iteration}] divergence warning "
                           f"{diverged_evals}/{run_cfg.divergence_patience}: "
                           f"test PSNR {ps_now:.2f} vs best {best_test_psnr:.2f}")
                    if diverged_evals >= run_cfg.divergence_patience:
                        if model_cfg.model_path:
                            save_checkpoint(
                                f"{model_cfg.model_path}/chkpnt{iteration}.npz",
                                params, adam, aux, iteration, active_sh)
                        log_fn(f"[ITER {iteration}] ABORTING: test PSNR "
                               f"{run_cfg.divergence_patience} evals "
                               f">{run_cfg.divergence_psnr_drop} dB below best "
                               f"{best_test_psnr:.2f} — checkpoint saved")
                        history["aborted"] = iteration
                        return params, aux, scene, history
                else:
                    diverged_evals = 0
            if scene.get_test_cameras():
                if tb_writer is not None:
                    tb_writer.add_scalar("total_points",
                                         int(num_alive(e_aux)), iteration)
                    tb_writer.add_histogram(
                        "scene/opacity_histogram",
                        np.asarray(jax.nn.sigmoid(
                            e_params.opacity[np.asarray(e_aux.alive), 0])),
                        iteration)
                if model_cfg.model_path:
                    _dump_val_image(model_cfg.model_path, iteration,
                                    eval_render, e_params, e_aux, scene, bg,
                                    active_sh, render_n=e_rn,
                                    instance_cap=test_cap,
                                    tier_layout=test_layout)

        if iteration in run_cfg.save_iterations and model_cfg.model_path:
            log_fn(f"[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, compact(params, aux))
        if iteration in run_cfg.checkpoint_iterations and model_cfg.model_path:
            log_fn(f"[ITER {iteration}] Saving Checkpoint")
            save_checkpoint(f"{model_cfg.model_path}/chkpnt{iteration}.npz",
                            params, adam, aux, iteration, active_sh)

    return params, aux, scene, history


def _instance_bucket(load: int, n_render: int, raster_cfg: RasterConfig,
                     margin: float = 1.35) -> int:
    """Static stream instance capacity from the measured tile load.

    Half-power-of-two buckets of margin·load (see ``_render_bucket`` for the
    bucket rationale), CHUNK-aligned by construction (≥ 1024), clipped to
    the exact tier-enumeration bound. Unlike the a-priori auto heuristic
    (≈5.7·N), the bucket follows the MEASURED load in both directions —
    early training with large KNN-initialized splats can exceed the
    heuristic (seen as overflow_capacity > 0, answered by re-bucketing
    upward), while dense late-training scenes sit well under it."""
    from ..ops.binning import stream_instance_bound
    bound = stream_instance_bound(n_render,
                                  raster_cfg.max_tiles_per_gaussian,
                                  raster_cfg.tier_budgets,
                                  raster_cfg.tier_fracs)
    target = max(1024, int(load * margin))
    k = max(10, int(math.floor(math.log2(target))))
    for b in (1 << k, (3 << k) >> 1, 1 << (k + 1)):
        if b >= target:
            break
    b = min(b, bound + (-bound) % 128)
    return b


def _render_bucket(n_alive: int, capacity: int, margin: float = 1.2) -> int:
    """Static render-slice length: smallest half-power-of-two (2^k or
    1.5·2^k) ≥ margin·n_alive.

    Geometric buckets bound recompiles to O(log capacity) per run while the
    per-instance stages (sort/pack/scatter) track the live count instead of
    the padded capacity — measured 688 → 230 ms/step at 250K alive in 1M
    capacity (504×378). Half-steps beat plain powers of two by ~27% at the
    midpoints for ~2× the recompile count. 0 disables slicing (= full
    capacity)."""
    target = max(1024, int(n_alive * margin))
    k = max(10, int(math.floor(math.log2(target))))
    for b in (1 << k, (3 << k) >> 1, 1 << (k + 1)):
        if b >= target:
            break
    return 0 if b >= capacity else b


def _pad_tree(tree, new_capacity: int):
    """Zero-pad every [C, ...] leaf of a params-shaped tree to new capacity."""
    def f(leaf):
        pad = new_capacity - leaf.shape[0]
        return jnp.pad(leaf, [(0, pad)] + [(0, 0)] * (leaf.ndim - 1))
    return jax.tree.map(f, tree)


def evaluate_split(eval_metrics, params, aux, cameras, bg, sh_degree,
                   render_n: int = 0, chunk: int = 5, instance_cap: int = 0,
                   tier_layout=None):
    """(mean L1, mean PSNR) over a camera list with few host transfers.

    Each view's render+metrics dispatches asynchronously to device scalars;
    fetching only every ``chunk`` views bounds the number of renders in
    flight — a full-set async burst held ~15 concurrent instance tables and
    OOM'd the grow-mode reference-scale run at eval time — while still
    amortizing the tunneled-device round trip (3 fetches for a 15-view set
    instead of 15)."""
    host = []
    pending = []
    for cam in cameras:
        pending.append(
            eval_metrics(params, aux.alive, cam.view(), cam.device_image(),
                         bg, width=cam.image.shape[2],
                         height=cam.image.shape[1],
                         sh_degree=sh_degree, render_n=render_n,
                         instance_cap=instance_cap, tier_layout=tier_layout))
        if len(pending) >= chunk:
            host.extend(jax.device_get(pending))
            pending = []
    host.extend(jax.device_get(pending))
    return (float(np.mean([v[0] for v in host])),
            float(np.mean([v[1] for v in host])))


def evaluate_psnr(eval_render, params, aux, cameras, bg, sh_degree,
                  render_n: int = 0, instance_cap: int = 0) -> float:
    """Image-space PSNR sweep (kept for callers that need rendered frames;
    the train loop uses :func:`evaluate_split`)."""
    vals = []
    for cam in cameras:
        img = eval_render(params, aux.alive, cam.view(), bg,
                          width=cam.image.shape[2], height=cam.image.shape[1],
                          sh_degree=sh_degree, render_n=render_n,
                          instance_cap=instance_cap)
        gt = jnp.clip(cam.device_image(), 0.0, 1.0)
        vals.append(psnr(img, gt)[0])
    return float(np.mean(jax.device_get(vals)))


def _make_tb_writer(model_path: str):
    """TensorBoard writer via tensorboardX, optional like the reference
    (train.py:25-29, 176-181)."""
    if not model_path:
        return None
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")
        return None


_GUI_RENDER = None


def _gui_pump(model_cfg, params, aux, raster_cfg, sh_degree, iteration,
              max_iterations):
    """Network-viewer pump, once per iteration (train.py:55-68). No-op until
    viewer.network_gui.init() has been called by the CLI."""
    from ..viewer import network_gui
    if network_gui.listener is None:
        return
    global _GUI_RENDER
    if network_gui.conn is None:
        network_gui.try_connect()
    while network_gui.conn is not None:
        try:
            net_image_bytes = None
            (custom_cam, do_training, shs_py, cov_py, keep_alive,
             scaling_modifier) = network_gui.receive()
            if custom_cam is not None:
                from ..ops.render import render as render_fn
                bg = (jnp.ones(3) if model_cfg.white_background else jnp.zeros(3))
                # viewer toggles plumb into the render exactly like the
                # reference (train.py:60 overwrites pipe.convert_SHs_python /
                # pipe.compute_cov3D_python per request)
                rc = raster_cfg
                if rc.backend == "stream" or (rc.backend == "auto"
                                              and jax.default_backend()
                                              == "tpu"):
                    # widened eval budgets need the exact instance bound so
                    # viewer frames can't hit global capacity overflow
                    rc = rc._replace(instance_cap=eval_instance_cap(
                        params.xyz.shape[0], rc))
                out = render_fn(custom_cam.view(), custom_cam.image_width,
                                custom_cam.image_height, params, bg,
                                sh_degree=sh_degree, alive=aux.alive,
                                scale_modifier=scaling_modifier,
                                convert_shs_python=bool(shs_py),
                                compute_cov3d_python=bool(cov_py),
                                raster_config=rc)
                net_image_bytes = network_gui.render_to_bytes(out["render"])
            network_gui.send(net_image_bytes, model_cfg.source_path)
            if do_training and (iteration < max_iterations or not keep_alive):
                break
        except Exception:
            network_gui.conn = None


def _make_progress(first_iter: int, iterations: int):
    """tqdm progress bar, optional like the reference (train.py:52)."""
    try:
        from tqdm import tqdm
        return tqdm(range(first_iter, iterations), desc="Training progress")
    except ImportError:
        return None


def _dump_val_image(model_path, iteration, eval_render, params, aux, scene,
                    bg, sh_degree, render_n: int = 0, instance_cap: int = 0,
                    tier_layout=None):
    """Side-by-side [render | GT] validation PNG (training_report
    train.py:189-208 dumps comparable strips every ~5000 iterations)."""
    try:
        from PIL import Image
        cam = scene.get_test_cameras()[0]
        img = eval_render(params, aux.alive, cam.view(), bg,
                          width=cam.image.shape[2], height=cam.image.shape[1],
                          sh_degree=sh_degree, render_n=render_n,
                          instance_cap=instance_cap, tier_layout=tier_layout)
        side = np.concatenate([np.asarray(img),
                               np.clip(np.asarray(cam.image), 0, 1)], axis=2)
        Image.fromarray((side.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
            f"{model_path}/val_{iteration:05d}.png")
    except Exception as e:
        print(f"val-image dump failed: {e}")
