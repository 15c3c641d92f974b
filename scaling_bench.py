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
    import jax
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
    print(json.dumps({
        "metric": "weak_scaling_batched_step",
        "results": results,
        "note": ("efficiency is meaningful on real multi-chip hardware only; "
                 "virtual host-platform devices share one CPU and weak-scale "
                 "at ~1/n by construction"),
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
