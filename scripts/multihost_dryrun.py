"""Two-process jax.distributed dryrun on CPU (VERDICT r3 item #2).

Exercises the REAL multi-process code path (SURVEY §5.8) that a TPU pod
would use — jax.distributed.initialize with a localhost coordinator, two
OS processes with 4 virtual CPU devices each, one global 8-device mesh —
and runs ONE tile-sharded train step over it, asserting loss parity with
the identical step executed in a single process. Collectives cross the
process boundary through the gloo CPU backend (the DCN analog; on a real
pod the same program rides ICI/DCN).

Roles (one file, three modes):
  parent (no args)            spawn --single + two --process_id workers,
                              compare losses, write MULTIHOST_DRYRUN.json
  --single                    1-process baseline: same 8-device mesh
  --process_id N --coordinator ADDR   worker in the 2-process run

Run:  python scripts/multihost_dryrun.py [--out MULTIHOST_DRYRUN.json]
Also wired as tests/test_multihost.py (skippable under load).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker_env(n_local: int = 4):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    # scrub any inherited device-count flag, then pin ours
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        f" --xla_force_host_platform_device_count={n_local}"
                        ).strip()
    return env


def run_one_step(expect_processes: int, expect_devices: int):
    """Build the deterministic micro-scene and run ONE tile-sharded train
    step over a mesh spanning every (global) device. Returns float loss."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.process_count() == expect_processes, jax.process_count()
    devs = jax.devices()
    assert len(devs) == expect_devices, devs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from mvs_gaussian_splatting_tpu.models.gaussians import init_from_pcd
    from mvs_gaussian_splatting_tpu.ops.preprocess import CameraView
    from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
    from mvs_gaussian_splatting_tpu.parallel.tile_train import (
        make_tile_train_step)
    from mvs_gaussian_splatting_tpu.train.config import OptimizationConfig
    from mvs_gaussian_splatting_tpu.train.optim import adam_init
    from mvs_gaussian_splatting_tpu.utils import graphics

    W = H = 64
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.6, 0.6, (96, 3)).astype(np.float32) + [0, 0, 4.0]
    params, aux = init_from_pcd(pts, rng.rand(96, 3).astype(np.float32), 128,
                                sh_degree=1)
    adam = adam_init(params)
    gt = jnp.asarray(rng.rand(3, H, W).astype(np.float32)) * 0.5 + 0.25
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.asarray(np.eye(4, dtype=np.float32)),
                     jnp.asarray(P.astype(np.float32)), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))

    mesh = Mesh(np.array(devs), ("tile",))
    cfg = RasterConfig(max_tiles_per_gaussian=16, backend="stream")
    step, place = make_tile_train_step(OptimizationConfig(), cfg, 1.0, mesh,
                                       interpret=True)
    bg = jnp.zeros(3)
    # replicated device_put: every process holds the identical host value,
    # forming one global replicated array (multi-process semantics)
    params, adam, aux, cam, gt, bg = place(params, adam, aux, cam, gt, bg)
    _, _, _, m = step(params, adam, aux, cam, gt, bg, jnp.int32(1),
                      jnp.asarray(True), width=W, height=H, sh_degree=1)
    return float(m.loss)


def main_worker(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mvs_gaussian_splatting_tpu.parallel import multihost
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=2, process_id=args.process_id)
    loss = run_one_step(expect_processes=2, expect_devices=8)
    print(f"WORKER{args.process_id} loss={loss:.10f}", flush=True)
    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"loss": loss}, f)
    jax.distributed.shutdown()


def main_single(args):
    loss = run_one_step(expect_processes=1, expect_devices=8)
    print(f"SINGLE loss={loss:.10f}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"loss": loss}, f)


def main_parent(args):
    with socket.socket() as s:       # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    tmp = args.out + ".tmp"

    def spawn(extra, n_local=4):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + extra,
            env=_worker_env(n_local), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    single = spawn(["--single", "--out", tmp + ".single"], n_local=8)
    sout, _ = single.communicate(timeout=600)
    print(sout)
    assert single.returncode == 0, f"single-process run failed:\n{sout}"
    loss_single = json.load(open(tmp + ".single"))["loss"]

    workers = [spawn(["--process_id", str(i), "--coordinator", coord,
                      "--out", tmp + ".multi"]) for i in range(2)]
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=600)
        outs.append(out)
    print(outs[0])
    print(outs[1])
    assert all(w.returncode == 0 for w in workers), (
        f"worker failed:\n{outs[0]}\n{outs[1]}")
    loss_multi = json.load(open(tmp + ".multi"))["loss"]

    rel = abs(loss_multi - loss_single) / max(abs(loss_single), 1e-12)
    ok = rel < 1e-5
    result = {
        "ok": bool(ok),
        "loss_single_process": loss_single,
        "loss_two_process": loss_multi,
        "rel_diff": rel,
        "config": "2 processes x 4 CPU devices, tile-sharded train step, "
                  "jax.distributed + gloo collectives",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    for suf in (".single", ".multi"):
        try:
            os.remove(tmp + suf)
        except OSError:
            pass
    print(json.dumps(result))
    assert ok, result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MULTIHOST_DRYRUN.json"))
    args = ap.parse_args()
    if args.process_id is not None:
        main_worker(args)
    elif args.single:
        main_single(args)
    else:
        main_parent(args)


if __name__ == "__main__":
    main()
