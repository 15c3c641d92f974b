"""Codebook compression of a trained Gaussian model (SURVEY §2.20).

The reference vendors an unused VQ quantizer (quantize.py) that BASELINE
config #5 names for attribute compression; here it is a working pipeline:

    python -m mvs_gaussian_splatting_tpu.cli.compress -m <model> \
        [--iteration N] [--num_codes 256] [--attributes f_rest scaling rotation]

writes ``point_cloud/iteration_N/point_cloud_compressed.npz`` — per-attribute
k-means codebooks + int32 codes (uint16-packable), untouched attributes in
f32 — and prints the size ratio. ``--decompress`` reconstructs a standard
``point_cloud_dequant.ply`` renderable by the render CLI / any 3DGS viewer.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from ..models.ply import load_gaussian_ply, save_gaussian_ply
from ..models.quantize import compress_gaussians
from ..utils.system import search_max_iteration


def compress(model_path: str, iteration: int, num_codes: int,
             attributes, sh_degree: int, seed: int = 0) -> str:
    ply = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "point_cloud.ply")
    gaussians = load_gaussian_ply(ply, max_sh_degree=sh_degree)
    out = compress_gaussians(jax.random.PRNGKey(seed), gaussians,
                             num_codes=num_codes,
                             attributes=tuple(attributes))
    arrays = {}
    for attr in out["codes"]:
        err = float(np.mean(np.abs(np.asarray(out["dequantized"][attr])
                                   - np.asarray(gaussians[attr]))))
        print(f"  {attr}: mean |dequant - raw| = {err:.5f}")
    for attr, codes in out["codes"].items():
        dtype = np.uint16 if num_codes <= 65536 else np.int32
        arrays[f"codes/{attr}"] = np.asarray(codes).astype(dtype)
        arrays[f"codebooks/{attr}"] = np.asarray(out["codebooks"][attr],
                                                 np.float32)
        arrays[f"shape/{attr}"] = np.asarray(gaussians[attr].shape, np.int64)
    for k, v in gaussians.items():
        if k not in out["codes"]:
            arrays[f"raw/{k}"] = np.asarray(v, np.float32)
    dst = ply.replace("point_cloud.ply", "point_cloud_compressed.npz")
    np.savez_compressed(dst, **arrays)
    src_sz = os.path.getsize(ply)
    dst_sz = os.path.getsize(dst)
    print(f"{ply} ({src_sz/1e6:.2f} MB) -> {dst} ({dst_sz/1e6:.2f} MB), "
          f"ratio {src_sz/max(dst_sz,1):.2f}x")
    return dst


def decompress(npz_path: str) -> str:
    data = np.load(npz_path)
    gaussians = {}
    for key in data.files:
        kind, _, attr = key.partition("/")
        if kind == "raw":
            gaussians[attr] = data[key]
        elif kind == "codes":
            codebook = data[f"codebooks/{attr}"]
            shape = tuple(data[f"shape/{attr}"])
            gaussians[attr] = codebook[data[key].astype(np.int64)].reshape(
                shape).astype(np.float32)
    dst = npz_path.replace("point_cloud_compressed.npz",
                           "point_cloud_dequant.ply")
    save_gaussian_ply(dst, gaussians)
    print(f"wrote {dst} ({len(gaussians['xyz'])} gaussians)")
    return dst


def main(argv=None):
    parser = argparse.ArgumentParser(description="Codebook compression")
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--num_codes", type=int, default=256)
    parser.add_argument("--attributes", nargs="+",
                        default=["f_rest", "scaling", "rotation"])
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--decompress", action="store_true",
                        help="reconstruct point_cloud_dequant.ply from an "
                             "existing point_cloud_compressed.npz")
    args = parser.parse_args(argv)

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(
            os.path.join(args.model_path, "point_cloud"))
    if args.decompress:
        npz = os.path.join(args.model_path, "point_cloud",
                           f"iteration_{iteration}",
                           "point_cloud_compressed.npz")
        decompress(npz)
    else:
        compress(args.model_path, iteration, args.num_codes,
                 args.attributes, args.sh_degree)


if __name__ == "__main__":
    main(sys.argv[1:])
