"""Offline metrics over rendered/gt image pairs — the reference's metrics.py.

Walks <model>/test/ours_<iter>/{renders,gt}, computes SSIM/PSNR (and LPIPS
when a backend is available), writes results.json + per_view.json
(metrics.py:36-93). LPIPS requires pretrained VGG/Alex weights; in a
zero-egress environment it degrades gracefully to null with a note.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..utils.losses import psnr, ssim


def read_image(path: str) -> jnp.ndarray:
    arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return jnp.asarray(arr.transpose(2, 0, 1))


def lpips_fn():
    """Returns an LPIPS callable or None if weights are unavailable."""
    try:
        from .lpips import LPIPS
        return LPIPS()
    except Exception:
        return None


def evaluate_dir(renders_dir: str, gt_dir: str):
    names = sorted(os.listdir(renders_dir))
    lp = lpips_fn()
    per_view: Dict[str, Dict[str, Optional[float]]] = {}
    for name in names:
        img = read_image(os.path.join(renders_dir, name))
        gt = read_image(os.path.join(gt_dir, name))
        per_view[name] = {
            "SSIM": float(ssim(img, gt)),
            "PSNR": float(psnr(img, gt)[0]),
            "LPIPS": float(lp(img, gt)) if lp is not None else None,
        }
    return per_view


def evaluate(model_paths: List[str], split: str = "test") -> dict:
    full_report = {}
    for model_path in model_paths:
        print(f"Scene: {model_path}")
        results = {}
        per_view_all = {}
        test_dir = os.path.join(model_path, split)
        try:
            for method in os.listdir(test_dir):
                renders_dir = os.path.join(test_dir, method, "renders")
                gt_dir = os.path.join(test_dir, method, "gt")
                per_view = evaluate_dir(renders_dir, gt_dir)
                agg = {}
                for key in ("SSIM", "PSNR", "LPIPS"):
                    vals = [v[key] for v in per_view.values() if v[key] is not None]
                    agg[key] = float(np.mean(vals)) if vals else None
                print(f"  {method}: SSIM {agg['SSIM']} PSNR {agg['PSNR']} "
                      f"LPIPS {agg['LPIPS']}")
                results[method] = agg
                per_view_all[method] = {
                    key: {n: v[key] for n, v in per_view.items()}
                    for key in ("SSIM", "PSNR", "LPIPS")}
            with open(os.path.join(model_path, "results.json"), "w") as f:
                json.dump(results, f, indent=2)
            with open(os.path.join(model_path, "per_view.json"), "w") as f:
                json.dump(per_view_all, f, indent=2)
            full_report[model_path] = results
        except Exception as e:
            # reference behavior: swallow per-scene failures (metrics.py:92-93)
            print(f"Unable to compute metrics for model {model_path}: {e}")
    return full_report


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="Metrics script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    args = parser.parse_args(argv)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
