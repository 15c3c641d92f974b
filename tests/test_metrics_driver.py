"""Metrics driver (eval/metrics.py) — directory walk, aggregation, JSON
artifacts, and the reference's swallow-per-scene-failure behavior
(metrics.py:36-93)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from mvs_gaussian_splatting_tpu.eval.metrics import evaluate


def _write_pair(model_path, method="ours_30000", n=3, noise=0.0, seed=0):
    rd = os.path.join(model_path, "test", method, "renders")
    gd = os.path.join(model_path, "test", method, "gt")
    os.makedirs(rd, exist_ok=True)
    os.makedirs(gd, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        gt = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        render = np.clip(gt.astype(np.int32)
                         + (noise * rng.randn(32, 48, 3)).astype(np.int32),
                         0, 255).astype(np.uint8)
        Image.fromarray(gt).save(os.path.join(gd, f"{i:05d}.png"))
        Image.fromarray(render).save(os.path.join(rd, f"{i:05d}.png"))


def test_evaluate_writes_results_and_per_view(tmp_path):
    model = str(tmp_path / "scene")
    _write_pair(model, n=3, noise=0.0)
    report = evaluate([model])

    res = json.load(open(os.path.join(model, "results.json")))
    pv = json.load(open(os.path.join(model, "per_view.json")))
    agg = res["ours_30000"]
    # identical pairs: SSIM 1, PSNR inf-or-huge
    assert agg["SSIM"] == pytest.approx(1.0, abs=1e-5)
    assert agg["PSNR"] > 60
    assert len(pv["ours_30000"]["PSNR"]) == 3
    assert report[model] == res


def test_noisy_pair_scores_lower(tmp_path):
    clean = str(tmp_path / "clean")
    noisy = str(tmp_path / "noisy")
    _write_pair(clean, n=2, noise=0.0)
    _write_pair(noisy, n=2, noise=25.0)
    evaluate([clean, noisy])
    rc = json.load(open(os.path.join(clean, "results.json")))["ours_30000"]
    rn = json.load(open(os.path.join(noisy, "results.json")))["ours_30000"]
    assert rn["PSNR"] < rc["PSNR"]
    assert rn["SSIM"] < rc["SSIM"]


def test_broken_scene_swallowed(tmp_path, capsys):
    ok = str(tmp_path / "ok")
    broken = str(tmp_path / "broken")   # no test/ dir at all
    _write_pair(ok, n=1)
    os.makedirs(broken, exist_ok=True)
    report = evaluate([broken, ok])
    out = capsys.readouterr().out
    assert "Unable to compute metrics" in out
    assert ok in report and broken not in report
    assert os.path.exists(os.path.join(ok, "results.json"))
