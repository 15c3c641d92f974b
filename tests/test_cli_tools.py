"""CLI tooling coverage: full_eval orchestration (reference full_eval.py:15-75),
video error strips (video.py), sphere visualization (visualize.py).

full_eval is tested at the orchestration level — the train/render/metrics
stages it drives are each covered end-to-end elsewhere (test_train_e2e,
test_metrics_driver), so here we verify scene enumeration, per-scene flag
assembly, skip flags, and stage ordering against the reference's behavior.
"""

import os

import numpy as np
import pytest
from PIL import Image

from mvs_gaussian_splatting_tpu.cli import full_eval, video, visualize


class _Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, argv):
        self.calls.append(list(argv))


class TestFullEval:
    def _patch(self, monkeypatch):
        train_rec, render_rec = _Recorder(), _Recorder()
        metrics_rec = _Recorder()
        from mvs_gaussian_splatting_tpu.cli import render as render_cli
        from mvs_gaussian_splatting_tpu.cli import train as train_cli
        from mvs_gaussian_splatting_tpu.eval import metrics as metrics_mod
        monkeypatch.setattr(train_cli, "main", train_rec)
        monkeypatch.setattr(render_cli, "main", render_rec)
        monkeypatch.setattr(metrics_mod, "evaluate", metrics_rec)
        return train_rec, render_rec, metrics_rec

    def test_standard_13_scene_matrix(self, monkeypatch, tmp_path):
        train_rec, render_rec, metrics_rec = self._patch(monkeypatch)
        full_eval.main(["--output_path", str(tmp_path / "eval"),
                        "--mipnerf360", "/data/m360",
                        "--tanksandtemples", "/data/tat",
                        "--deepblending", "/data/db"])
        # 9 MipNeRF-360 + 2 T&T + 2 DB = 13 scenes (full_eval.py:15-18)
        assert len(train_rec.calls) == 13
        assert len(render_rec.calls) == 13
        # outdoor scenes at images_4, indoor at images_2 (full_eval.py:41-46)
        by_scene = {c[c.index("-s") + 1]: c for c in train_rec.calls}
        assert by_scene["/data/m360/bicycle"][
            by_scene["/data/m360/bicycle"].index("-i") + 1] == "images_4"
        assert by_scene["/data/m360/room"][
            by_scene["/data/m360/room"].index("-i") + 1] == "images_2"
        assert by_scene["/data/tat/truck"][
            by_scene["/data/tat/truck"].index("-i") + 1] == "images"
        for c in train_rec.calls:
            assert "--eval" in c
        # metrics called once over all model paths
        assert len(metrics_rec.calls) == 1
        assert len(metrics_rec.calls[0]) == 13

    def test_skip_flags(self, monkeypatch, tmp_path):
        train_rec, render_rec, metrics_rec = self._patch(monkeypatch)
        full_eval.main(["--output_path", str(tmp_path),
                        "--tanksandtemples", "/data/tat",
                        "--skip_training", "--skip_metrics"])
        assert train_rec.calls == []
        assert len(render_rec.calls) == 2
        assert metrics_rec.calls == []

    def test_no_datasets_errors(self):
        with pytest.raises(SystemExit):
            full_eval.main(["--output_path", "/tmp/x"])


class TestVideoStrips:
    def test_strips_written(self, tmp_path):
        base = tmp_path / "model" / "test" / "ours_30" / "renders"
        gts = tmp_path / "model" / "test" / "ours_30" / "gt"
        os.makedirs(base); os.makedirs(gts)
        rng = np.random.RandomState(0)
        for i in range(2):
            r = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
            g = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
            Image.fromarray(r).save(base / f"{i:05d}.png")
            Image.fromarray(g).save(gts / f"{i:05d}.png")
        video.main(["-m", str(tmp_path / "model"), "--iteration", "30"])
        out = tmp_path / "model" / "test" / "ours_30" / "strips"
        files = sorted(os.listdir(out))
        assert files == ["00000.png", "00001.png"]
        strip = np.asarray(Image.open(out / files[0]))
        # [render | gt | heatmap]: 3× the width
        assert strip.shape == (16, 72, 3)
        np.testing.assert_array_equal(
            strip[:, :24], np.asarray(Image.open(base / files[0])))

    def test_latest_iteration_picked(self, tmp_path):
        for it in (5, 40):
            d = tmp_path / "m" / "test" / f"ours_{it}"
            os.makedirs(d / "renders"); os.makedirs(d / "gt")
        arr = np.zeros((8, 8, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / "m/test/ours_40/renders/a.png")
        Image.fromarray(arr).save(tmp_path / "m/test/ours_40/gt/a.png")
        video.main(["-m", str(tmp_path / "m")])
        assert os.path.exists(tmp_path / "m/test/ours_40/strips/a.png")


class TestVisualize:
    def test_sphere_plot(self, tmp_path):
        out = str(tmp_path / "sphere.png")
        visualize.main(["--num_dirs", "64", "--out", out])
        assert os.path.getsize(out) > 0

    def test_points_file(self, tmp_path):
        pts = np.random.RandomState(0).randn(10, 3)
        np.savetxt(tmp_path / "points.txt", pts)
        out = str(tmp_path / "p.png")
        visualize.main(["--points", str(tmp_path / "points.txt"),
                        "--out", out])
        assert os.path.getsize(out) > 0


def test_render_cli_eval_raster_config_generous_budgets():
    """Offline render must not clip large splats: the eval raster config
    upgrades tight training budgets (6.7 dB measured on runs/cleanscale)."""
    from mvs_gaussian_splatting_tpu.cli.render import eval_raster_config
    from mvs_gaussian_splatting_tpu.train.config import PipelineConfig

    cfg = eval_raster_config(PipelineConfig())
    assert cfg.fast_math is False
    assert cfg.max_tiles_per_gaussian >= 512
    assert len(cfg.tier_budgets) >= 3
    # explicit user request for an even larger budget is respected
    cfg2 = eval_raster_config(PipelineConfig(max_tiles_per_gaussian=1024))
    assert cfg2.max_tiles_per_gaussian == 1024
