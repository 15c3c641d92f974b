"""Eval-exactness invariant: no eval surface may composite in fast mode.

fast_math is a train-time speed/accuracy trade (~1e-3 pixel error); reported
metrics and user-visible images must always use exact compositing. The
invariant lives in exactly two functions — train.loop.eval_config (in-loop
eval sweeps, val-image dumps, viewer frames) and cli.render.eval_raster_config
(offline render → metrics, full_eval) — and this module locks both, plus an
integration check that a fast_math training run only ever hands exact configs
to its eval/viewer surfaces.
"""

from mvs_gaussian_splatting_tpu.cli.render import eval_raster_config
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.train import (ModelConfig, OptimizationConfig,
                                              PipelineConfig)
from mvs_gaussian_splatting_tpu.train.config import TrainRunConfig
from mvs_gaussian_splatting_tpu.train import loop as loop_mod
from mvs_gaussian_splatting_tpu.data.scene import Scene

from test_train_e2e import make_synthetic_scene


class TestEvalConfigHelpers:
    def test_loop_eval_config_forces_exact(self):
        fast = RasterConfig(backend="stream", fast_math=True)
        assert loop_mod.eval_config(fast).fast_math is False

    def test_loop_eval_config_widens_budgets(self):
        """Round 5: the in-loop eval surface must use the same generous
        full-footprint budgets as cli/render — evaluating with train-time
        tight budgets made the loop a different render operator from the
        offline chain (0.34 dB skew on runs/specadapt)."""
        fast = RasterConfig(backend="stream", fast_math=True, tile_w=32,
                            tile_h=16, tier_budgets=(8,), tier_fracs=(0.5,))
        got = loop_mod.eval_config(fast)
        assert got.fast_math is False
        assert got.max_tiles_per_gaussian >= 512
        assert got.tile_w == 32 and got.tile_h == 16
        assert got.backend == fast.backend

    def test_loop_and_cli_eval_budgets_agree(self):
        """The two eval surfaces widen identically (shared
        ops.rasterize.widen_eval_budgets) — a budget divergence would
        reintroduce the loop-vs-offline skew."""
        pipe = PipelineConfig(backend="stream", tier_budgets=(4, 12),
                              tier_fracs=(0.25, 0.1))
        cli_cfg = eval_raster_config(pipe)
        loop_cfg = loop_mod.eval_config(
            loop_mod.raster_config_from_pipe(pipe))
        assert cli_cfg.tier_budgets == loop_cfg.tier_budgets
        assert cli_cfg.tier_fracs == loop_cfg.tier_fracs
        assert (cli_cfg.max_tiles_per_gaussian
                == loop_cfg.max_tiles_per_gaussian)

    def test_cli_eval_raster_config_forces_exact(self):
        pipe = PipelineConfig(backend="stream", fast_math=True)
        assert eval_raster_config(pipe).fast_math is False

    def test_cli_flat_budget_not_downgraded(self):
        """() is the FLAT layout — every Gaussian gets the full
        max_tiles_per_gaussian budget, the most generous setting. The 3-tier
        override must not replace it (ADVICE round 3)."""
        pipe = PipelineConfig(backend="stream", tier_budgets=(),
                              tier_fracs=(), max_tiles_per_gaussian=512)
        cfg = eval_raster_config(pipe)
        assert cfg.tier_budgets == ()
        assert cfg.max_tiles_per_gaussian == 512

    def test_cli_tight_tiers_widened(self):
        pipe = PipelineConfig(backend="stream", tier_budgets=(4, 12),
                              tier_fracs=(0.25, 0.1))
        cfg = eval_raster_config(pipe)
        assert len(cfg.tier_budgets) >= 3
        assert cfg.max_tiles_per_gaussian >= 512

    def test_cli_generous_user_tiers_kept(self):
        pipe = PipelineConfig(backend="stream", tier_budgets=(8, 64, 512),
                              tier_fracs=(0.5, 0.2, 0.05),
                              max_tiles_per_gaussian=1024)
        cfg = eval_raster_config(pipe)
        assert cfg.tier_budgets == (8, 64, 512)
        assert cfg.max_tiles_per_gaussian == 1024


class TestTrainLoopNeverEvalsFast:
    def test_fast_train_run_hands_exact_cfgs_to_eval_surfaces(self, monkeypatch):
        """Run a tiny fast_math training and capture every RasterConfig the
        loop hands to an eval surface (eval renders, eval metrics, the viewer
        pump). All must be exact, while the train step itself stays fast."""
        captured = {"eval_render": [], "eval_metrics": [], "gui": [],
                    "train": []}

        real_mer = loop_mod.make_eval_render
        real_mem = loop_mod.make_eval_metrics
        real_mts = loop_mod.make_train_step
        real_gui = loop_mod._gui_pump

        monkeypatch.setattr(loop_mod, "make_eval_render",
                            lambda cfg: (captured["eval_render"].append(cfg),
                                         real_mer(cfg))[1])
        monkeypatch.setattr(loop_mod, "make_eval_metrics",
                            lambda cfg: (captured["eval_metrics"].append(cfg),
                                         real_mem(cfg))[1])
        monkeypatch.setattr(loop_mod, "make_train_step",
                            lambda opt, cfg, s: (captured["train"].append(cfg),
                                                 real_mts(opt, cfg, s))[1])
        monkeypatch.setattr(
            loop_mod, "_gui_pump",
            lambda mc, p, a, cfg, *rest: captured["gui"].append(cfg))

        scene_info = make_synthetic_scene(n_views=3, n_gauss=20, seed=7)
        model_cfg = ModelConfig(sh_degree=1, model_path="")
        opt_cfg = OptimizationConfig(iterations=8, densify_from_iter=100,
                                     densify_until_iter=0,
                                     position_lr_max_steps=8)
        # fast_math ON — the configuration under test
        pipe_cfg = PipelineConfig(backend="jnp", fast_math=True,
                                  tile_capacity=128,
                                  max_tiles_per_gaussian=16, tile_batch=16)
        run_cfg = TrainRunConfig(test_iterations=[8], save_iterations=[],
                                 checkpoint_iterations=[], log_every=100)
        scene = Scene(model_cfg, scene_info=scene_info)
        loop_mod.train(model_cfg, opt_cfg, pipe_cfg, run_cfg, scene=scene,
                       log_fn=lambda *_: None)

        assert captured["train"] and all(c.fast_math for c in captured["train"]), \
            "train step should keep the user's fast_math=True"
        for surface in ("eval_render", "eval_metrics", "gui"):
            assert captured[surface], f"{surface} never constructed"
            assert all(c.fast_math is False for c in captured[surface]), \
                f"{surface} saw a fast_math config"
