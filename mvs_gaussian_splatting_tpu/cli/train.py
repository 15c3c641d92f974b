"""Training CLI — the equivalent of the reference's train.py.

Usage: python -m mvs_gaussian_splatting_tpu.cli.train -s <scene> -m <out> [...]
"""

from __future__ import annotations

import sys

from ..train.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                            TrainRunConfig)
from ..train.loop import train
from ..utils.system import seed_everything
from .args import build_parser, extract


def main(argv=None):
    parser = build_parser("Training script parameters")
    parser.add_argument("--ip", type=str, default="")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of iterations "
                             "100-120 into this directory")
    args = parser.parse_args(argv)
    model_cfg = extract(ModelConfig, args)
    opt_cfg = extract(OptimizationConfig, args)
    pipe_cfg = extract(PipelineConfig, args)
    run_cfg = extract(TrainRunConfig, args)
    if model_cfg.model_path == "":
        import uuid
        model_cfg.model_path = f"./output/{str(uuid.uuid4())[:10]}"
    print(f"Optimizing {model_cfg.model_path}")
    seed_everything(run_cfg.seed)
    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)
    if args.ip:
        from ..viewer import network_gui
        network_gui.init(args.ip, args.port)
    if args.profile_dir:
        from ..train import loop as loop_mod
        loop_mod.PROFILE_DIR = args.profile_dir
    train(model_cfg, opt_cfg, pipe_cfg, run_cfg)
    print("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
