"""Full evaluation harness over the standard benchmark scenes.

Replaces full_eval.py (:15-75): train → render → metrics over MipNeRF-360
(×9, at images_4/images_2), Tanks&Temples (×2) and Deep Blending (×2),
driven in-process instead of os.system shell-outs.
"""

from __future__ import annotations

import argparse
import os
import sys

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]


def main(argv=None):
    parser = argparse.ArgumentParser(description="Full evaluation script")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", default="")
    parser.add_argument("--tanksandtemples", "-tat", default="")
    parser.add_argument("--deepblending", "-db", default="")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--scenes", nargs="*", default=[],
                        help="explicit COLMAP scene dirs (appended to any "
                             "dataset-root scenes; images dir 'images')")
    parser.add_argument("--iterations", type=int, default=30_000,
                        help="training iterations per scene (the reference "
                             "recipe is 30K; short runs exercise the full "
                             "chain on hardware)")
    args = parser.parse_args(argv)

    scenes = []
    if args.mipnerf360:
        for s in MIPNERF360_OUTDOOR:
            scenes.append((os.path.join(args.mipnerf360, s), "images_4"))
        for s in MIPNERF360_INDOOR:
            scenes.append((os.path.join(args.mipnerf360, s), "images_2"))
    if args.tanksandtemples:
        for s in TANKS_AND_TEMPLES:
            scenes.append((os.path.join(args.tanksandtemples, s), "images"))
    if args.deepblending:
        for s in DEEP_BLENDING:
            scenes.append((os.path.join(args.deepblending, s), "images"))
    for s in args.scenes:
        scenes.append((s, "images"))
    if not scenes:
        parser.error("no dataset roots given")

    from . import render as render_cli
    from . import train as train_cli
    from ..eval import metrics as metrics_mod

    model_paths = []
    for source, images in scenes:
        name = os.path.basename(source)
        model_path = os.path.join(args.output_path, name)
        model_paths.append(model_path)
        common = ["-s", source, "-m", model_path, "-i", images, "--eval"]
        if not args.skip_training:
            it = args.iterations
            mid = min(7000, max(1, it // 2))
            train_cli.main(common + ["--iterations", str(it),
                                     "--test_iterations", str(mid), str(it),
                                     "--save_iterations", str(mid), str(it)])
        if not args.skip_rendering:
            render_cli.main(["-m", model_path, "--skip_train"])
    if not args.skip_metrics:
        metrics_mod.evaluate(model_paths)


if __name__ == "__main__":
    main(sys.argv[1:])
