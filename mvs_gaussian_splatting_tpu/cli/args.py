"""Argparse wiring for the CLI drivers — the reference's flag surface
(arguments/__init__.py:47-108) mapped onto the typed dataclass configs."""

from __future__ import annotations

import argparse
import dataclasses

from ..train.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                            TrainRunConfig)

_SHORTHAND = {"source_path": "-s", "model_path": "-m", "images": "-i",
              "resolution": "-r", "white_background": "-w"}


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str = ""):
    for f in dataclasses.fields(cls):
        name = "--" + f.name
        flags = [name]
        if f.name in _SHORTHAND:
            flags.append(_SHORTHAND[f.name])
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.type in ("bool", bool):
            parser.add_argument(*flags, action="store_true",
                                default=bool(default))
        elif f.type in ("List[int]", "list"):
            parser.add_argument(*flags, nargs="+", type=int,
                                default=list(f.default_factory()))
        else:
            t = {"int": int, "float": float, "str": str}.get(
                f.type if isinstance(f.type, str) else f.type.__name__, str)
            parser.add_argument(*flags, type=t, default=default)


def extract(cls, args: argparse.Namespace):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items() if k in names})


def build_parser(description: str, *, optimization: bool = True,
                 run: bool = True) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_dataclass_args(parser, ModelConfig)
    add_dataclass_args(parser, PipelineConfig)
    if optimization:
        add_dataclass_args(parser, OptimizationConfig)
    if run:
        add_dataclass_args(parser, TrainRunConfig)
    return parser
