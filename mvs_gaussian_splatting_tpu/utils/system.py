"""Host-side helpers: output dirs, RNG seeding, checkpoint discovery.

Replaces utils/system_utils.py (mkdir_p :16-20, searchForMaxIteration :26-28)
and the seeding part of general_utils.safe_state :112-133 — timestamped stdout
wrapping is dropped in favor of plain logging; device pinning is a no-op under
JAX (placement is explicit via shardings).
"""

from __future__ import annotations

import errno
import os
import random

import numpy as np


def mkdir_p(path: str) -> None:
    try:
        os.makedirs(path)
    except OSError as exc:
        if exc.errno == errno.EEXIST and os.path.isdir(path):
            pass
        else:
            raise


def search_max_iteration(folder: str) -> int:
    """Largest N among entries named like 'iteration_N' in ``folder``."""
    saved = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved)


def seed_everything(seed: int = 0) -> None:
    """Seed host RNGs; JAX randomness is via explicit PRNG keys in the loop."""
    random.seed(seed)
    np.random.seed(seed)
