"""Full training checkpoints (params + Adam moments + stats + step).

Replaces torch.save((gaussians.capture(), iteration), chkpntN.pth)
(train.py:147-159, gaussian_model.py:84-149). Unlike the reference — whose
grow-mode capture() drops optimizer state and whose restore() can't unpack it
(SURVEY §5.4) — every configuration round-trips completely here.

Format: one .npz of flattened arrays + a JSON manifest of tree structure.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianAux, GaussianParams
from .optim import AdamState

_PARAM_FIELDS = GaussianParams._fields
_AUX_FIELDS = GaussianAux._fields


def _pack(prefix: str, tree, out: dict) -> None:
    for name, arr in zip(tree._fields, tree):
        if arr is not None:
            out[f"{prefix}.{name}"] = np.asarray(arr)


def save_checkpoint(path: str, params: GaussianParams, adam: AdamState,
                    aux: GaussianAux, iteration: int, active_sh_degree: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: dict = {}
    _pack("params", params, arrays)
    _pack("mu", adam.mu, arrays)
    _pack("nu", adam.nu, arrays)
    _pack("aux", aux, arrays)
    arrays["adam.count"] = np.asarray(adam.count)
    meta = {"iteration": iteration, "active_sh_degree": active_sh_degree,
            "capacity": int(params.xyz.shape[0])}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def _unpack(prefix: str, cls, data) -> tuple:
    vals = []
    for name in cls._fields:
        key = f"{prefix}.{name}"
        vals.append(jnp.asarray(data[key]) if key in data else None)
    return cls(*vals)


def load_checkpoint(path: str) -> Tuple[GaussianParams, AdamState, GaussianAux,
                                        int, int]:
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        params = _unpack("params", GaussianParams, data)
        mu = _unpack("mu", GaussianParams, data)
        nu = _unpack("nu", GaussianParams, data)
        aux = _unpack("aux", GaussianAux, data)
        adam = AdamState(count=jnp.asarray(data["adam.count"]), mu=mu, nu=nu)
    return params, adam, aux, meta["iteration"], meta["active_sh_degree"]
