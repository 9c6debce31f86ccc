"""Mesh construction helpers for the sharded engines."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2D mesh: 'dp' = independent messages (data parallel), 'sp' = block
    axis within a message (the sequence-parallel analogue, SURVEY §2.6)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if dp * sp > len(devices):
        raise ValueError(f"need {dp * sp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))
