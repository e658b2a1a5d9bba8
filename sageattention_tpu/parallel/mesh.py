"""Mesh helpers and axis-name conventions.

The reference has no internal distributed runtime — it delegates to xDiT
(NCCL) and exposes only the ``return_lse`` hook (SURVEY.md §2.3).  Here the
sequence-parallel layer is first-class: a named mesh over ICI with

  - "dp": data / CFG-batch parallel (xDiT ``use_cfg_parallel``)
  - "sp": sequence (context) parallel — ring attention (xDiT ring degree)
  - "tp": head/tensor parallel (xDiT ulysses degree co-located)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP, SP, TP = "dp", "sp", "tp"


def make_mesh(dp: int = 1, sp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, sp, tp) mesh; ``sp`` defaults to all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp is None:
        assert n % (dp * tp) == 0, (n, dp, tp)
        sp = n // (dp * tp)
    assert dp * sp * tp == n, f"mesh {dp}x{sp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=(DP, SP, TP))


def head_sharded(mesh: Mesh, layout: str = "HND") -> NamedSharding:
    """Shard attention heads over tp (batch over dp)."""
    if layout == "HND":
        return NamedSharding(mesh, P(DP, TP, None, None))
    return NamedSharding(mesh, P(DP, None, TP, None))


def seq_sharded(mesh: Mesh, layout: str = "HND") -> NamedSharding:
    """Shard the sequence over sp (batch over dp, heads over tp)."""
    if layout == "HND":
        return NamedSharding(mesh, P(DP, TP, SP, None))
    return NamedSharding(mesh, P(DP, SP, TP, None))
