"""Sequence / head / data parallel layer (in-repo equivalent of the xDiT
integration the reference delegates to — SURVEY.md §2.3)."""

from .mesh import make_mesh, head_sharded, seq_sharded, DP, SP, TP
from .ring import ring_sageattn
from .ulysses import ulysses_sageattn

__all__ = ["make_mesh", "head_sharded", "seq_sharded", "DP", "SP", "TP",
           "ring_sageattn", "ulysses_sageattn"]
