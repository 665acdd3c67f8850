"""Chunk: the in-flight columnar batch flowing between operators.

Replaces the reference's ValueAccessor + TupleIdSequence pair (storage/
ValueAccessor.hpp:71, TupleIdSequence.hpp:44): a dict of equal-length device columns
keyed by ExprId, plus a live-row bool mask. All arrays share a static capacity; the
live count is a traced scalar — this is what keeps whole plans jit-compilable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from quickstep_tpu.optimizer.logical import OutAttr
from quickstep_tpu.expressions.scalar import EvalContext


@dataclasses.dataclass
class Chunk:
    attrs: List[OutAttr]
    slots: Dict[int, Tuple[object, Optional[object]]]  # expr_id -> (data, valid)
    alive: object                                      # bool[capacity]
    capacity: int
    # static (host-known) upper bound on live rows, when tighter than
    # capacity — lets nested-loops/cross joins compact tiny inputs instead of
    # multiplying padded capacities. None = no bound beyond capacity.
    bound: Optional[int] = None
    # host-side (static, per-plan) metadata for physical decisions:
    ranges: Dict[int, Optional[Tuple[int, int]]] = dataclasses.field(
        default_factory=dict)
    unique_sets: List[frozenset] = dataclasses.field(default_factory=list)
    # per-attr upper bound on duplicate count (heaviest value): sizes the
    # expansion-join K when the attr is a join key. Filters preserve it
    # (still an upper bound); projections propagate for pass-through attrs.
    max_counts: Dict[int, int] = dataclasses.field(default_factory=dict)
    # row-wise functional dependencies (determinant ids -> dependent ids):
    # within any single row, the determinant values fix the dependents. Feeds
    # the ReduceGroupByAttributes optimization (sort by a minimal key cover).
    fds: List[Tuple[frozenset, frozenset]] = dataclasses.field(
        default_factory=list)

    def ctx(self, extra: Optional[dict] = None) -> EvalContext:
        slots = dict(self.slots)
        if extra:
            slots.update(extra)
        return EvalContext(slots)

    def col(self, expr_id: int):
        return self.slots[expr_id]

    def count(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    def broadcast(self, data, valid):
        """Ensure (data, valid) are full-capacity arrays (literals evaluate to
        scalars)."""
        data = jnp.broadcast_to(jnp.asarray(data), (self.capacity,))
        if valid is not None:
            valid = jnp.broadcast_to(jnp.asarray(valid), (self.capacity,))
        return data, valid

    def is_unique(self, ids: List[int]) -> bool:
        s = frozenset(ids)
        return any(u <= s for u in self.unique_sets)

    def fd_closure(self, ids: set) -> set:
        out = set(ids)
        changed = True
        while changed:
            changed = False
            for det, dep in self.fds:
                if det <= out and not dep <= out:
                    out |= dep
                    changed = True
        return out
