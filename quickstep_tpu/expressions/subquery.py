"""Scalar subquery expression node.

An uncorrelated scalar subquery (reference SubqueryExpression,
query_optimizer/expressions/SubqueryExpression.hpp) evaluated once per query: the
executor runs `plan` first (shared-subplan cached) and binds its single value into the
EvalContext under this node's slot key.
"""

from __future__ import annotations

import dataclasses

from quickstep_tpu.expressions.scalar import Expr, ValuePair, EvalContext


@dataclasses.dataclass
class SubqueryScalar(Expr):
    plan: object = None   # logical/physical plan node

    def eval(self, ctx: EvalContext) -> ValuePair:
        # The executor pre-binds the subquery's result under key ("subquery", id(plan)).
        return ctx.slots[("subquery", id(self.plan))]

    def children(self):
        return []

    def key(self):
        return ("subquery", id(self.plan))
