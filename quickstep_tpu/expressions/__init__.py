from quickstep_tpu.expressions.scalar import (  # noqa: F401
    Expr, Attr, Lit, Arith, Cmp, Logical, Not, IsNull, Case, Cast,
    ExtractDate, InSet, DictBitmapProbe, Substr, EvalContext, TRUE_PRED,
)
from quickstep_tpu.expressions.aggregate import AggregateSpec, AGG_FUNCTIONS  # noqa: F401
