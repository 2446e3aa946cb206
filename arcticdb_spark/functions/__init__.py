"""User-facing scalar function surface (reference SURVEY §2.10: the whole
scalar surface is the expression AST — arithmetic, abs/neg, comparisons,
boolean combinators, isin/isnotin, isnull/notnull, regex_match, where).

Import from here for reference-style pipelines::

    from arcticdb_spark.functions import col, where
    q = q[where(col("x") > 0, col("y"), -col("y")) > 1]
"""

from arcticdb_spark.expr import (ColumnRef, Constant, ExpressionError,
                                 ExpressionNode, where)
from arcticdb_spark.query import col

__all__ = ["col", "where", "ColumnRef", "Constant", "ExpressionNode",
           "ExpressionError"]
