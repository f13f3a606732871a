"""Decision-tree → SQL transpilation: export a fitted MLlib
DecisionTreeRegressionModel as a pure Catalyst CASE-cascade
expression over the raw feature columns.

Why this is a first-class scale capability: MLlib inference drags the
assembler + model transform through a non-codegen path per batch; a
transpiled tree is a single whole-stage-codegen expression — scoring
100 TB becomes an ordinary projection (pushdown-friendly, usable in
SQL views, streaming selects, and engines that never load MLlib).
The tree is depth-bounded, so the expression is small (2^depth leaf
literals) and driver-resident — the same bounded-artifact rule as the
tokenizer merge lists.

Exactness contract: MLlib continuous splits route `value <= threshold`
and leaves emit constant predictions; the generated SQL uses the
identical comparison on the identical double (repr round-trip through
CAST('…' AS DOUBLE)), so transpiled scores are BIT-EQUAL to
model.transform, verified by the `ml_tree_sql_scoring_parity` query's
oracle-pinned zero-mismatch count.

Scope: continuous (numeric) splits only — categorical features should
be one-hot-encoded upstream (each one-hot slot is a continuous 0/1
split); a raw CategoricalSplit raises rather than mistranslating.
"""

from __future__ import annotations

from collections.abc import Sequence


def _quote_ident(col: str) -> str:
    """Backtick-quote a column identifier for interpolation into
    generated SQL: a feature named `dep delay`, `a.b`, or `order`
    would otherwise produce invalid or misresolving expressions.
    Embedded backticks double, per Spark's quoting rule."""
    return "`" + col.replace("`", "``") + "`"


def tree_to_case_expr(model, feature_cols: Sequence[str]) -> str:
    """Fitted DecisionTreeRegressionModel (or classifier with numeric
    leaf predictions) → a Spark SQL expression string over
    `feature_cols` (the assembler inputs, in assembly order)."""

    def walk(node) -> str:
        cls = node.getClass().getSimpleName()
        if "LeafNode" in cls:
            return f"CAST('{node.prediction()!r}' AS DOUBLE)"
        split = node.split()
        if split.getClass().getSimpleName() != "ContinuousSplit":
            raise NotImplementedError(
                "tree_to_case_expr translates continuous splits only; "
                "one-hot categoricals upstream (see module docstring)"
            )
        col = _quote_ident(feature_cols[split.featureIndex()])
        thr = repr(split.threshold())
        return (
            f"(CASE WHEN {col} <= CAST('{thr}' AS DOUBLE) "
            f"THEN {walk(node.leftChild())} "
            f"ELSE {walk(node.rightChild())} END)"
        )

    return walk(model._call_java("rootNode"))


def count_leaves(model) -> int:
    """Leaf count of a fitted tree (2·splits+1 for binary trees) —
    bounded by 2^maxDepth, the size witness for the transpiled
    expression."""

    def walk(node) -> int:
        if "LeafNode" in node.getClass().getSimpleName():
            return 1
        return walk(node.leftChild()) + walk(node.rightChild())

    return walk(model._call_java("rootNode"))


def forest_to_sql_expr(model, feature_cols: Sequence[str]) -> str:
    """Fitted tree-ensemble regressor → one SQL expression.

    RandomForestRegressionModel averages unweighted member trees;
    GBTRegressionModel sums weight·tree (MLlib evaluates the member
    predictions sequentially, so a left-fold sum in tree order
    reproduces the ensemble's double BIT-EXACTLY — verified by the
    parity query's oracle-pinned zero-mismatch counts for both
    families). The expression stays a bounded artifact:
    n_trees · 2^depth leaf literals."""
    trees = model.trees
    weights = list(model.treeWeights)
    cls = model.__class__.__name__
    if cls.startswith("RandomForest"):
        body = " + ".join(tree_to_case_expr(t, feature_cols) for t in trees)
        return f"(({body}) / CAST({len(trees)} AS DOUBLE))"
    terms = " + ".join(
        f"(CAST('{w!r}' AS DOUBLE) * {tree_to_case_expr(t, feature_cols)})"
        for t, w in zip(trees, weights)
    )
    return f"({terms})"
