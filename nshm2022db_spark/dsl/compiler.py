"""Compile a DSL expression tree to Spark Column expressions.

The reference compiles to a SQL string: one
``SUM(CASE WHEN parent_fault.name = ? THEN 1 ELSE 0 END) > 0`` HAVING term
per atom plus ordered bind parameters (query.py:261-293). Here each atom
becomes a ``bool_or(name_col == lit(atom))`` aggregate column and the
boolean structure becomes plain ``& | ~`` over those columns — Catalyst
folds it all into one hash-aggregate, no string splicing, no bind ordering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nshm2022db_spark.dsl.parser import And, Expr, Name, Not, Or


def atom_names(tree: Expr) -> list[str]:
    """Distinct atom names in first-appearance (in-order) order — mirrors
    the reference's in-order bind-parameter traversal (query.py:277-293)."""
    out: list[str] = []

    def walk(node: Expr) -> None:
        if isinstance(node, Name):
            if node.value not in out:
                out.append(node.value)
        elif isinstance(node, Not):
            walk(node.operand)
        else:
            walk(node.left)
            walk(node.right)

    walk(tree)
    return out


def membership_aggs(tree: Expr, name_col: Column) -> dict[str, Column]:
    """One membership aggregate per distinct atom: ``bool_or(name == atom)``
    aliased ``__m{i}`` (A2 in SURVEY §2.4). Evaluated inside the groupBy."""
    return {
        atom: F.bool_or(name_col == F.lit(atom)).alias(f"__m{i}")
        for i, atom in enumerate(atom_names(tree))
    }


def compile_predicate(tree: Expr, flag: dict[str, Column]) -> Column:
    """Fold the tree into one boolean Column over the membership flags.

    ``flag`` maps atom name → the (post-agg) flag column. Compound NOT is
    fully supported (documented deviation from query.py:267-270).
    """
    if isinstance(tree, Name):
        return flag[tree.value]
    if isinstance(tree, Not):
        return ~compile_predicate(tree.operand, flag)
    if isinstance(tree, And):
        return compile_predicate(tree.left, flag) & compile_predicate(tree.right, flag)
    if isinstance(tree, Or):
        return compile_predicate(tree.left, flag) | compile_predicate(tree.right, flag)
    raise TypeError(f"Unknown expression node: {tree!r}")


def compile_to_sql_predicate(tree: Expr, flag_names: dict[str, str]) -> str:
    """Render the same boolean over named flag columns as ANSI SQL text —
    used only to build the DuckDB oracle for correctness checks."""
    if isinstance(tree, Name):
        return flag_names[tree.value]
    if isinstance(tree, Not):
        return f"(NOT {compile_to_sql_predicate(tree.operand, flag_names)})"
    if isinstance(tree, And):
        return (
            f"({compile_to_sql_predicate(tree.left, flag_names)} AND "
            f"{compile_to_sql_predicate(tree.right, flag_names)})"
        )
    if isinstance(tree, Or):
        return (
            f"({compile_to_sql_predicate(tree.left, flag_names)} OR "
            f"{compile_to_sql_predicate(tree.right, flag_names)})"
        )
    raise TypeError(f"Unknown expression node: {tree!r}")
