"""Kernel functions over array<float> embedding columns (SURVEY.md A3-A6).

The reference evaluates K(x,y) row-pair-at-a-time in C++
[psvm:kernel.cc — linear, polynomial, Gaussian/RBF, Laplacian; see
SURVEY.md section 2.1, line citations unavailable per section 0.1].
Here each kernel is a Catalyst column expression built from higher-order
array functions — whole-stage-codegen'd JVM execution, no Python in the
hot path, usable inside any join/aggregate.

All arithmetic is double: float*float promoted to double is exact
(24-bit mantissas), and the sequential left-fold of F.aggregate matches
DuckDB's list_aggregate('sum') ordering for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """<a, b> in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_l2(a: Column, b: Column) -> Column:
    """||a - b||^2 in double precision."""
    # (x-y)*(x-y), not pow(x-y, 2): Math.pow / libm pow are only ~1-ulp
    # accurate and disagree between engines; plain multiply is IEEE-exact.
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l1(a: Column, b: Column) -> Column:
    """||a - b||_1 in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """||a||_2 in double precision."""
    return F.sqrt(dot(a, a))


def linear_kernel(a: Column, b: Column) -> Column:
    return dot(a, b)


def poly_kernel(a: Column, b: Column, gamma: float, coef: float, degree: int) -> Column:
    return (F.lit(gamma) * dot(a, b) + F.lit(coef)) ** F.lit(degree).cast("double")


def rbf_kernel(a: Column, b: Column, gamma: float) -> Column:
    return F.exp(-F.lit(gamma) * sq_l2(a, b))


def laplacian_kernel(a: Column, b: Column, gamma: float) -> Column:
    return F.exp(-F.lit(gamma) * l1(a, b))


# ---------------------------------------------------------------------------
# DuckDB oracle twins.  list_dot_product computes in FLOAT — never use it;
# these expand through list_zip with explicit double casts so the oracle
# arithmetic matches Spark's bit for bit (same sequential fold order).


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )


def sql_sq_l2(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        f" * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')"
    )


def sql_l1(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')"
    )
