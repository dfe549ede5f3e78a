"""Vector/embedding column functions: cosine similarity, deterministic
random-hyperplane LSH buckets.

Cosine runs JVM-side via zip_with/aggregate (no Python). The LSH hyperplanes
are pseudo-random but fully deterministic closed forms (sin(j*8191 + i*127))
so the DuckDB oracle can evaluate the identical expression.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_component(plane: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient."""
    return math.sin(plane * 8191.0 + i * 127.0)


def lsh_bucket(a: Column, dim: int, n_planes: int) -> Column:
    """Sign-of-dot-product bucket over ``n_planes`` deterministic hyperplanes.
    Bucket id = sum_j sign_j * 2^j; a coarse ANN pre-filter: only vectors in
    the same bucket are compared exactly (the 100 TB path — the cross join is
    the small-scale oracle)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        d = F.lit(0.0)
        for i in range(dim):
            d = d + F.element_at(a, i + 1).cast("double") * F.lit(hyperplane_component(j, i))
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_sql(list_expr: str, dim: int, n_planes: int) -> str:
    parts = []
    for j in range(n_planes):
        d = " + ".join(
            f"CAST({list_expr}[{i + 1}] AS DOUBLE) * ({hyperplane_component(j, i)!r})"
            for i in range(dim)
        )
        parts.append(f"(CASE WHEN ({d}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"
