"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — one narrow pass over the corpus with a
broadcast query vector (no shuffle until the final top-k, which is
TakeOrderedAndProject — no global sort materialized). Scale path: LSH
bucketing by random-hyperplane signs — candidate set shrinks ~2^planes, the
buckets are an equi-join key, and the same top-k runs inside the bucket.

Vector math uses builtin higher-order functions (zip_with/aggregate) over
arrays cast to double — JVM-side, no Python. For very wide vectors a Pandas
UDF over Arrow batches (numpy dot) wins; see ``cosine_topk_pandas``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query is a column literal (broadcast to every task inside the plan);
    the scan stays a single narrow stage ending in TakeOrderedAndProject.
    Ties break on id for determinism; similarity rounded to 4 decimals in the
    output (ordering uses the unrounded value).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(_to_double(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_sim", 4).alias("cosine_sim"))
    )


def hyperplane_signature(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(dot(v, plane_i)).

    Planes are literals (broadcast). Deterministic given the plane set —
    the ANN entry derives planes from the corpus itself (first vectors),
    which keeps the whole query reproducible in plain SQL.
    """
    v = _to_double(vec_col)
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(dot(v, pc) > 0, F.lit(2**i).cast("long")).otherwise(0)
    return sig


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's LSH bucket.

    At 10^9 vectors the bucket predicate prunes ~2^len(planes)×; the bucket
    id is also the natural partition key for a pre-bucketed layout (write
    once, probe many). Recall tradeoff is the standard LSH one — multi-probe
    (flipping low-margin bits) raises it without changing the plan shape.
    """
    import math

    qsig = 0
    for i, p in enumerate(planes):
        d = sum(float(x) * float(y) for x, y in zip(query_vec, p))
        if d > 0:
            qsig += 2**i
    assert not math.isnan(qsig)
    bucketed = df.withColumn(
        "_bucket", hyperplane_signature(df, planes, vec_col)
    ).filter(F.col("_bucket") == qsig)
    return cosine_topk(bucketed, query_vec, k, vec_col, id_col)


def cosine_topk_pandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-vectorized variant: numpy dot per batch via mapInPandas.

    Faster than per-element higher-order functions for wide vectors (one BLAS
    call per Arrow batch); same output contract as `cosine_topk`.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    def score(batches):
        for pdf in batches:
            m = np.vstack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            yield pd.DataFrame({id_col: pdf[id_col], "_sim": sims})

    scored = df.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, _sim double"
    )
    return (
        scored.orderBy(F.col("_sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_sim", 4).alias("cosine_sim"))
    )
