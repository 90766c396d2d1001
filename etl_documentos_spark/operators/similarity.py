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


def multiprobe_buckets(
    query_vec: list[float],
    planes: list[list[float]],
    n_probe: int = 1,
) -> list[int]:
    """Multi-probe LSH bucket set: the query's own signature plus
    ``n_probe - 1`` single-bit flips of the planes the query is CLOSEST to
    (smallest |dot|) — the classic multi-probe heuristic: a near-zero
    margin means the true neighbors straddle that hyperplane, so its
    flipped bucket is the most likely to hold the misses.

    Margins are rounded to 6 decimals before ranking (ties then break on
    plane index) so a SQL oracle computing the same dots in double
    arithmetic selects the identical flip set. Driver-side: planes are
    tiny metadata, never data rows.
    """
    qsig = 0
    margins: list[tuple[float, int]] = []
    for i, p in enumerate(planes):
        d = sum(float(x) * float(y) for x, y in zip(query_vec, p))
        if d > 0:
            qsig += 2**i
        margins.append((round(abs(d), 6), i))
    buckets = [qsig]
    for _, i in sorted(margins)[: max(0, int(n_probe) - 1)]:
        buckets.append(qsig ^ (2**i))
    return buckets


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's LSH
    bucket(s).

    At 10^9 vectors the bucket predicate prunes ~2^len(planes)×; the bucket
    id is also the natural partition key for a pre-bucketed layout (write
    once, probe many — the IN-list is partition-prunable). ``n_probe`` > 1
    applies multi-probe (probe the query bucket plus the single-bit flips
    of the lowest-margin planes, see `multiprobe_buckets`), raising recall
    at the cost of scanning proportionally more buckets without changing
    the plan shape.
    """
    probes = multiprobe_buckets(query_vec, planes, n_probe)
    bucketed = df.withColumn(
        "_bucket", hyperplane_signature(df, planes, vec_col)
    ).filter(F.col("_bucket").isin(probes))
    return cosine_topk(bucketed, query_vec, k, vec_col, id_col)


def ann_lsh_topk_multitable(
    df: DataFrame,
    query_vec: list[float],
    tables: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-TABLE hyperplane LSH ANN: OR-amplification across ``L``
    independent plane sets — a candidate qualifies if it shares a probed
    bucket with the query in ANY table.

    Single-table multiprobe saturates well below full recall on clustered
    corpora (one unlucky hyperplane through a cluster loses its neighbors
    for every probe); independent tables make losses independent, so
    recall approaches 1 - (1 - r)^L. Measured at 10^5 clustered vectors
    (tools/ann_recall.py): the documented default — 4 tables x 12 planes,
    n_probe=4 — reaches recall@10 ~ 0.94 scanning ~1.1% of the corpus;
    8 x 16 x 4 reaches ~0.95 at ~0.6%.

    Plan shape: one scan with an OR of per-table IN-list predicates —
    still fully codegen, and on a layout pre-bucketed by any one table's
    signature the first disjunct partition-prunes. Cost scales with the
    union of probed buckets (~L x the single-table candidate set).
    """
    pred = None
    for planes in tables:
        probes = multiprobe_buckets(query_vec, planes, n_probe)
        hit = hyperplane_signature(df, planes, vec_col).isin(probes)
        pred = hit if pred is None else (pred | hit)
    return cosine_topk(df.filter(pred), query_vec, k, vec_col, id_col)


def allpairs_cosine_pairs(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine pairs ≥ threshold — no cartesian join.

    Replaces the naive ``a.join(b, id_a < id_b)`` (a driver-planned
    BroadcastNestedLoopJoin, O(n²) *rows* materialized) with the standard
    blocked scheme: each vector gets a block ``g = id % n_blocks`` and is
    replicated to every unordered block pair containing ``g`` (replication
    factor = n_blocks). A shuffle on the block-pair key co-locates each
    pair-of-blocks on one task; inside the task a single numpy/BLAS matmul
    scores the block-cross product and only surviving pairs are emitted.

    The O(n²) FLOPs are inherent to *exact* all-pairs; what this buys at
    scale is (a) the work is spread evenly over n_blocks·(n_blocks+1)/2
    independent tasks (set n_blocks ≈ sqrt(2·parallelism)), (b) compute is
    one BLAS call per task instead of per-row expression evaluation, and
    (c) output stays sparse — only ≥-threshold pairs ever become rows.
    For corpus-scale (10^9+) use the approximate ``near_dup_pairs_lsh``.

    Output contract matches the previous operator: (id_a, id_b, cosine_sim)
    with id_a < id_b and cosine_sim rounded to 4 decimals, filtered on the
    rounded value.
    """
    import numpy as np
    import pandas as pd

    b = int(n_blocks)
    g = F.pmod(F.col(id_col).cast("long"), F.lit(b))
    # every unordered block pair (i, j) with i <= j that contains g
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda h: F.struct(
            F.least(g, h).alias("bi"), F.greatest(g, h).alias("bj")
        ),
    )
    exploded = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            _to_double(vec_col).alias("_v"),
            g.alias("_g"),
            F.explode(F.array_distinct(pair_keys)).alias("_bp"),
        )
        .select("_id", "_v", "_g", F.col("_bp.bi").alias("_bi"),
                F.col("_bp.bj").alias("_bj"))
    )

    thr = float(threshold)

    def score(key, pdf):
        bi, bj = key
        m = np.vstack(pdf["_v"].map(np.asarray).values).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["_id"].to_numpy()
        if bi == bj:
            sims = m @ m.T
            ia, ib = np.nonzero(np.round(sims, 4) >= thr)
            keep = ids[ia] < ids[ib]
            ia, ib = ia[keep], ib[keep]
            return pd.DataFrame(
                {"id_a": ids[ia], "id_b": ids[ib],
                 "cosine_sim": np.round(sims[ia, ib], 4)}
            )
        left = pdf["_g"].to_numpy() == bi
        la, lb = ids[left], ids[~left]
        sims = m[left] @ m[~left].T
        ia, ib = np.nonzero(np.round(sims, 4) >= thr)
        id_a = np.minimum(la[ia], lb[ib])
        id_b = np.maximum(la[ia], lb[ib])
        return pd.DataFrame(
            {"id_a": id_a, "id_b": id_b,
             "cosine_sim": np.round(sims[ia, ib], 4)}
        )

    return exploded.groupBy("_bi", "_bj").applyInPandas(
        score, schema="id_a long, id_b long, cosine_sim double"
    )


def near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate near-dup pairs: hyperplane-LSH bucket candidates + exact
    in-bucket cosine verify.

    The bucket id is an equi-join key, so candidate generation is a shuffle
    (linear), never a cross join; pair work is quadratic only *within* a
    bucket (expected n/2^planes rows). Standard LSH recall tradeoff — add
    planes to prune harder, or union several plane sets (bands) to boost
    recall. This is the 10^9-vector path; ``allpairs_cosine_pairs`` is the
    exact (quadratic-FLOP) fallback.
    """
    sig = hyperplane_signature(df, planes, vec_col)
    a = df.select(
        F.col(id_col).alias("id_a"),
        _to_double(vec_col).alias("va"),
        sig.alias("_bucket"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        _to_double(vec_col).alias("vb"),
        sig.alias("_bucket"),
    )
    pairs = a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= float(threshold))
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> Column:
    """IVF coarse quantizer: index of the nearest centroid by cosine.

    Centroids are literals (broadcast); the argmax runs as one array
    expression per row (struct-max over per-centroid similarity), so
    assignment is a narrow pass — the write side of an IVF index. At
    10^9 vectors the assignment column becomes the partition/bucket key:
    probe-time work shrinks to corpus/C per probed list.
    """
    v = _to_double(vec_col)
    nv = norm(v)
    scored = F.array(
        *[
            F.struct(
                (
                    dot(v, F.array(*[F.lit(float(x)) for x in c]))
                    / (
                        nv
                        * F.lit(
                            sum(float(x) * float(x) for x in c) ** 0.5
                        )
                    )
                ).alias("sim"),
                F.lit(-i).alias("rank"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_max(scored).getField("idx")


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: probe the query's ``n_probe`` nearest
    centroid lists, exact cosine inside them.

    The standard FAISS-IVF shape re-expressed as DataFrame ops: assignment
    is an equi-filter (partition-prunable when the table is written
    bucketed by the assignment), probing more lists trades compute for
    recall. Deterministic given the centroid set — the showcase derives
    centroids from corpus rows so the whole query is SQL-reproducible.
    """
    import math

    def cos_q(c: list[float]) -> float:
        d = sum(float(x) * float(y) for x, y in zip(query_vec, c))
        nq = math.sqrt(sum(float(x) ** 2 for x in query_vec))
        nc = math.sqrt(sum(float(x) ** 2 for x in c))
        return d / (nq * nc)

    order = sorted(
        range(len(centroids)), key=lambda i: (-cos_q(centroids[i]), i)
    )
    probed = order[: max(1, n_probe)]
    assigned = df.withColumn("_list", ivf_assign(df, centroids, vec_col))
    cand = assigned.filter(F.col("_list").isin(probed))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


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


def knn_vote(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN majority-vote classification for a small batch of query vectors.

    The query set rides into every task as one literal array of structs and
    is EXPLODED against the corpus scan — a narrow flatMap, not a join, so
    the plan is scan -> explode -> window(top-k per query) -> tiny vote agg.
    At 10^9 corpus rows the cost is one pass regardless of |queries|
    (bounded driver-side: queries are classification requests, not data).
    Ties break deterministically: more votes first, then best (highest)
    summed similarity, then smaller label.

    Output: (query_id, predicted_label, votes) — one row per query.

    Reference parity: adaptive vector-vote classification over FAISS
    neighbors (/root/reference/app/services/classification_service.py —
    similarity vote with threshold gates), the vote stage re-expressed as
    window + aggregation.
    """
    from pyspark.sql import Window

    qarr = F.array(
        *[
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("qv"),
            )
            for qid, vec in queries
        ]
    )
    v = _to_double(vec_col)
    exploded = df.select(
        F.col(id_col), F.col(label_col), v.alias("_v"), F.explode(qarr).alias("_q")
    )
    sim = cosine(F.col("_v"), F.col("_q.qv"))
    scored = exploded.select(
        F.col("_q.query_id").alias("query_id"),
        F.col(id_col),
        F.col(label_col),
        sim.alias("_sim"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col(id_col)
    )
    topk = scored.withColumn("_rn", F.row_number().over(win)).filter(
        F.col("_rn") <= k
    )
    # simsum tie-break rounded to 6 decimals: summation order must not flip
    # the argmax between engines/partitionings
    votes = topk.groupBy("query_id", label_col).agg(
        F.count("*").alias("votes"), F.round(F.sum("_sim"), 6).alias("_simsum")
    )
    vwin = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_simsum").desc(), F.col(label_col)
    )
    return (
        votes.withColumn("_vrn", F.row_number().over(vwin))
        .filter(F.col("_vrn") == 1)
        .select(
            "query_id",
            F.col(label_col).cast("int").alias("predicted_label"),
            F.col("votes").cast("long").alias("votes"),
        )
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Per-label mean vector — the nearest-class-mean train step.

    Declarative two-level aggregation: posexplode to (label, pos, x),
    avg per (label, pos), re-assemble with array_sort+transform. At 10^9
    rows this is one shuffle keyed by (label, pos) with map-side partial
    aggregation — cardinality |labels| x dim, never data-sized. Centroid
    components are rounded (``round_to``) so a downstream argmax is
    reproducible across engines and summation orders.

    Output: (label, centroid: array<double>).
    """
    v = _to_double(vec_col)
    pos = df.select(
        F.col(label_col).alias("label"), F.posexplode(v).alias("pos", "x")
    )
    m = pos.groupBy("label", "pos").agg(F.round(F.avg("x"), round_to).alias("m"))
    return (
        m.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
        .select(
            "label",
            F.transform("_pm", lambda s: s.getField("m")).alias("centroid"),
        )
    )


def nearest_centroid(
    queries_df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "nc_label",
) -> DataFrame:
    """Nearest-class-mean classification against literal centroids.

    Centroids are bounded by label cardinality (collected once, ridden into
    the plan as literals — the `ivf_assign` shape with labels as list ids).
    Ties break toward the smaller label. Output: (query_id, ``out_col``).
    """
    v = _to_double(vec_col)
    nv = norm(v)
    scored = F.array(
        *[
            F.struct(
                (
                    dot(v, F.array(*[F.lit(float(x)) for x in c]))
                    / (nv * F.lit(sum(float(x) ** 2 for x in c) ** 0.5))
                ).alias("sim"),
                F.lit(-int(lbl)).alias("rank"),
                F.lit(int(lbl)).alias("lbl"),
            )
            for lbl, c in centroids
        ]
    )
    return queries_df.select(
        F.col(id_col).cast("int").alias("query_id"),
        F.array_max(scored).getField("lbl").alias(out_col),
    )
