"""ANN recall@10 study at 10^5 vectors: LSH multi-probe and IVF vs exact.

Measures recall of the engine's hyperplane-LSH multi-probe and IVF ANN
bucketing (`operators.similarity`) against exact cosine top-10, across
(planes, n_probe) / (n_lists, n_probe) grids on a 10^5-vector clustered
corpus (dim 32, 200 Gaussian clusters — the shape real embedding corpora
have; ANN recall is meaningless on isotropic noise). Deterministic (numpy
seed 7).

The grid itself runs as a vectorized numpy SIMULATION of the operators'
exact math (same signature rule, same rounded-margin multi-probe flips,
same cosine-argmax IVF assignment, same (-sim, vec_id) tie-break); a Spark
CROSS-CHECK then asserts, for a sample of queries at the default configs,
that `ann_lsh_topk` / `ann_ivf_topk` return exactly the simulated ids — so
the grid numbers are the operators' numbers, obtained ~100x faster than
one Spark job per (config, query).

Also reports the mean candidate fraction (rows scanned / corpus): the
recall/cost trade the documented defaults are chosen from. Output: a
markdown table for BENCH/BASELINE.md.

Usage: python tools/ann_recall.py [--n 100000] [--queries 50] [--no-spark]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
N_CLUSTERS = 200
SEED = 7


def make_corpus(n: int):
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    assign = rng.integers(0, N_CLUSTERS, size=n)
    vecs = centers[assign] + 0.35 * rng.normal(size=(n, DIM))
    return vecs.astype(np.float32), centers


def make_planes(n_planes: int) -> np.ndarray:
    return np.random.default_rng(SEED + 2).normal(size=(n_planes, DIM))


def signatures(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Mirror of `similarity.hyperplane_signature`: bit i = dot > 0."""
    return ((vecs.astype(np.float64) @ planes.T) > 0) @ (
        1 << np.arange(len(planes), dtype=np.int64)
    )


def multiprobe(q: np.ndarray, planes: np.ndarray, n_probe: int) -> list[int]:
    """Mirror of `similarity.multiprobe_buckets` (rounded margins, ties on
    plane index)."""
    d = planes @ q.astype(np.float64)
    qsig = int(((d > 0) @ (1 << np.arange(len(planes), dtype=np.int64))))
    margins = sorted((round(abs(float(x)), 6), i) for i, x in enumerate(d))
    return [qsig] + [qsig ^ (1 << i) for _, i in margins[: max(0, n_probe - 1)]]


def kmeans_lite(vecs: np.ndarray, n_lists: int, iters: int = 5) -> np.ndarray:
    """Strided seeding (the `lake.vector_index.VectorIndex` rule) + a few
    Lloyd iterations."""
    stride = max(1, len(vecs) // n_lists)
    cents = vecs[::stride][:n_lists].astype(np.float64).copy()
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for _ in range(iters):
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(vn @ cn.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = vecs[mask].mean(axis=0)
    return cents


def topk_ids(vecs, ids, q, k):
    """Exact cosine top-k with the engine's (-sim, vec_id) tie-break."""
    if len(ids) == 0:
        return []
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q / np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:k]
    return [int(ids[i]) for i in order]


def run_grid(n: int, n_queries: int, k: int):
    vecs, centers = make_corpus(n)
    rng = np.random.default_rng(SEED + 1)
    qidx = rng.integers(0, N_CLUSTERS, size=n_queries)
    queries = (
        centers[qidx] + 0.35 * rng.normal(size=(n_queries, DIM))
    ).astype(np.float32)
    all_ids = np.arange(n, dtype=np.int64)
    truth = [set(topk_ids(vecs, all_ids, q, k)) for q in queries]

    rows = []
    for n_planes in (12, 16):
        planes = make_planes(n_planes)
        sigs = signatures(vecs, planes)
        for n_probe in (1, 2, 4, 8, 16):
            hits = cand = 0
            for qi, q in enumerate(queries):
                probes = multiprobe(q, planes, n_probe)
                mask = np.isin(sigs, probes)
                got = topk_ids(vecs[mask], all_ids[mask], q, k)
                hits += len(truth[qi] & set(got))
                cand += int(mask.sum())
            rows.append(
                (f"LSH planes={n_planes} n_probe={n_probe}",
                 hits / (k * n_queries), cand / (n * n_queries))
            )
    for n_tables, n_planes, probes_grid in (
        (4, 12, (1, 4, 8)),
        (8, 16, (1, 4, 8)),
    ):
        tabs = [
            (pl := np.random.default_rng(SEED + 100 + t).normal(
                size=(n_planes, DIM)), signatures(vecs, pl))
            for t in range(n_tables)
        ]
        for n_probe in probes_grid:
            hits = cand = 0
            for qi, q in enumerate(queries):
                mask = np.zeros(n, bool)
                for pl, sigs in tabs:
                    mask |= np.isin(sigs, multiprobe(q, pl, n_probe))
                got = topk_ids(vecs[mask], all_ids[mask], q, k)
                hits += len(truth[qi] & set(got))
                cand += int(mask.sum())
            rows.append(
                (f"LSH-multitable L={n_tables} planes={n_planes} "
                 f"n_probe={n_probe}",
                 hits / (k * n_queries), cand / (n * n_queries))
            )
    for n_lists in (64, 256):
        cents = kmeans_lite(vecs, n_lists)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(vn @ cn.T, axis=1)
        for n_probe in (1, 2, 4, 8, 16):
            hits = cand = 0
            for qi, q in enumerate(queries):
                qs = (cn @ (q / np.linalg.norm(q)).astype(np.float64))
                probed = np.argsort(-qs, kind="stable")[:n_probe]
                mask = np.isin(assign, probed)
                got = topk_ids(vecs[mask], all_ids[mask], q, k)
                hits += len(truth[qi] & set(got))
                cand += int(mask.sum())
            rows.append(
                (f"IVF lists={n_lists} n_probe={n_probe}",
                 hits / (k * n_queries), cand / (n * n_queries))
            )
    return vecs, centers, queries, rows


def spark_crosscheck(vecs, queries, k: int) -> None:
    """Assert the Spark operators return EXACTLY the simulated ids at the
    default configs, for a sample of queries."""
    import pandas as pd

    from etl_documentos_spark.operators import similarity
    from etl_documentos_spark.session import get_spark

    spark = get_spark("ann_recall", master="local[16]", shuffle_partitions=16)
    n = len(vecs)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64),
             "embedding": list(map(list, vecs))}
        )
    ).persist()
    df.count()
    all_ids = np.arange(n, dtype=np.int64)

    planes_np = make_planes(16)
    planes = [list(map(float, p)) for p in planes_np]
    sigs = signatures(vecs, planes_np)
    cents_np = kmeans_lite(vecs, 256)
    cents = [list(map(float, c)) for c in cents_np]
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents_np / np.linalg.norm(cents_np, axis=1, keepdims=True)
    assign = np.argmax(vn @ cn.T, axis=1)

    mt_tabs_np = [
        np.random.default_rng(SEED + 100 + t).normal(size=(12, DIM))
        for t in range(4)
    ]
    mt_tabs = [[list(map(float, p)) for p in pl] for pl in mt_tabs_np]
    mt_sigs = [signatures(vecs, pl) for pl in mt_tabs_np]

    for q in queries[:5]:
        qv = list(map(float, q))
        # LSH multitable L=4 planes=12 n_probe=4 (the documented default)
        mask = np.zeros(n, bool)
        for mt_pl, mt_sig in zip(mt_tabs_np, mt_sigs):
            mask |= np.isin(mt_sig, multiprobe(q, mt_pl, 4))
        want = topk_ids(vecs[mask], all_ids[mask], q, k)
        got = [
            r["vec_id"]
            for r in similarity.ann_lsh_topk_multitable(
                df, qv, mt_tabs, k=k, n_probe=4
            ).collect()
        ]
        assert got == want, ("LSH-multitable mismatch", got, want)
        # LSH planes=16 n_probe=8
        probes = multiprobe(q, planes_np, 8)
        mask = np.isin(sigs, probes)
        want = topk_ids(vecs[mask], all_ids[mask], q, k)
        got = [
            r["vec_id"]
            for r in similarity.ann_lsh_topk(df, qv, planes, k=k, n_probe=8)
            .collect()
        ]
        assert got == want, ("LSH mismatch", got, want)
        # IVF lists=256 n_probe=8
        qs = cn @ (q / np.linalg.norm(q)).astype(np.float64)
        probed = np.argsort(-qs, kind="stable")[:8]
        mask = np.isin(assign, probed)
        want = topk_ids(vecs[mask], all_ids[mask], q, k)
        got = [
            r["vec_id"]
            for r in similarity.ann_ivf_topk(df, qv, cents, k=k, n_probe=8)
            .collect()
        ]
        assert got == want, ("IVF mismatch", got, want)
    print("spark cross-check: operators match the simulation exactly "
          "(5 queries x {LSH-multitable 4x12/4, LSH 16/8, IVF 256/8})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-spark", action="store_true")
    args = ap.parse_args()

    vecs, _centers, queries, rows = run_grid(args.n, args.queries, args.k)
    print(f"\ncorpus n={args.n} dim={DIM} clusters={N_CLUSTERS} "
          f"queries={args.queries} k={args.k}\n")
    print("| config | recall@10 | mean candidate fraction |")
    print("|---|---|---|")
    for label, rec, frac in rows:
        print(f"| {label} | {rec:.3f} | {frac:.4f} |")

    if not args.no_spark:
        spark_crosscheck(vecs, queries, args.k)


if __name__ == "__main__":
    main()
