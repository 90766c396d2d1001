"""Deduplication operators for large-scale document/transcript corpora.

Beyond the reference's content-hash dedup (SHA-256 of bytes,
``/root/reference/app/utils/file_utils.py:23-26``) this implements the
standard training-data-pipeline family:

- exact dedup (hash-groupBy)
- token-set Jaccard near-dup (pairwise via inverted index join)
- MinHash + LSH (shingle -> minhash signature -> band -> bucket join)
- SimHash (bitwise majority vote over token hashes)

Design for 10^8+ docs: every pairwise step goes through an inverted-index or
LSH-bucket equi-join (candidate generation), never a cross join. Hashes use
md5 (hex string) so the DuckDB oracle can reproduce values bit-for-bit;
swapping md5 -> xxhash64 is a one-line change where oracle parity is not
needed and speed matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_documentos_spark.functions.text import (
    fingerprint,
    normalize_text,
    shingles,
    words,
)

#: df-cap floor: a token must appear in strictly more than this many
#: documents before `near_dup_jaccard`'s frequency cap may drop it,
#: regardless of corpus size — keeps small batches exact (int(frac*n)
#: truncates to 0 under 20 docs and would drop every shared token)
_DF_CAP_FLOOR = 5


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of identical (normalized) content; keeps the min-id canonical
    row per group. Pure hash-groupBy: map-side combine, one shuffle."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def _doc_words(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int | None = None
) -> DataFrame:
    toks = shingles(text_col, shingle_k) if shingle_k else words(text_col)
    return df.select(
        F.col(id_col).alias("_id"), F.array_distinct(toks).alias("_ws")
    )


def near_dup_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_doc_frequency: float | None = 0.05,
    shingle_k: int | None = None,
) -> DataFrame:
    """Pairs of documents with token-set Jaccard >= threshold.

    ``shingle_k``: compare word k-SHINGLE sets instead of single tokens
    (n-gram Jaccard) — order-sensitive, far fewer cross-doc collisions on
    small vocabularies, same inverted-index join shape.

    Inverted-index candidate join: explode distinct tokens, self-join on the
    token, count shared tokens per pair, then jaccard = inter/(|a|+|b|-inter).
    Shuffles on the token key — ultra-frequent tokens are the O(n^2) hazard at
    scale: one token present in k docs makes k^2 candidate rows, so on a
    skewed corpus the hottest token IS the job. ``max_doc_frequency`` (ON by
    default) drops tokens present in more than that fraction of documents
    before the join — the standard near-dup df-cap. High-df tokens carry
    almost no set-similarity signal, but the result is technically
    approximate: pass ``max_doc_frequency=None`` for the exact (and
    scale-unsafe) form, as the oracle-checked query does. The cap is
    floored at ``_DF_CAP_FLOOR`` docs so small batches stay exact.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    docs = _doc_words(df, text_col, id_col, shingle_k).withColumn(
        "_n", F.size("_ws")
    )
    tokens = docs.select("_id", "_n", F.explode("_ws").alias("w"))
    if max_doc_frequency is not None:
        # count the raw rows (no tokenization pass) for the df-cap threshold
        n_docs = df.count()
        # floor the cap: on a small corpus int(frac*n) truncates toward 0
        # and a tiny cap would drop exactly the shared tokens that form
        # pairs — silently returning zero duplicates. Below the floor the
        # cap is a no-op, so small batches get the exact answer while large
        # corpora (where the floor is irrelevant) keep the scale guard.
        cap = max(int(max_doc_frequency * n_docs), _DF_CAP_FLOOR)
        if cap < n_docs:
            common = (
                tokens.groupBy("w")
                .count()
                .filter(F.col("count") > cap)
                .select("w")
            )
            tokens = tokens.join(F.broadcast(common), "w", "left_anti")
    a = tokens.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("na"), "w"
    )
    b = tokens.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("nb"), "w"
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig[num_hashes]) — minhash over word k-shingles.

    Hash family: h_j(s) = md5(s || '#' || j); the min is taken over the hex
    strings (total order, portable to any SQL engine). One narrow pass, no
    shuffle: signatures are computed per-row from the shingle array.
    """
    sh = shingles(text_col, shingle_k)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    sh, lambda s: F.md5(F.concat(s, F.lit(f"#{j}")))
                )
            ).alias(f"mh{j}")
            for j in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col).alias("_id"), sig.alias("sig"))


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH band rows: (_id, sig, band, key), one row per (doc, band).

    rows_per_band = num_hashes / bands; two docs agreeing on ALL signature
    components of any band get the same ``key`` for that band. The full
    signature rides along with every band row so a downstream consumer can
    estimate Jaccard (fraction of equal components) with a single equi-join
    on (band, key) — no second lookup against a signature table. Shared by
    `minhash_lsh_pairs` (batch self-join) and the persisted incremental
    index (`lake/dedup_index.py`).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    return sigs.select(
        "_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[i * r + j] for j in range(r)]
                            )
                        ).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "sig", "bk.band", "bk.key")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding of minhash signatures.

    Pipeline: signature (narrow) -> explode bands -> groupBy-free
    self-equi-join on (band_idx, band_key) -> distinct pairs. The join key is
    a hash bucket, so hot buckets are bounded by collision rate, not by data
    skew. Returns (id_a, id_b) candidates (verify with `near_dup_jaccard`
    semantics downstream if exact jaccard is needed).
    """
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_k
    ).select("_id", "band", "key")
    a = banded.select(F.col("_id").alias("id_a"), "band", "key")
    b = banded.select(F.col("_id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprints) — winnowing document fingerprints (the MOSS
    scheme): hash every k-character gram of the normalized text, slide a
    window of ``window`` consecutive gram hashes, keep each window's
    minimum, dedupe and sort.

    Guarantees of winnowing: any shared substring of length >= k+window-1
    between two documents yields at least one shared fingerprint, so
    near-dup candidate generation can equi-join on exploded fingerprints
    (like the token inverted index, but robust to word-boundary edits).
    One narrow pass, per-row O(len*k) integer expression work, no shuffle.

    Gram hash = Karp-Rabin polynomial over the char codes (Horner, base
    257, mod 2^31-1) instead of per-gram md5, exactly reproducible in the
    DuckDB oracle — the normalized alphabet is strictly ``[a-z0-9 ]``, so
    ``ascii()`` agrees across engines, and DuckDB's ``list_reduce`` (seeded
    with the first element) computes the identical Horner chain, since
    ``(0*B + c1) % M == c1``.

    Execution: normalization stays a JVM column expression; the Horner
    chain + window minima run as vectorized numpy inside ``mapInPandas``
    (Arrow-batched). The all-builtin formulation (nested
    ``transform``/``aggregate``/``slice`` lambdas) evaluates higher-order
    lambdas interpreted, allocating a k-element slice per gram — measured
    ~5 s for 5k docs x 300 chars at sf0.1 vs ~0.3 s for this path doing
    identical arithmetic; ``k`` numpy passes per document replace per-gram
    object churn, and the Arrow transfer is just (id, normalized text).
    """
    B, M = 257, (1 << 31) - 1
    base = df.select(
        F.col(id_col).alias("_id"), normalize_text(text_col).alias("_t")
    )

    def winnow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for t in pdf["_t"]:
                s = t if t is not None else ""
                codes = np.frombuffer(
                    s.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                if codes.size == 0:
                    # ascii(substring('', 1, 1)) = 0 in both engines: the
                    # empty doc hashes a single zero code
                    codes = np.zeros(1, dtype=np.int64)
                n = codes.size
                if n >= k:
                    n_g = n - (k - 1)
                    h = np.zeros(n_g, dtype=np.int64)
                    for j in range(k):
                        # max before mod: M*B + 127 < 2^40 — no overflow
                        h *= B
                        h += codes[j:j + n_g]
                        h %= M
                else:  # short doc: one Horner over all chars (slice clips)
                    acc = 0
                    for ch in codes:
                        acc = (acc * B + int(ch)) % M
                    h = np.array([acc], dtype=np.int64)
                n_w = max(h.size - (window - 1), 1)
                m = h[:n_w].copy()
                for j in range(1, window):
                    # clamp: past-the-end indices repeat the last hash,
                    # which cannot change a minimum (slice-clip semantics)
                    idx = np.minimum(np.arange(n_w) + j, h.size - 1)
                    np.minimum(m, h[idx], out=m)
                out.append(np.unique(m).tolist())
            yield pd.DataFrame({"_id": pdf["_id"], "fingerprints": out})

    return base.mapInPandas(winnow, "_id long, fingerprints array<bigint>")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """(id, simhash) — bitwise-majority fingerprint over token hashes.

    Token hash = first 8 hex chars of md5 -> 32-bit int (portable via
    conv/base-16). For each of ``bits`` low bits, vote +1/-1 per token;
    simhash bit i = 1 iff the vote is positive. Near-dups share the value
    (or differ in few bits — pair by exact value here; banded variants
    split the bits like LSH).
    """
    ws = words(text_col)
    tok_hash = F.transform(
        F.array_distinct(ws),
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
    )

    # single pass over the token-hash array: fold a bits-wide vote vector
    # (+1/-1 per bit per token), then weigh positive votes by 2^i. The old
    # shape ran one F.aggregate per bit — `bits` traversals re-evaluating the
    # md5-derived hash array each time (no CSE across aggregates).
    def bitvec(h):
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        tok_hash,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, b: a + b),
    )
    powers = F.array(*[F.lit(2**i).cast("long") for i in range(bits)])
    sim = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("_id"), sim.alias("simhash"))
