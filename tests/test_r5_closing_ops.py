"""Round-5 closing operators: key-migration rekey, BPE training, corpus
split. Each is verified against an independent pure-Python re-derivation
(BPE) or by construction properties (group atomicity, LWW revive)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from etl_documentos_spark.operators.bpe import (
    bpe_train,
    bpe_train_df,
    pair_counts,
)
from etl_documentos_spark.operators.rekey import split_key_migrations
from etl_documentos_spark.operators.split import (
    assign_split,
    split_column,
    split_thresholds,
)

# ---------------------------------------------------------------------------
# rekey
# ---------------------------------------------------------------------------

CH_SCHEMA = (
    "op string, conv_id string, turn_idx int, text string, ts long, "
    "lsn long, prev_conv_id string, prev_turn_idx int"
)


def _lww_state(rows):
    """Pure-python LWW reducer over canonical (no prev_*) change rows."""
    best = {}
    for op, conv, turn, text, ts, lsn in rows:
        k = (conv, turn)
        if k not in best or (ts, lsn) > (best[k][0], best[k][1]):
            best[k] = (ts, lsn, op, text)
    return {
        k: v[3] for k, v in best.items() if v[2] != "delete"
    }


def test_rekey_expands_migration_to_retract_plus_upsert(spark):
    df = spark.createDataFrame(
        [
            ("insert", "c1", 1, "hello", 10, 100, None, None),
            # key change: (c1,1) -> (c1,7), later event
            ("update", "c1", 7, "hello moved", 20, 200, "c1", 1),
        ],
        CH_SCHEMA,
    )
    out = split_key_migrations(df)
    assert "prev_conv_id" not in out.columns
    rows = {
        (r["op"], r["conv_id"], r["turn_idx"], r["lsn"])
        for r in out.collect()
    }
    assert rows == {
        ("insert", "c1", 1, 100),
        ("delete", "c1", 1, 200),  # retract at the before-key
        ("insert", "c1", 7, 200),  # upsert at the after-key
    }
    # end state: old key retracted (delete is newest there), new key live
    state = _lww_state(
        [
            (r["op"], r["conv_id"], r["turn_idx"], r["text"], r["ts"], r["lsn"])
            for r in out.collect()
        ]
    )
    assert state == {("c1", 7): "hello moved"}


def test_rekey_passthrough_rows_unchanged(spark):
    df = spark.createDataFrame(
        [
            ("insert", "c1", 1, "a", 10, 100, None, None),
            ("delete", "c2", 3, "b", 11, 101, None, None),
        ],
        CH_SCHEMA,
    )
    out = split_key_migrations(df).orderBy("lsn").collect()
    assert [(r["op"], r["conv_id"], r["turn_idx"]) for r in out] == [
        ("insert", "c1", 1),
        ("delete", "c2", 3),
    ]


def test_rekey_old_key_revivable_by_later_write(spark):
    """A real update to the old key AFTER the migration must win over the
    migration's retract — replayed-binlog idempotence."""
    df = spark.createDataFrame(
        [
            ("insert", "c1", 1, "v1", 10, 100, None, None),
            ("update", "c1", 9, "v1 moved", 20, 200, "c1", 1),
            ("insert", "c1", 1, "fresh at old key", 30, 300, None, None),
        ],
        CH_SCHEMA,
    )
    out = split_key_migrations(df)
    state = _lww_state(
        [
            (r["op"], r["conv_id"], r["turn_idx"], r["text"], r["ts"], r["lsn"])
            for r in out.collect()
        ]
    )
    assert state == {
        ("c1", 9): "v1 moved",
        ("c1", 1): "fresh at old key",
    }


def test_rekey_same_key_before_image_passthrough(spark):
    """hypothesis-found: an update whose before-image key EQUALS its
    after-key must pass through untouched — expanding it would create a
    delete+insert tied on (ts, lsn) at one key, leaving the outcome to
    an LWW tie-break instead of semantics."""
    df = spark.createDataFrame(
        [
            ("insert", "c0", 0, "t0", 0, 0, None, None),
            ("insert", "c0", 0, "t1", 0, 1, None, None),
            ("update", "c0", 0, "t2", 0, 2, "c0", 0),
        ],
        CH_SCHEMA,
    )
    out = split_key_migrations(df).collect()
    assert len(out) == 3  # no expansion
    assert {(r["op"], r["lsn"]) for r in out} == {
        ("insert", 0), ("insert", 1), ("update", 2)
    }
    state = _lww_state(
        [
            (r["op"], r["conv_id"], r["turn_idx"], r["text"], r["ts"], r["lsn"])
            for r in out
        ]
    )
    assert state == {("c0", 0): "t2"}


def test_rekey_requires_prev_columns(spark):
    df = spark.createDataFrame(
        [("insert", "c1", 1)], "op string, conv_id string, turn_idx int"
    )
    with pytest.raises(ValueError, match="prev_conv_id"):
        split_key_migrations(df)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _py_bpe(texts, n_merges, min_len=2):
    """Independent reference: classic greedy BPE over word frequencies."""
    import re
    import unicodedata

    freq = collections.Counter()
    for t in texts:
        folded = "".join(
            ch
            for ch in unicodedata.normalize("NFD", t.lower())
            if not unicodedata.combining(ch)
        )
        for w in re.split(r"[^a-z0-9]+", folded):
            if len(w) >= min_len:
                freq[w] += 1
    words = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        # max count, ties broken lexicographically ascending
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the hatter chatted, the cat scattered",
    "banana bandana cabana",
    "lower lowest newer newest",
    "Atenção: ação e reação",  # accent fold must match words()
    "aaaa aaa aa",  # overlapping-merge order: greedy left-to-right
]


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_train(df, "text", n_merges=6)
    want = _py_bpe(CORPUS, n_merges=6)
    assert got == want


def test_bpe_greedy_scan_order(spark):
    """`aaa` under merge (a,a) is [aa, a] — left-to-right, no re-merge of
    the fresh token with the next symbol in the same pass."""
    df = spark.createDataFrame([("aaa aaa",)], "text string")
    merges = bpe_train(df, "text", n_merges=2)
    assert merges == _py_bpe(["aaa aaa"], n_merges=2)


def test_bpe_train_df_shape(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    out = bpe_train_df(df, "text", n_merges=3)
    rows = out.orderBy("step").collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert all(r["cnt"] > 0 for r in rows)


def test_pair_counts_top1_is_first_merge(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    top = pair_counts(df, "text", k=1).collect()[0]
    (a, b, cnt) = _py_bpe(CORPUS, n_merges=1)[0]
    assert top["pair"] == a + b
    assert top["cnt"] == cnt


# ---------------------------------------------------------------------------
# corpus split
# ---------------------------------------------------------------------------


def test_split_group_atomic_and_deterministic(spark):
    rows = [(f"conv_{i % 37}", j) for i in range(370) for j in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = assign_split(df, "conv_id", salt="s1")
    # every group maps to exactly one split
    per_group = (
        out.groupBy("conv_id")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    # deterministic under repartitioning
    again = assign_split(df.repartition(7, "turn_idx"), "conv_id", salt="s1")
    a = {
        (r["conv_id"], r["split"])
        for r in out.select("conv_id", "split").distinct().collect()
    }
    b = {
        (r["conv_id"], r["split"])
        for r in again.select("conv_id", "split").distinct().collect()
    }
    assert a == b


def test_split_fractions_and_salt(spark):
    groups = [(f"g{i}",) for i in range(5000)]
    df = spark.createDataFrame(groups, "gid string")
    out = assign_split(df, "gid", fracs=(0.8, 0.1, 0.1), salt="")
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02
    # a different salt redraws the assignment
    redrawn = assign_split(df, "gid", salt="other")
    joined = out.alias("a").join(redrawn.alias("b"), "gid")
    moved = joined.filter(F.col("a.split") != F.col("b.split")).count()
    assert moved > 500


def test_split_thresholds_validation():
    with pytest.raises(ValueError):
        split_thresholds((0.5, 0.4), ("a", "b"))  # doesn't sum to 1
    with pytest.raises(ValueError):
        split_thresholds((1.0,), ("a", "b"))  # misaligned names
    ts = split_thresholds((0.8, 0.1, 0.1), ("train", "val", "test"))
    assert ts[0] == ("train", "cccd") or ts[0][0] == "train"
    assert ts[-1] == ("test", "g")


def test_split_column_matches_sql_case(spark):
    """Spark column and generated SQL CASE agree row-for-row (the oracle
    parity contract)."""
    from etl_documentos_spark.operators.split import split_sql

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(500)], "gid string"
    )
    via_col = df.select(
        "gid", split_column("gid", salt="z").alias("split")
    )
    df.createOrReplaceTempView("split_parity_t")
    # DuckDB dialect -> Spark dialect: only the cast spelling differs
    case = split_sql("gid", salt="z").replace("AS VARCHAR)", "AS STRING)")
    via_sql = spark.sql(
        f"SELECT gid, {case} AS split FROM split_parity_t"
    )
    mism = (
        via_col.alias("a")
        .join(via_sql.alias("b"), "gid")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert mism == 0


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------


def test_bpe_encode_variants_agree(spark):
    """Arrow-batched encode == codegen fold-chain encode, on rules actually
    learned from the corpus (train -> encode roundtrip)."""
    from etl_documentos_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_column,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "id int, text string"
    )
    merges = bpe_train(df, "text", n_merges=5)
    via_pandas = {
        r["id"]: r["tokens"]
        for r in bpe_encode(df, merges, "text").collect()
    }
    via_codegen = {
        r["id"]: r["tokens"]
        for r in df.select(
            "id", bpe_encode_column(F.col("text"), merges).alias("tokens")
        ).collect()
    }
    assert via_pandas == via_codegen
    # lossless within words: concatenating tokens rebuilds the word stream
    joined = {
        r["id"]: "".join(r["ws"])
        for r in df.select(
            "id",
            F.expr(
                "filter(split(translate(lower(text), "
                "'áàâãäåéèêëíìîïóòôõöúùûüçñýÿ', "
                "'aaaaaaeeeeiiiiooooouuuucnyy'), '[^a-z0-9]+'), "
                "w -> length(w) > 0)"
            ).alias("ws"),
        ).collect()
    }
    for i, toks in via_pandas.items():
        assert "".join(toks) == joined[i]


def test_bpe_encode_known_rules(spark):
    from etl_documentos_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(0, "banana bandana")], "id int, text string")
    out = bpe_encode(df, [("a", "n"), ("an", "a")], "text").collect()[0]
    # banana: b,a,n,a,n,a -> b,an,an,a -> b,an,ana
    # bandana: b,a,n,d,a,n,a -> b,an,d,an,a -> b,an,d,ana
    assert out["tokens"] == ["b", "an", "ana", "b", "an", "d", "ana"]


# ---------------------------------------------------------------------------
# rekey property test: arbitrary streams == sequential reducer
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def migration_streams(draw):
    """Adversarial little change streams where some updates change keys:
    key collisions, ts ties, migrations landing on occupied keys,
    migrations of never-inserted keys, chains (a->b then b->c)."""
    n = draw(st.integers(min_value=1, max_value=20))
    events = []
    for lsn in range(n):
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        conv = f"c{draw(st.integers(0, 1))}"
        turn = draw(st.integers(0, 3))
        ts = draw(st.integers(0, 4))
        prev_c = prev_t = None
        if op == "update" and draw(st.booleans()):
            prev_c = f"c{draw(st.integers(0, 1))}"
            prev_t = draw(st.integers(0, 3))
        events.append(
            (op, conv, turn, f"t{lsn}", ts, lsn, prev_c, prev_t)
        )
    return events


def _reduce_with_migrations(events):
    """Sequential reference: expand KEY-CHANGING migrations, then LWW.

    A before-image equal to the after-key is a plain update (connectors
    can ship before images on every update) — no expansion."""
    canon = []
    for op, conv, turn, text, ts, lsn, pc, pt in events:
        if pc is not None and pt is not None and (pc, pt) != (conv, turn):
            canon.append(("delete", pc, pt, text, ts, lsn))
            canon.append(("insert", conv, turn, text, ts, lsn))
        else:
            canon.append((op, conv, turn, text, ts, lsn))
    return _lww_state(canon)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(migration_streams())
def test_rekey_property_engine_equals_reducer(spark, events):
    from etl_documentos_spark.operators.lww import lww_dedup

    df = spark.createDataFrame(events, CH_SCHEMA)
    out = split_key_migrations(df)
    win = lww_dedup(out.withColumn("source_partition", F.lit(0)))
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in win.filter(F.col("op") != "delete").collect()
    }
    assert got == _reduce_with_migrations(events)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=16),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_bpe_property_matches_python_reference(spark, texts, n_merges):
    """Arbitrary tiny corpora (tight alphabet so merges collide and chain,
    runs like 'aaaa' stress the greedy scan) == the pure-Python BPE."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_train(df, "text", n_merges=n_merges) == _py_bpe(
        texts, n_merges
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.text(alphabet="xyz0", max_size=6), min_size=1, max_size=40),
    st.sampled_from(["", "a", "epoch7"]),
)
def test_split_property_total_and_group_atomic(spark, groups, salt):
    """Every row gets exactly one label; duplicate group keys always agree
    (including empty-string keys); labels come from the declared set."""
    rows = [(g, i) for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "gid string, i int")
    out = assign_split(df, "gid", salt=salt).collect()
    assert all(r["split"] in ("train", "val", "test") for r in out)
    seen = {}
    for r in out:
        assert seen.setdefault(r["gid"], r["split"]) == r["split"]


# ---------------------------------------------------------------------------
# weighted source-mixing
# ---------------------------------------------------------------------------


def test_mixing_proportions_and_determinism(spark):
    from etl_documentos_spark.operators.mixing import weighted_interleave

    rows = [(i, "web" if i % 2 == 0 else "code") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_interleave(
        df, "source", {"web": 3.0, "code": 1.0}, "doc_id", k=800, salt="s"
    )
    head = out.collect()
    assert [r["rank"] for r in head] == list(range(1, 801))
    share = sum(1 for r in head if r["source"] == "web") / len(head)
    # exponential race: web should take ~75% of every prefix
    assert 0.70 < share < 0.80, share
    # identical schedule under a different partitioning
    again = weighted_interleave(
        df.repartition(13), "source", {"web": 3.0, "code": 1.0},
        "doc_id", k=800, salt="s",
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in head] == [
        (r["rank"], r["doc_id"]) for r in again
    ]
    # a different salt redraws the schedule
    redrawn = weighted_interleave(
        df, "source", {"web": 3.0, "code": 1.0}, "doc_id", k=800, salt="t"
    ).collect()
    assert [r["doc_id"] for r in head] != [r["doc_id"] for r in redrawn]


def test_mixing_unknown_source_raises(spark):
    from etl_documentos_spark.operators.mixing import weighted_interleave

    df = spark.createDataFrame(
        [(1, "web"), (2, "mystery")], "doc_id long, source string"
    )
    out = weighted_interleave(df, "source", {"web": 1.0}, "doc_id", k=10)
    with pytest.raises(Exception, match="mystery"):
        out.collect()  # inline raise_error fires at execution


def test_mixing_plan_is_top_k_not_global_sort(spark):
    """orderBy(key).limit(k) must plan as TakeOrderedAndProject (per-
    partition heaps + merge) — never a full-corpus sort exchange."""
    from etl_documentos_spark.operators.mixing import exp_race_key

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    head = df.withColumn(
        "_k", exp_race_key("doc_id", F.lit(1.0), "s")
    ).orderBy("_k", "doc_id").limit(50)
    plan = head._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_dedup_split_is_cluster_atomic(spark):
    """Near-dup-level split: every connected component lands whole in one
    split (the leakage unit is the cluster, not the row)."""
    from etl_documentos_spark.plans.queries import q_dedup_split

    out = q_dedup_split(spark, "/root/testdata/sf0.001")
    per_cluster = (
        out.groupBy("component_id")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert per_cluster and all(r["n"] == 1 for r in per_cluster)


def test_temperature_weights_rebalance(spark):
    """alpha<1 pulls the mix toward uniform: a 9:1 corpus at alpha=0.5
    schedules the minority source at sqrt(9):1 = 3:1 — measurably above
    its natural 10% share — and alpha=1 reproduces natural frequency."""
    from etl_documentos_spark.operators.mixing import (
        temperature_weights,
        weighted_interleave,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w1 = temperature_weights(df, "source", alpha=1.0)
    assert w1["big"] == w1["small"] == 1.0  # natural frequencies
    w_half = temperature_weights(df, "source", alpha=0.5)
    # per-row rates: count^(alpha-1); shares go as N*w = count^alpha,
    # so the 9:1 corpus schedules at 3:1
    assert abs(w_half["small"] / w_half["big"] - 3.0) < 1e-9
    head = weighted_interleave(
        df, "source", w_half, "doc_id", k=1000, salt="t"
    ).collect()
    small_share = sum(1 for r in head if r["source"] == "small") / 1000
    # expected 1/(3+1) = 25% of the schedule vs a natural 10%
    assert 0.20 < small_share < 0.30, small_share


def test_share_weights_hit_targets_regardless_of_size(spark):
    from etl_documentos_spark.operators.mixing import (
        share_weights,
        weighted_interleave,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = share_weights(df, "source", {"big": 0.5, "small": 0.5})
    # shallow prefix: without-replacement depletion is mild while
    # k << each source's row count (small has only 500 rows)
    head = weighted_interleave(
        df, "source", w, "doc_id", k=200, salt="eq"
    ).collect()
    small_share = sum(1 for r in head if r["source"] == "small") / 200
    # a 9:1 corpus scheduled ~50/50
    assert 0.40 < small_share < 0.58, small_share


# ---------------------------------------------------------------------------
# SFT pair mining
# ---------------------------------------------------------------------------


def test_turn_pairs_next_surviving_vs_strict_adjacent(spark):
    from etl_documentos_spark.operators.pairs import turn_pairs

    rows = [
        # conv a: user@1 -> assistant@2 (adjacent), user@4 -> assistant@7
        # (gap: turns 5-6 deleted), assistant@9 with no prompt before it
        ("a", 1, "user", "q1"),
        ("a", 2, "assistant", "r1"),
        ("a", 4, "user", "q2"),
        ("a", 7, "assistant", "r2"),
        ("a", 9, "assistant", "stray"),
        # conv b: user@1 followed by another user turn — no pair
        ("b", 1, "user", "q3"),
        ("b", 2, "user", "q4"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    loose = {
        (r["conv_id"], r["prompt_turn"], r["response_turn"])
        for r in turn_pairs(df, "user", "assistant").collect()
    }
    assert loose == {("a", 1, 2), ("a", 4, 7)}
    strict = {
        (r["conv_id"], r["prompt_turn"], r["response_turn"])
        for r in turn_pairs(
            df, "user", "assistant", adjacent_only=True
        ).collect()
    }
    assert strict == {("a", 1, 2)}


def test_fit_context_window_keeps_maximal_suffix(spark):
    from etl_documentos_spark.operators.pairs import fit_context_window

    rows = [
        # conv a: tokens oldest->newest 10, 10, 5, 3 — budget 10 keeps
        # newest (3) + next (5) = 8, adding 10 would blow it
        ("a", 1, "x" * 1), ("a", 2, "y" * 1), ("a", 3, "ab cde"),
        ("a", 4, "q r s"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    from pyspark.sql import functions as SF
    out = fit_context_window(
        df, 5, SF.size(SF.split("text", " ")), "conv_id", "turn_idx"
    ).collect()
    kept = sorted((r["turn_idx"], r["cum_tokens"]) for r in out)
    # newest first: turn4 (3 words, cum 3), turn3 (2 words, cum 5),
    # turn2 would make 6 > 5
    assert kept == [(3, 5), (4, 3)]
    # an over-budget newest turn drops the whole conversation
    big = spark.createDataFrame(
        [("b", 1, "a b"), ("b", 2, "w x y z q r")],
        "conv_id string, turn_idx int, text string",
    )
    out2 = fit_context_window(
        big, 5, SF.size(SF.split("text", " ")), "conv_id", "turn_idx"
    ).collect()
    assert out2 == []
