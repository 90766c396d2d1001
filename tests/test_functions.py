"""Unit tests for the scalar-function / dedup / similarity / multimodal layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_documentos_spark.functions import text as tx
from etl_documentos_spark.operators import dedup, similarity
from etl_documentos_spark.sources import multimodal


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_normalize_and_counts(spark):
    s = F.lit("  Olá, MUNDO!! 123  ")
    # builtin normalizer folds accents (reference NFD semantics)
    assert _one(spark, tx.normalize_text(s)) == "ola mundo 123"
    assert _one(spark, tx.word_count(s)) == 3
    # accent-strip UDF folds the accent instead of dropping the letter
    df = spark.createDataFrame([("Olá, MUNDO",)], "t string")
    assert df.select(tx.normalize_text_unicode("t").alias("v")).first()["v"] == (
        "ola, mundo"
    )


def test_builtin_normalizer_parity_with_unicode_udf(spark):
    """On the Latin corpus the builtin F.translate fold must equal the
    unicodedata NFD path: same normalized text, same fingerprints, so dedup
    groups are identical whichever normalizer produced them."""
    samples = [
        "Atenção: ÓBITO às 12h, São Paulo!",
        "pagamento em atraso — valor R$ 1.500,00 (muito útil)",
        "Ação judicial: côndominio, João & María",
        "no accents at all 42",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    out = df.select(
        tx.normalize_text("t").alias("builtin"),
        F.trim(
            F.regexp_replace(tx.normalize_text_unicode("t"), "[^a-z0-9]+", " ")
        ).alias("via_udf"),
        tx.fingerprint("t").alias("fp_builtin"),
        F.md5(
            F.trim(
                F.regexp_replace(
                    tx.normalize_text_unicode("t"), "[^a-z0-9]+", " "
                )
            )
        ).alias("fp_udf"),
    ).collect()
    for r in out:
        assert r["builtin"] == r["via_udf"], r
        assert r["fp_builtin"] == r["fp_udf"], r
    # the semantic point: accented and folded spellings fingerprint the same
    pair = spark.createDataFrame(
        [(1, "atenção"), (2, "atencao")], "doc_id long, text string"
    )
    from etl_documentos_spark.operators import dedup

    groups = dedup.dedup_exact(pair).collect()
    assert len(groups) == 1 and groups[0]["n_dupes"] == 2


def test_regex_extractors(spark):
    s = F.lit("R$ 1.500,00 em 15/01/2024 CPF 123.456.789-00 a@b.com.br")
    assert _one(spark, F.size(tx.extract_all(s, tx.RE_DATE_BR))) == 1
    assert _one(spark, F.size(tx.extract_all(s, tx.RE_CURRENCY_BRL))) == 1
    assert _one(spark, F.size(tx.extract_all(s, tx.RE_CPF))) == 1
    assert _one(spark, F.size(tx.extract_all(s, tx.RE_EMAIL))) == 1


def test_truncate_strip_html_sampling(spark):
    assert _one(spark, tx.truncate_ellipsis(F.lit("abcdefghij"), 8)) == "abcde..."
    assert _one(spark, tx.strip_html(F.lit("<p>hi <b>x</b></p>"))) == "hi x"
    long = "a" * 1000
    sampled = _one(spark, tx.head_middle_tail(F.lit(long), 10))
    assert len(sampled) < 1000 and " ... " in sampled


def test_jaccard_and_quality(spark):
    j = _one(spark, tx.jaccard_tokens(F.lit("a b c d"), F.lit("c d e f")))
    assert j == round(2 / 6, 4)
    q = _one(spark, tx.quality_score(F.lit("the quick brown fox is on the hill")))
    assert 0.0 < q <= 1.0


def test_lang_id_markers(spark):
    assert _one(spark, tx.lang_id(F.lit("the cat and the dog of the house"))) == "en"
    assert _one(spark, tx.lang_id(F.lit("el perro y la casa de los gatos"))) == "es"
    assert _one(spark, tx.lang_id(F.lit("der hund und die katze ist von"))) == "de"


def test_cpf_check_digits(spark):
    df = spark.createDataFrame(
        [("111.444.777-35",), ("111.444.777-36",), ("000.000.000-00",)],
        "cpf string",
    )
    got = [r["v"] for r in df.select(tx.cpf_valid("cpf").alias("v")).collect()]
    assert got == [True, False, False]


def test_cnpj_check_digits(spark):
    df = spark.createDataFrame(
        [("11.222.333/0001-81",),   # textbook valid CNPJ
         ("11.222.333/0001-80",),   # wrong check digit
         ("11.111.111/1111-11",),   # all-equal digits rejected
         ("12.345/678",),           # wrong length
         (None,)],
        "c string",
    )
    got = [r["v"] for r in df.select(tx.cnpj_valid("c").alias("v")).collect()]
    assert got == [True, False, False, False, None]


def test_quality_gated_fallback_semantics(spark):
    from etl_documentos_spark.operators.fallback import quality_gated_fallback

    df = spark.createDataFrame(
        [
            # (a_q, b_q, c_q): gate at 0.7
            (1, 0.9, 0.8, 0.1),   # first clears -> a
            (2, 0.2, 0.8, 0.9),   # a fails, b clears (priority over c) -> b
            (3, 0.3, 0.2, 0.1),   # none clear -> best quality -> a
            (4, 0.2, 0.5, 0.5),   # none clear, tie b/c -> earlier (b)
            (5, None, 0.1, None), # null qualities never gate nor win -> b
        ],
        "id long, qa double, qb double, qc double",
    )
    chosen = quality_gated_fallback(
        [
            ("a", F.lit("ra"), F.col("qa")),
            ("b", F.lit("rb"), F.col("qb")),
            ("c", F.lit("rc"), F.col("qc")),
        ],
        threshold=0.7,
    )
    out = {
        r["id"]: r["p"]
        for r in df.select("id", chosen.getField("provider").alias("p")).collect()
    }
    assert out == {1: "a", 2: "b", 3: "a", 4: "b", 5: "b"}


def test_dedup_exact_groups(spark):
    df = spark.createDataFrame(
        [(1, "Hello world"), (2, "hello, WORLD!"), (3, "other text")],
        "doc_id long, text string",
    )
    rows = {r["canonical_id"]: r["n_dupes"] for r in dedup.dedup_exact(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_jaccard_df_cap_defuses_hot_token(spark):
    """A token present in every doc must not create O(n^2) candidate pairs
    when the default df-cap is on; with the cap disabled it does."""
    n = 30
    rows = [(i, f"common unique{i}a unique{i}b unique{i}c") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # threshold 0 surfaces every candidate pair the join generates
    capped = dedup.near_dup_jaccard(df, threshold=0.0).count()
    uncapped = dedup.near_dup_jaccard(
        df, threshold=0.0, max_doc_frequency=None
    ).count()
    assert uncapped == n * (n - 1) // 2  # hot token pairs everything
    assert capped == 0  # cap drops the all-docs token before the join
    # real near-dups (sharing rare tokens) still pair up under the cap
    df2 = spark.createDataFrame(
        rows + [(n, "common unique0a unique0b unique0c")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_jaccard(
            df2, threshold=0.5, max_doc_frequency=0.2
        ).collect()
    }
    assert (0, n) in pairs


def test_minhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: documents sharing a substring of length >=
    k + window - 1 share at least one fingerprint; disjoint texts don't."""
    shared = "the quick brown fox jumped over the lazy dog today"
    df = spark.createDataFrame(
        [(1, "prefix one " + shared + " suffix alpha"),
         (2, "other start " + shared + " different tail"),
         (3, "completely unrelated words about spark catalyst plans")],
        "doc_id long, text string",
    )
    fps = {
        r["_id"]: set(r["fingerprints"])
        for r in dedup.winnow_fingerprints(df, k=8, window=4).collect()
    }
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3] and len(fps[3]) == 0)
    # identical docs -> identical fingerprint sets
    df2 = spark.createDataFrame(
        [(1, shared), (2, shared)], "doc_id long, text string"
    )
    fps2 = {
        r["_id"]: tuple(r["fingerprints"])
        for r in dedup.winnow_fingerprints(df2).collect()
    }
    assert fps2[1] == fps2[2]


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river"),
         (2, "the quick brown fox jumps over the lazy dog near the riverbank"),
         (3, "completely different words about spark query engines here")],
        "doc_id long, text string",
    )
    s = {r["_id"]: r["simhash"] for r in dedup.simhash(df, bits=16).collect()}
    d12 = bin(s[1] ^ s[2]).count("1")
    d13 = bin(s[1] ^ s[3]).count("1")
    assert d12 < d13


def test_cosine_topk_and_pandas_variant_agree(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    a = similarity.cosine_topk(df.filter("vec_id <> 0"), q, k=5).collect()
    b = similarity.cosine_topk_pandas(df.filter("vec_id <> 0"), q, k=5).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in a] == [
        (r["vec_id"], r["cosine_sim"]) for r in b
    ]


def test_ann_lsh_returns_bucket_subset(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    planes = [rows[i][1] for i in (1, 2, 3)]
    approx = similarity.ann_lsh_topk(df.filter("vec_id <> 0"), q, planes, k=5)
    got = approx.collect()
    assert 0 < len(got) <= 5
    exact = similarity.cosine_topk(df.filter("vec_id <> 0"), q, k=5).collect()
    # the approximate top-1 should be a strong neighbor (recall sanity)
    exact_ids = {r["vec_id"] for r in exact}
    assert any(r["vec_id"] in exact_ids for r in got)


def test_real_bmp_and_wav_decode_roundtrip(spark):
    """The BMP/WAV paths are genuine byte-level codecs: synthesize, decode,
    and check the decoded values against the generation rule."""
    df = spark.createDataFrame([(7,), (40,), (123,)], "doc_id long")
    bmp = {
        r["doc_id"]: r
        for r in multimodal.decode_bmp(
            multimodal.synth_bmp_payload(df)
        ).collect()
    }
    for i, r in bmp.items():
        w, h = 16 + i % 32, 8 + i % 16
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        want = 3 * sum(
            (i + x + y) % 256 for x in range(w) for y in range(h)
        )
        assert r["sum_pixels"] == want, (i, r)
    wav = {
        r["doc_id"]: r
        for r in multimodal.decode_wav(
            multimodal.synth_wav_payload(df)
        ).collect()
    }
    for i, r in wav.items():
        n = 100 + i % 50
        assert (r["n_channels"], r["sample_rate"], r["n_samples"]) == (1, 8000, n)
        want = sum((i * 31 + j * 7) % 2003 - 1001 for j in range(n))
        assert r["sum_samples"] == want, (i, r)


def test_ann_ivf_probe_subset_and_full_probe_exact(spark):
    """IVF with n_probe = #centroids degenerates to exact brute force;
    single-probe results are a subset of the exact top-k pool."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in vecs[0]]
    cents = [[float(x) for x in vecs[j]] for j in (1, 2, 3)]
    corpus = df.filter("vec_id <> 0")
    exact = [r["vec_id"] for r in similarity.cosine_topk(corpus, q, k=39).collect()]
    full = [
        r["vec_id"]
        for r in similarity.ann_ivf_topk(
            corpus, q, cents, k=39, n_probe=3
        ).collect()
    ]
    assert full == exact  # probing every list == brute force
    one = [
        r["vec_id"]
        for r in similarity.ann_ivf_topk(corpus, q, cents, k=10).collect()
    ]
    assert len(one) > 0 and set(one) <= set(exact)
    # ranking within the probed list preserves exact-cosine order
    assert one == [v for v in exact if v in set(one)][: len(one)]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "some text payload"), (2, "another payload")],
        "doc_id long, text string",
    )
    withbin = multimodal.with_binary_payload(df)
    meta = {r["doc_id"]: r for r in multimodal.binary_meta(withbin).collect()}
    assert meta[1]["n_bytes"] == len("some text payload")
    decoded = multimodal.decode_images(withbin).collect()
    assert len(decoded) == 2
    assert all(r["width"] > 0 and r["height"] > 0 for r in decoded)
    # deterministic stub: same payload -> same dims
    again = multimodal.decode_images(withbin).collect()
    assert sorted(map(tuple, decoded)) == sorted(map(tuple, again))
    frames = multimodal.sample_frames(withbin, n_frames=3).collect()
    assert len(frames) == 6
    assert {r["frame_idx"] for r in frames} == {0, 1, 2}
    # frame hash is sha256 over the UPPERCASE HEX of the byte slice (the
    # hex domain is what makes the DuckDB oracle able to recompute it)
    import hashlib

    data = b"some text payload"
    want = hashlib.sha256(
        data[: len(data) // 3].hex().upper().encode()
    ).hexdigest()
    f0 = next(
        r for r in frames if r["doc_id"] == 1 and r["frame_idx"] == 0
    )
    assert f0["frame_sha"] == want


def test_jaccard_default_cap_exact_on_small_corpus(spark):
    """Regression (r2 ADVICE): with default args on a corpus under 20 docs,
    int(0.05*n) truncated the df-cap to 0, every shared token was dropped,
    and the operator silently returned zero pairs. The cap floor keeps
    small batches exact."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark engines"),
            (4, "another distinct document with different words"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_jaccard(df, threshold=0.5).collect()
    }
    assert pairs == {(1, 2)}


def test_ann_lsh_multiprobe_recall(spark):
    """Multi-probe (flip the lowest-|margin| planes) must raise recall@10
    vs single-probe and reach >=0.9 on seeded data — the production recall
    lever for the 10^9-vector bucketed path."""
    import numpy as np

    rng = np.random.RandomState(42)
    # clustered corpus (the realistic ANN shape): 25 centers, points =
    # center + small noise, query = a perturbed member of cluster 0. True
    # neighbors are same-cluster and mostly share signature bits; the ones
    # that straddle a low-margin hyperplane are exactly what multi-probe
    # recovers.
    centers = rng.randn(25, 16) * 3.0
    rows = [
        (i, [float(x) for x in centers[i % 25] + rng.randn(16) * 0.5])
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter("vec_id <> 0").persist()
    q = [float(x) for x in centers[0] + rng.randn(16) * 0.5]
    planes = [[float(x) for x in rng.randn(16)] for _ in range(4)]

    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(corpus, q, k=10).collect()
    }
    got1 = {
        r["vec_id"]
        for r in similarity.ann_lsh_topk(
            corpus, q, planes, k=10, n_probe=1
        ).collect()
    }
    got4 = {
        r["vec_id"]
        for r in similarity.ann_lsh_topk(
            corpus, q, planes, k=10, n_probe=4
        ).collect()
    }
    corpus.unpersist()
    recall1 = len(got1 & exact) / len(exact)
    recall4 = len(got4 & exact) / len(exact)
    assert recall4 >= recall1
    assert recall4 >= 0.9, (recall1, recall4)
    # single-probe results are a subset of the multi-probe candidate pool
    # by construction (probe set includes the query bucket)
    assert got1 <= got4 | got1


def test_png_roundtrip_all_filters(spark):
    """synth_png_payload -> decode_png reproduces the generation rule for
    ids that start on each of the five PNG filter types; the payloads are
    spec-valid (signature, IHDR fields, zlib-inflatable IDAT)."""
    import struct
    import zlib

    from etl_documentos_spark.sources import multimodal

    df = spark.createDataFrame(
        [(i,) for i in range(5)], "doc_id long"
    )
    with_png = multimodal.synth_png_payload(df)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_png.collect()}
    for i, data in payloads.items():
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        w, h = struct.unpack(">II", data[16:24])
        assert (w, h) == (16 + i % 32, 8 + i % 16)
        # IDAT inflates and carries h scanlines of w+1 bytes with the
        # expected filter tags (id+y) % 5
        pos, idat = 8, b""
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos:pos + 4])
            if data[pos + 4:pos + 8] == b"IDAT":
                idat += data[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        assert len(raw) == h * (w + 1)
        assert [raw[y * (w + 1)] for y in range(h)] == [
            (i + y) % 5 for y in range(h)
        ]

    decoded = {r["doc_id"]: r for r in multimodal.decode_png(with_png).collect()}
    for i in range(5):
        r = decoded[i]
        w, h = 16 + i % 32, 8 + i % 16
        want = sum((i + x + y) % 256 for y in range(h) for x in range(w))
        assert (r["width"], r["height"]) == (w, h)
        assert r["bit_depth"] == 8 and r["color_type"] == 0
        assert r["sum_pixels"] == want, i


def test_jpeg_roundtrip_dc_exact(spark):
    """synth_jpeg_payload -> decode_jpeg reproduces the closed-form pixel
    sum: constant 8x8 blocks make the DCT DC-only and integer-exact, so
    the lossy JPEG chain round-trips bit-exactly through the full
    container (DQT/SOF0/DHT/SOS + Huffman entropy coding)."""
    from etl_documentos_spark.sources import multimodal

    df = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    got = {
        r["doc_id"]: r.asDict()
        for r in multimodal.decode_jpeg(
            multimodal.synth_jpeg_payload(df)
        ).collect()
    }
    for i, r in got.items():
        bw, bh = 2 + i % 4, 1 + i % 3
        assert (r["width"], r["height"]) == (8 * bw, 8 * bh)
        assert (r["precision"], r["n_components"]) == (8, 1)
        want = sum(
            64 * ((i + 17 * bx + 29 * by) % 256)
            for by in range(bh)
            for bx in range(bw)
        )
        assert r["sum_pixels"] == want, i


def test_jpeg_decoder_handles_ac_runs():
    """The decoder's AC path (run/size coding, ZRL for >15-zero runs, EOB,
    negative coefficients) matches an independent numpy IDCT reference on
    random non-constant blocks — proving the general baseline path, not
    just the DC-only corpus shape. No Spark needed: pure codec test."""
    import numpy as np

    from etl_documentos_spark.sources import multimodal as mm

    rng = np.random.default_rng(11)
    x = np.arange(8)
    basis = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    basis[0] /= np.sqrt(2.0)
    zz = np.array(mm._JPEG_ZIGZAG)
    for _ in range(25):
        bw, bh = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        blocks, ref = [], np.zeros((bh * 8, bw * 8), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64, dtype=np.int64)
                blk[0] = int(rng.integers(-1016, 1017))
                # force a ZRL case sometimes: lone coefficient at k>=32
                for k in rng.choice(
                    np.arange(1, 64),
                    size=int(rng.integers(0, 5)),
                    replace=False,
                ):
                    blk[k] = int(rng.integers(-200, 201)) or 1
                blocks.append(blk.tolist())
                fb = np.zeros(64)
                fb[zz] = blk
                sp = basis.T @ fb.reshape(8, 8) @ basis + 128.0
                ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                    np.rint(sp), 0, 255
                ).astype(np.int64)
        data = mm._encode_baseline_jpeg(blocks, bw, bh, 8 * bw, 8 * bh)
        w, h, prec, ncomp, s = mm._decode_baseline_jpeg(data)
        assert (w, h) == (8 * bw, 8 * bh)
        assert s == int(ref.sum())


def test_lzw_roundtrip_width_growth_and_table_full():
    """GIF-variant LZW: decode(encode(x)) == x across data that (a) is
    random/incompressible, (b) is repetitive enough to grow the code width
    to 12 bits and overflow the 4096-entry table (forcing a mid-stream
    CLEAR), and (c) hits the cScSc special case; both small and 8-bit
    minimum code sizes."""
    import random

    from etl_documentos_spark.sources.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rnd = random.Random(11)
    cases = [
        b"",
        b"\x00",
        b"ababababab",  # cScSc territory
        bytes(rnd.randrange(256) for _ in range(20_000)),
        bytes(rnd.randrange(4) for _ in range(60_000)),  # table overflow
        bytes(range(256)) * 40,
    ]
    for mcs in (2, 8):
        for data in cases:
            if mcs == 2:
                data = bytes(b % 4 for b in data)
            assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data
    # repetitive input must actually compress (real LZW, not literal codes)
    rep = b"abcabcabc" * 1000
    assert len(_lzw_encode(rep, 8)) < len(rep) // 4


def test_gif_animated_roundtrip_and_frame_sampling(spark):
    """synth_gif_payload -> decode_gif / sample_gif_frames reproduce the
    generation rule: per-frame pixel sums, frame counts, and presentation
    timestamps accumulated from the per-frame GCE delays. Payloads are
    spec-valid GIF89a (signature, screen descriptor, trailer)."""
    import struct

    from etl_documentos_spark.sources import multimodal

    ids = [0, 1, 3, 7, 12, 123]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    with_gif = multimodal.synth_gif_payload(df)

    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_gif.collect()}
    for i, data in payloads.items():
        assert data[:6] == b"GIF89a" and data[-1] == 0x3B
        w, h = struct.unpack("<HH", data[6:10])
        assert (w, h) == (8 + i % 16, 8 + i % 8)

    decoded = {r["doc_id"]: r for r in multimodal.decode_gif(with_gif).collect()}
    for i in ids:
        w, h, nf = 8 + i % 16, 8 + i % 8, 2 + i % 4
        want = sum(
            (i + x + y + 7 * f) % 256
            for f in range(nf) for y in range(h) for x in range(w)
        )
        r = decoded[i]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["sum_pixels"] == want, i

    sampled = multimodal.sample_gif_frames(with_gif, n_samples=2).collect()
    assert len(sampled) == 2 * len(ids)
    for r in sampled:
        i = r["doc_id"]
        nf = 2 + i % 4
        fi = (r["sample_idx"] * nf) // 2
        assert r["frame_idx"] == fi
        assert r["frame_ts_ms"] == 10 * sum(
            (i + g) % 10 + 1 for g in range(fi)
        )
        w, h = 8 + i % 16, 8 + i % 8
        assert r["frame_sum"] == sum(
            (i + x + y + 7 * fi) % 256 for y in range(h) for x in range(w)
        )


def test_tiff_lzw_roundtrip():
    """TIFF-variant LZW (MSB-first, early change) roundtrips arbitrary
    bytes, including inputs long enough to force width 12 + table resets,
    and actually compresses repetitive input."""
    import random

    from etl_documentos_spark.sources.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = random.Random(11)
    for trial in range(60):
        n = rng.randrange(0, 4000)
        data = (
            bytes(rng.randrange(256) for _ in range(n))
            if trial % 3
            else bytes(rng.choices(range(4), k=n))
        )
        assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
    long_run = bytes([1, 2, 3] * 30_000)  # forces CLEAR-based table resets
    assert _tiff_lzw_decode(_tiff_lzw_encode(long_run)) == long_run
    wide = bytes(range(256)) * 60  # forces the 12-bit width ceiling
    assert _tiff_lzw_decode(_tiff_lzw_encode(wide)) == wide
    rep = b"abcabcabc" * 1000
    assert len(_tiff_lzw_encode(rep)) < len(rep) // 4


def test_tiff_decode_both_compressions(spark):
    """synth_tiff_payload -> decode_tiff reproduces the generation rule for
    both Compression=1 (even ids) and Compression=5/LZW (odd ids); payloads
    are spec-valid little-endian baseline TIFF."""
    import struct

    from etl_documentos_spark.sources import multimodal

    ids = [0, 1, 2, 7, 31, 996, 997]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    with_tiff = multimodal.synth_tiff_payload(df)

    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_tiff.collect()}
    for i, data in payloads.items():
        assert data[:4] == b"II" + struct.pack("<H", 42)

    decoded = {
        r["doc_id"]: r for r in multimodal.decode_tiff(with_tiff).collect()
    }
    for i in ids:
        w, h = 16 + i % 32, 8 + i % 16
        want = sum((i + x + y) % 256 for y in range(h) for x in range(w))
        r = decoded[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["compression"] == (1 if i % 2 == 0 else 5)
        assert r["sum_pixels"] == want, i
    # LZW strips must be smaller than raw on these gradient rasters
    for i in ids:
        if i % 2 == 1:
            w, h = 16 + i % 32, 8 + i % 16
            assert len(payloads[i]) < 8 + w * h + 2 + 9 * 12 + 4


def test_ann_recall_at_scale(spark):
    """Recall@10 >= 0.9 at the DOCUMENTED defaults on a 10^5-vector
    clustered corpus, driving the real operators: LSH-multitable (4 tables
    x 12 planes, n_probe=4; measured ~0.94 — tools/ann_recall.py) and IVF
    (n_probe=4; measured 1.0 at both 64 and 256 lists — 64 here for the
    smaller literal tree). Ground truth is an independent numpy
    exact-cosine oracle; 3 seeded queries keep the suite fast, the full
    50-query grid lives in tools/ann_recall.py."""
    import os
    import sys

    import numpy as np
    import pandas as pd

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from ann_recall import (  # the study's deterministic corpus + oracle
        DIM,
        SEED,
        kmeans_lite,
        make_corpus,
        topk_ids,
    )

    from etl_documentos_spark.operators import similarity

    n, k, n_queries = 100_000, 10, 3
    vecs, centers = make_corpus(n)
    rng = np.random.default_rng(SEED + 1)
    qidx = rng.integers(0, 200, size=n_queries)
    queries = (centers[qidx] + 0.35 * rng.normal(size=(n_queries, DIM))).astype(
        np.float32
    )
    all_ids = np.arange(n, dtype=np.int64)
    truth = [set(topk_ids(vecs, all_ids, q, k)) for q in queries]

    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": all_ids, "embedding": list(map(list, vecs))}
        )
    ).persist()
    df.count()
    try:
        tables = [
            [
                list(map(float, p))
                for p in np.random.default_rng(SEED + 100 + t).normal(
                    size=(12, DIM)
                )
            ]
            for t in range(4)
        ]
        cents = [list(map(float, c)) for c in kmeans_lite(vecs, 64)]

        for name, fetch in (
            (
                "lsh_multitable",
                lambda qv: similarity.ann_lsh_topk_multitable(
                    df, qv, tables, k=k, n_probe=4
                ),
            ),
            (
                "ivf",
                lambda qv: similarity.ann_ivf_topk(
                    df, qv, cents, k=k, n_probe=4
                ),
            ),
        ):
            hits = 0
            for qi, q in enumerate(queries):
                got = {
                    r["vec_id"]
                    for r in fetch(list(map(float, q))).collect()
                }
                hits += len(truth[qi] & got)
            recall = hits / (k * n_queries)
            assert recall >= 0.9, (name, recall)
    finally:
        df.unpersist()


def test_vp8l_prefix_code_machinery():
    """The VP8L prefix-code plumbing is general, not roundtrip-fitted: the
    decoder handles simple codes, normal codes with 16/17/18 repeats, and
    every stream built from random symbol histograms decodes back to the
    exact symbol sequence."""
    import random

    from etl_documentos_spark.sources.multimodal import (
        _LsbBitReader,
        _LsbBitWriter,
        _canonical_codes,
        _huffman_lengths,
        _read_code,
        _write_normal_code,
        _write_simple_code,
    )

    rng = random.Random(5)
    for trial in range(40):
        n_sym = rng.randrange(2, 80)
        alphabet = rng.sample(range(256), n_sym)
        seq = [rng.choice(alphabet) for _ in range(rng.randrange(1, 400))]
        counts = {}
        for s in seq:
            counts[s] = counts.get(s, 0) + 1
        lengths = _huffman_lengths(counts)
        bw = _LsbBitWriter()
        _write_normal_code(bw, lengths, 256)
        codes = _canonical_codes(lengths)
        for s in seq:
            c, ln = codes[s]
            bw.write_code(c, ln)
        br = _LsbBitReader(bw.bytes())
        dec = _read_code(br, 256)
        assert [dec.read(br) for _ in seq] == seq
    # simple codes: 1 and 2 symbols, small and 8-bit values
    for syms in ([0], [1], [200], [3, 77], [0, 255]):
        bw = _LsbBitWriter()
        _write_simple_code(bw, syms)
        br = _LsbBitReader(bw.bytes())
        dec = _read_code(br, 256)
        got = sorted({dec.read(br) for _ in range(16)} if len(syms) == 1
                     else [dec.read(br) for _ in range(2)])
        if len(syms) == 1:
            assert got == syms
    # zero-run repeat codes (17/18) and prev-repeat (16): hand-built stream
    bw = _LsbBitWriter()
    bw.write(0, 1)          # normal code
    bw.write(19 - 4, 4)     # all 19 code-length slots
    # flat 3-bit lengths for symbols {0,8,16,17,18} -> canonical, complete
    from etl_documentos_spark.sources.multimodal import _VP8L_CL_ORDER
    cl = {0: 3, 8: 2, 16: 3, 17: 3, 18: 3}
    for s in _VP8L_CL_ORDER:
        bw.write(cl.get(s, 0), 3)
    bw.write(0, 1)          # no max_symbol shortcut
    ccodes = _canonical_codes(cl)
    def emit(sym, extra=None, nbits=0):
        c, ln = ccodes[sym]
        bw.write_code(c, ln)
        if extra is not None:
            bw.write(extra, nbits)
    emit(8)                 # symbol 0 gets length 8
    emit(16, 0, 2)          # repeat len 8 three more times (syms 1-3)
    emit(17, 0, 3)          # 3 zeros (syms 4-6)
    emit(18, 0, 7)          # 11 zeros (syms 7-17)
    emit(8)                 # symbol 18 length 8
    # syms 0-3 and 18 all got length 8 -> canonical codes 0..4 in symbol
    # order; append each code so the decoder must resolve them
    for v in range(5):
        bw.write_code(v, 8)
    br = _LsbBitReader(bw.bytes())
    dec = _read_code(br, 19)
    assert [dec.read(br) for _ in range(5)] == [0, 1, 2, 3, 18]


def test_webp_decode_matches_rule(spark):
    """synth_webp_payload -> decode_webp reproduces the generation rule;
    payloads are container-valid RIFF/WEBP/VP8L."""
    from etl_documentos_spark.sources import multimodal

    ids = [0, 1, 7, 15, 42, 997, 123456]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    with_webp = multimodal.synth_webp_payload(df)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in with_webp.collect()}
    for i, data in payloads.items():
        assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
        assert len(data) % 2 == 0  # RIFF chunks are always padded to even
    decoded = {r["doc_id"]: r for r in multimodal.decode_webp(with_webp).collect()}
    for i in ids:
        w, h = 8 + i % 16, 4 + i % 8
        want = sum((i + x + y) % 256 for y in range(h) for x in range(w))
        r = decoded[i]
        assert (r["width"], r["height"], r["alpha_hint"], r["sum_green"]) == (
            w, h, 0, want
        )


def test_webp_decoder_rejects_garbage():
    from etl_documentos_spark.sources.multimodal import _decode_vp8l
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _decode_vp8l(b"RIFF\x00\x00\x00\x00NOPE")
    with _pytest.raises(ValueError):
        _decode_vp8l(b"\x89PNG\r\n\x1a\n")


def test_strip_boilerplate(spark):
    """C4-style corpus-level line dedup: a line in >= min_docs distinct
    docs is dropped everywhere; survivors keep original order; a doc of
    pure boilerplate degrades to empty, not to a lost row."""
    from etl_documentos_spark.operators.linedup import (
        boilerplate_lines,
        explode_lines,
        strip_boilerplate,
    )

    rows = [
        (1, "cookie banner\nalpha body text\nall rights reserved"),
        (2, "cookie banner\nbeta body text\nall rights reserved"),
        (3, "cookie banner\ngamma body text\nall rights reserved"),
        (4, "cookie banner\nall rights reserved"),  # pure boilerplate
        (5, "standalone document\nnothing shared here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    boiler = {
        r.line: r.n_docs
        for r in boilerplate_lines(explode_lines(df), min_docs=3).collect()
    }
    assert boiler == {"cookie banner": 4, "all rights reserved": 4}
    out = {
        r.doc_id: r for r in strip_boilerplate(df, min_docs=3).collect()
    }
    assert len(out) == 5  # pure-boilerplate doc 4 survives as a row
    assert out[1].text_clean == "alpha body text"
    assert out[1].n_lines == 3 and out[1].n_dropped == 2
    assert out[4].text_clean == "" and out[4].n_dropped == 2
    assert out[5].n_dropped == 0
    assert out[5].text_clean == "standalone document\nnothing shared here"
    # duplicate lines WITHIN one doc don't cross the distinct-doc gate
    solo = spark.createDataFrame(
        [(9, "same line\nsame line\nsame line\nother")],
        "doc_id long, text string",
    )
    assert boilerplate_lines(explode_lines(solo), min_docs=3).count() == 0


def test_gopher_flags(spark):
    from etl_documentos_spark.functions.quality import gopher_flags

    good = "the quick brown foxes jumped over a lazy sleeping hound " * 8
    short = "too short to pass"
    symbols = "#### " * 30 + "the of to in is wordy tokens flowing onward " * 8
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in df.select("doc_id", *gopher_flags("text")).collect()}
    assert out[1].gopher_pass is True
    assert out[1].ok_n_words and out[1].ok_mean_wlen
    assert out[2].ok_n_words is False and out[2].gopher_pass is False
    assert out[3].ok_symbol is False and out[3].gopher_pass is False
    assert out[3].n_stop_distinct >= 2


def test_repetition_stats(spark):
    from etl_documentos_spark.functions.quality import repetition_stats

    rows = [
        (1, "alpha beta\ngamma delta\nalpha beta\nalpha beta"),
        (2, "spam spam spam spam spam ham"),
        (3, "one line only with varied words here indeed"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert len(out) == 4
    r1 = out[1]  # 4 lines, "alpha beta" x3 -> 2 repeats of 4 lines
    assert r1.n_lines == 4 and abs(r1.dup_line_frac - 0.5) < 1e-9
    assert r1.ok_dup_lines is False and r1.repetition_pass is False
    r2 = out[2]  # bigrams: spam-spam x4, spam-ham x1 -> 0.8 dominance
    assert r2.top_bigram == "spam spam"
    assert abs(r2.top_bigram_frac - 0.8) < 1e-9
    assert r2.ok_top_bigram is False and r2.repetition_pass is False
    # all-unique bigrams tie-break deterministically (lexicographic min)
    assert out[3].top_bigram == "here indeed"
    assert out[3].repetition_pass is True
    # empty doc degrades gracefully, passes both gates
    assert out[4].n_lines == 0 and out[4].top_bigram == ""
    assert out[4].repetition_pass is True


def test_ngram_contamination(spark):
    from etl_documentos_spark.operators.decontaminate import (
        ngram_contamination,
    )

    ev = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words then the secret benchmark answer is forty two exactly and more"),
            (2, "totally unrelated text with no overlap whatsoever present"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in ngram_contamination(corpus, ev, n=8).collect()
    }
    assert len(out) == 3  # clean docs included with zero counts
    assert out[1].contaminated is True and out[1].n_eval_hits >= 1
    assert out[2].contaminated is False and out[2].n_eval_hits == 0
    assert out[3].contaminated is False  # shorter than n never matches
    # threshold gates the flag without changing the counts
    strict = {
        r.doc_id: r
        for r in ngram_contamination(corpus, ev, n=8, threshold=99).collect()
    }
    assert strict[1].contaminated is False
    assert strict[1].n_eval_hits == out[1].n_eval_hits


def test_unigram_lm_score(spark):
    """Hand-checkable corpus: vocab cutoff, OOV floor, per-doc mean."""
    import math

    from etl_documentos_spark.functions.quality import unigram_lm_score

    df = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a b c"),
            (3, "zzz"),
        ],
        "doc_id long, text string",
    )
    # tokens: a=3, b=2, c=1, zzz=1 -> total 7; k=2 keeps {a, b}
    got = {
        r.doc_id: (r.n_tokens, r.mean_logp)
        for r in unigram_lm_score(df, k_vocab=2, alpha=0.5).collect()
    }
    pa, pb, floor = (
        math.log10(3 / 7), math.log10(2 / 7), math.log10(0.5 / 7)
    )
    assert got[1][0] == 3 and abs(got[1][1] - (2 * pa + pb) / 3) < 1e-12
    assert got[2][0] == 3 and abs(got[2][1] - (pa + pb + floor) / 3) < 1e-12
    assert got[3][0] == 1 and abs(got[3][1] - floor) < 1e-12
    # boilerplate scores higher than noise
    assert got[1][1] > got[3][1]
