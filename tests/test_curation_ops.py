"""Unit tests for the round-3 curation operators: Gopher repetition /
quality metrics, PII redaction, winnowing fingerprints, mixture
upsampling. Crafted inputs exercise the branches the synthetic corpus
can't (bullets, ellipses, duplicate lines, real-looking PII, overlap
guarantees, fractional multipliers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    dedup as dd,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    sampling as sp,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    text as tx,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


# ---------------------------------------------------------------------------
# Gopher metrics
# ---------------------------------------------------------------------------


def test_dup_line_fraction_counts_repeats(spark):
    t = "aaa\nbbb\naaa\nccc\naaa"  # 5 lines, 3 distinct -> 2/5
    assert _one(spark, t, tx.dup_line_fraction(F.col("text"))) == pytest.approx(0.4)
    assert _one(spark, "x\ny", tx.dup_line_fraction(F.col("text"))) == 0.0


def test_bullet_and_ellipsis_line_fractions(spark):
    t = "- first bullet\n* second bullet\nplain line\nto be continued...\nend"
    assert _one(spark, t, tx.bullet_line_fraction(F.col("text"))) == pytest.approx(0.4)
    assert _one(spark, t, tx.ellipsis_line_fraction(F.col("text"))) == pytest.approx(0.2)


def test_mean_word_length_and_symbol_ratio(spark):
    t = "ab cdef"  # 6 non-ws chars / 2 tokens = 3.0
    assert _one(spark, t, tx.mean_word_length(F.col("text"))) == pytest.approx(3.0)
    t2 = "see # and # more ..."  # 2 hashes + 1 ellipsis over 6 tokens
    assert _one(spark, t2, tx.symbol_word_ratio(F.col("text"))) == pytest.approx(0.5, abs=1e-6)


def test_alpha_word_fraction_ignores_numeric_tokens(spark):
    t = "abc 123 d4 ... 99"  # alpha-bearing: abc, d4 -> 2/5
    assert _one(spark, t, tx.alpha_word_fraction(F.col("text"))) == pytest.approx(0.4)


def test_gopher_pass_word_count_and_symbol_gates(spark):
    good = " ".join(f"word{i % 7}x" for i in range(80))
    assert _one(spark, good, tx.gopher_pass(F.col("text"))) == 1
    # too short
    assert _one(spark, "only three words", tx.gopher_pass(F.col("text"))) == 0
    # symbol-heavy: every other token is '#'
    noisy = " ".join("word #".split() * 60)
    assert _one(spark, " ".join(["word", "#"] * 60), tx.gopher_pass(F.col("text"))) == 0
    del noisy


def test_gopher_pass_rejects_duplicate_lines(spark):
    line = "some repeated line of text here"
    t = "\n".join([line] * 9 + ["a unique closing line of text"])  # 80% dup lines
    assert _one(spark, t, tx.gopher_pass(F.col("text"), min_tokens=10)) == 0


def test_reline_preserves_tokens_and_makes_lines(spark):
    t = " ".join(f"t{i}" for i in range(12))
    relined = _one(spark, t, tx.reline(F.col("text"), tokens_per_line=5))
    assert relined.count("\n") == 2
    assert relined.replace("\n", " ") == t


def test_top_ngram_stats_finds_dominant_bigram(spark):
    df = spark.createDataFrame(
        [
            (1, "spark rocks spark rocks spark rocks indeed"),
            (2, "one two"),
            (3, "solo"),  # < 2 tokens -> excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.top_ngram_stats(df).collect()}
    assert rows[1]["top_gram"] == "spark rocks"
    assert rows[1]["gram_count"] == 3
    # 3 * len("spark rocks")=11 -> 33 chars of 42
    assert rows[1]["top_gram_char_frac"] == pytest.approx(33 / 42, abs=1e-6)
    assert rows[2]["top_gram"] == "one two" and rows[2]["gram_count"] == 1
    assert 3 not in rows


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_redaction_replaces_all_classes(spark):
    t = "mail a.b+c@ex.co and 10.1.2.3 or call +4915112345678 done"
    red = _one(spark, t, tx.redact_pii(F.col("text")))
    assert red == "mail <EMAIL> and <IP> or call <PHONE> done"
    counts = tx.pii_counts(F.col("text"))
    df = spark.createDataFrame([(t,)], "text string").select(
        *[c.alias(n) for n, c in counts.items()]
    )
    r = df.first()
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_pii_email_redacted_before_ip_and_phone(spark):
    # the email's digit runs must not be re-matched as IP/phone
    t = "x 1.2.3.4me@d1.example.org y"
    red = _one(spark, t, tx.redact_pii(F.col("text")))
    assert red == "x <EMAIL> y"


def test_pii_clean_text_untouched(spark):
    t = "no pii here, just 1.2 version numbers and + signs"
    assert _one(spark, t, tx.redact_pii(F.col("text"))) == t


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------


def _winnow_set(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_id long, text string")
    out = {}
    for r in dd.winnow_fingerprints(df, **kw).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantees: any shared substring of length k+window-1
    # (= 11 here) yields at least one shared fingerprint.
    shared = "abcdefghijklmnop"  # 16 chars >> 11
    fps = _winnow_set(
        spark,
        [(1, f"xx {shared} yy"), (2, f"completely other prefix {shared}")],
        k=8, window=4,
    )
    assert fps[1] & fps[2], "no shared fingerprint for a shared substring"


def test_winnow_disjoint_texts_disjoint_fps(spark):
    fps = _winnow_set(
        spark,
        [(1, "aaaaaaaaaaaaaaaaaaaaaaaa"), (2, "zzzzzzzzzzzzzzzzzzzzzzzz")],
        k=8, window=4,
    )
    assert not (fps[1] & fps[2])


def test_winnow_whitespace_normalization(spark):
    fps = _winnow_set(
        spark,
        [(1, "The  quick   brown fox jumps"), (2, "the quick brown fox jumps")],
        k=8, window=4,
    )
    assert fps[1] == fps[2]


def test_winnow_short_text_single_gram(spark):
    fps = _winnow_set(spark, [(1, "abc")], k=8, window=4)
    assert len(fps[1]) == 1


# ---------------------------------------------------------------------------
# Mixture upsampling
# ---------------------------------------------------------------------------


def _mix_df(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_repeat_upsample_integer_multipliers(spark):
    out = sp.repeat_upsample(
        _mix_df(spark), "lang", {"en": 2.0, "zh": 3.0}, key_cols=["doc_id"]
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 200, "zh": 300}


def test_repeat_upsample_fractional_and_zero(spark):
    out = sp.repeat_upsample(
        _mix_df(spark), "lang", {"en": 2.5, "zh": 0.0}, key_cols=["doc_id"], seed=5
    )
    rows = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    counts = {r["lang"]: r["n"] for r in rows}
    assert "zh" not in counts  # multiplier 0 -> rows vanish
    assert 200 <= counts["en"] <= 300  # 100 docs x (2 or 3 copies)
    # deterministic: same seed, same result
    again = sp.repeat_upsample(
        _mix_df(spark).repartition(7), "lang", {"en": 2.5, "zh": 0.0},
        key_cols=["doc_id"], seed=5,
    )
    assert again.count() == counts["en"]


def test_repeat_upsample_copy_idx_contiguous(spark):
    out = sp.repeat_upsample(
        _mix_df(spark).limit(10), "lang", {"en": 3.0, "zh": 1.0}, key_cols=["doc_id"]
    )
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.min("copy_idx").alias("lo"), F.max("copy_idx").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    for r in per_doc:
        assert r["lo"] == 1 and r["hi"] == r["n"]


def test_repeat_upsample_rejects_negative(spark):
    with pytest.raises(ValueError):
        sp.repeat_upsample(_mix_df(spark), "lang", {"en": -1.0}, key_cols=["doc_id"])


# ---------------------------------------------------------------------------
# Round-5 operators: paragraph dedup, hashed-ngram classifier, Bloom
# decontamination, weighted A-ES sampling, SemDeDup.
# ---------------------------------------------------------------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_drops_only_frequent(spark):
    # "x y" appears 3 times (across docs), unique lines once each.
    rows = [
        (1, "x y\nunique one"),
        (2, "x y\nunique two"),
        (3, "x y\nunique three"),
    ]
    out = {
        r["doc_id"]: r
        for r in dd.paragraph_dedup(
            _docs_df(spark, rows), min_freq=3, tokens_per_line=None
        ).collect()
    }
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["cleaned_text"] == "unique one"
    assert out[2]["cleaned_text"] == "unique two"


def test_paragraph_dedup_all_boilerplate_doc_survives_empty(spark):
    rows = [(i, "same line") for i in range(1, 6)]
    out = dd.paragraph_dedup(
        _docs_df(spark, rows), min_freq=5, tokens_per_line=None
    ).collect()
    assert len(out) == 5
    assert all(r["cleaned_text"] == "" and r["cleaned_chars"] == 0 for r in out)
    assert all(r["n_kept"] == 0 for r in out)


def test_paragraph_dedup_within_doc_repeats_count_occurrences(spark):
    # The same line 3x inside ONE doc reaches min_freq=3 alone.
    rows = [(1, "rep\nrep\nrep\nkeep me")]
    r = dd.paragraph_dedup(
        _docs_df(spark, rows), min_freq=3, tokens_per_line=None
    ).collect()[0]
    assert r["n_paras"] == 4 and r["n_kept"] == 1
    assert r["cleaned_text"] == "keep me"


def test_classifier_short_docs_get_drop_label(spark):
    rows = [(1, "single"), (2, ""), (3, "two tokens here and more words now")]
    out = {r["doc_id"]: r for r in tx.hashed_ngram_classifier(_docs_df(spark, rows)).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["score_sum"] == 0
    assert out[1]["label"] == "drop"
    assert out[2]["n_bigrams"] == 0
    assert out[3]["n_bigrams"] == 6


def test_classifier_deterministic_and_seed_sensitive(spark):
    rows = [(i, f"alpha beta gamma delta {i}") for i in range(20)]
    df = _docs_df(spark, rows)
    a = {r["doc_id"]: r["score_sum"] for r in tx.hashed_ngram_classifier(df, seed=41).collect()}
    b = {r["doc_id"]: r["score_sum"] for r in tx.hashed_ngram_classifier(df, seed=41).collect()}
    c = {r["doc_id"]: r["score_sum"] for r in tx.hashed_ngram_classifier(df, seed=42).collect()}
    assert a == b
    assert a != c


def test_bloom_no_false_negatives(spark):
    """Every doc the EXACT contamination check flags must be bloom-
    flagged (Bloom filters never produce false negatives)."""
    from .conftest import SF_SMOKE
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )

    docs = read_testdata(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    exact = {
        r["doc_id"]
        for r in dd.ngram_contamination(corpus, bench, shingle_n=3).collect()
    }
    bloom_flagged = {
        r["doc_id"]
        for r in dd.bloom_decontaminate(corpus, bench, n_words=256)
        .filter(F.col("contaminated"))
        .collect()
    }
    assert exact <= bloom_flagged


def test_bloom_fp_rate_drops_with_bitmap_size(spark):
    """More words -> fewer (deterministic) false positives; and a
    comfortably-sized bitmap keeps the FP count sane on the smoke SF."""
    from .conftest import SF_SMOKE
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )

    docs = read_testdata(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)

    def n_flagged(words):
        return (
            dd.bloom_decontaminate(corpus, bench, n_words=words)
            .filter(F.col("contaminated"))
            .count()
        )

    small, large = n_flagged(64), n_flagged(1024)
    assert large <= small


def test_weighted_sample_contract(spark):
    rows = [(i, "t", (i % 7) + 1) for i in range(1, 101)] + [(999, "t", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    out = sp.weighted_sample_topk(df, "w", 10, key_cols=["doc_id"], seed=3).collect()
    assert len(out) == 10
    assert sorted(r["samp_rank"] for r in out) == list(range(1, 11))
    assert all(r["doc_id"] != 999 for r in out)  # zero weight never selected
    again = sp.weighted_sample_topk(df, "w", 10, key_cols=["doc_id"], seed=3).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}
    other = sp.weighted_sample_topk(df, "w", 10, key_cols=["doc_id"], seed=4).collect()
    assert {r["doc_id"] for r in out} != {r["doc_id"] for r in other}


def test_weighted_sample_favors_heavy_rows(spark):
    """Statistical sanity: with weights 1000:1 the heavy rows dominate
    the sample (deterministic given the seed, so no flake)."""
    rows = [(i, "t", 1000) for i in range(50)] + [(i, "t", 1) for i in range(50, 100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    out = sp.weighted_sample_topk(df, "w", 20, key_cols=["doc_id"], seed=11).collect()
    heavy = sum(1 for r in out if r["doc_id"] < 50)
    assert heavy >= 16


def test_semdedup_cluster1_equals_exact(spark):
    from .conftest import SF_SMOKE
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        similarity as sim,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"]: r["status"] for r in sim.semdedup(emb, threshold=0.4).collect()}
    one = {
        r["vec_id"]: r["status"]
        for r in sim.semdedup(emb, threshold=0.4, n_clusters=1).collect()
    }
    assert exact == one
    clustered_drops = {
        r["vec_id"]
        for r in sim.semdedup(emb, threshold=0.4, n_clusters=8).collect()
        if r["status"] == "drop"
    }
    exact_drops = {k for k, v in exact.items() if v == "drop"}
    assert clustered_drops <= exact_drops
    assert len(clustered_drops) > 0


def test_semdedup_distributed_trainer_properties(spark):
    """The distributed quantizer tier holds the same semantic
    invariants as the sample trainer: n_clusters=1 collapses to the
    exact sweep, and clustered drops are a subset of exact drops."""
    from .conftest import SF_SMOKE
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        similarity as sim,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"]: r["status"] for r in sim.semdedup(emb, threshold=0.4).collect()}
    one = {
        r["vec_id"]: r["status"]
        for r in sim.semdedup(
            emb, threshold=0.4, n_clusters=1, n_iter=2, train="distributed"
        ).collect()
    }
    assert exact == one
    drops = {
        r["vec_id"]
        for r in sim.semdedup(
            emb, threshold=0.4, n_clusters=8, n_iter=3, train="distributed"
        ).collect()
        if r["status"] == "drop"
    }
    assert drops <= {k for k, v in exact.items() if v == "drop"}


def test_chunk_documents_overlap_invariants(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = _docs_df(spark, [(1, text)])
    out = sorted(
        tx.chunk_documents(df, chunk_tokens=32, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # ceil((100-8)/24) = 4 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    toks = [r["chunk_text"].split(" ") for r in out]
    assert all(len(t) == 32 for t in toks[:-1])
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(toks, toks[1:]):
        assert a[-8:] == b[:8]
    # every token covered, case preserved
    assert toks[0][0] == "w0" and toks[-1][-1] == "w99"
    assert out[-1]["n_tokens"] == 100 - 3 * 24


def test_chunk_documents_short_doc_single_chunk(spark):
    df = _docs_df(spark, [(1, "only three tokens")])
    out = tx.chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "only three tokens"
    assert out[0]["n_tokens"] == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _docs_df(spark, [(1, "x")])
    with pytest.raises(ValueError):
        tx.chunk_documents(df, chunk_tokens=16, overlap=16)


def test_validate_constraints_null_is_violation(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.checks import (
        validate_constraints,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (1, 7.0)],
        "k long, v double",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in validate_constraints(
            df,
            row_rules={"v_positive": F.col("v") > 0},
            unique_keys={"k_unique": ["k"]},
        ).collect()
    }
    # NULL predicate = violation (three-valued logic), plus the -5 row.
    assert out["v_positive"] == 2
    assert out["k_unique"] == 1


def test_binaryfile_source_roundtrip_decode(spark, tmp_path):
    """Multimodal INGESTION path: PNG payloads written as individual
    files, read back through Spark's built-in binaryFile source, and
    decoded — geometry must match the direct in-memory decode. This is
    how real image corpora enter the engine (a directory of blobs),
    so the source -> binary column -> mapInPandas decode chain is
    exercised end to end."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    docs = _docs_df(
        spark,
        [(i, f"text payload number {i} with some length {'x' * i}") for i in range(1, 9)],
    )
    with_png = mm.attach_png_payload(docs)
    rows = with_png.select("doc_id", "payload").collect()
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for r in rows:
        (img_dir / f"{r['doc_id']}.png").write_bytes(bytes(r["payload"]))

    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(img_dir))
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1).cast("long").alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    via_files = {
        r["doc_id"]: (r["width"], r["height"], r["mode"])
        for r in mm.decode_image_metadata(binf).collect()
    }
    direct = {
        r["doc_id"]: (r["width"], r["height"], r["mode"])
        for r in mm.decode_image_metadata(with_png).collect()
    }
    assert via_files == direct
    assert len(via_files) == 8


def test_round5_ops_survive_null_text(spark):
    """NULL text must degrade to the empty document, never silently
    drop rows (the r2-ADVICE class of bug: a malformed row causing
    data loss instead of a defined degradation)."""
    df = spark.createDataFrame([(1, None), (2, "real text here")], "doc_id long, text string")
    pd_out = {r["doc_id"]: r for r in dd.paragraph_dedup(df, min_freq=99).collect()}
    assert set(pd_out) == {1, 2}
    assert pd_out[1]["n_paras"] == 1 and pd_out[1]["cleaned_text"] == ""
    cls_out = {r["doc_id"]: r for r in tx.hashed_ngram_classifier(df).collect()}
    assert set(cls_out) == {1, 2}
    assert cls_out[1]["n_bigrams"] == 0 and cls_out[1]["label"] == "drop"


# ---------------------------------------------------------------------------
# Round-4 ADVICE regressions: exact Bloom h2 arithmetic, NULL-text
# oracle parity, empty-relation constraint checks.
# ---------------------------------------------------------------------------


def test_bloom_pos_exact_above_double_mantissa(spark):
    """_bloom_pos must use exact integer arithmetic: hash56 exceeds the
    2^53 double mantissa, so floor(h / 2^28) can land one off the exact
    h // 2^28 near quotient boundaries. Probe hashes straddling those
    boundaries and compare every position against Python's exact ints."""
    m = 256 * 32
    k = 3
    hs = []
    for q in (2**27 + 12345, 2**28 - 7, 2**27 + 1):
        for d in (-2, -1, 0, 1, 2):
            h = q * (1 << 28) + d
            if 0 <= h < (1 << 56):
                hs.append(h)
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    got = df.select(
        "h", *[dd._bloom_pos(F.col("h"), j, m).alias(f"p{j}") for j in range(k)]
    ).collect()
    for r in got:
        h = r["h"]
        h2 = ((h >> 28) % (1 << 28)) * 2 + 1
        for j in range(k):
            assert r[f"p{j}"] == ((h % m) + j * h2) % m, hex(h)


def test_null_text_oracle_parity_paragraph_and_bloom(spark):
    """The DuckDB oracles must keep NULL-text docs as empty documents,
    exactly like the Spark operators (coalesce-to-empty contract)."""
    import duckdb

    rows = [
        (1, None),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs_null (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs_null VALUES (?, ?)", rows)

    spark_pd = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["cleaned_text"], r["cleaned_chars"])
        for r in dd.paragraph_dedup(df, min_freq=2).collect()
    }
    duck_pd = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            dd.duckdb_paragraph_dedup_sql(min_freq=2, table="docs_null")
        ).fetchall()
    }
    assert spark_pd == duck_pd
    assert set(spark_pd) == {1, 2, 3, 4}

    bench = df.filter(F.col("doc_id") == 2)
    corpus = df.filter(F.col("doc_id") != 2)
    spark_bl = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"], r["contaminated"])
        for r in dd.bloom_decontaminate(corpus, bench).collect()
    }
    duck_bl = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(
            dd.duckdb_bloom_sql(
                "doc_id = 2", "doc_id <> 2", table="docs_null"
            )
        ).fetchall()
    }
    con.close()
    assert spark_bl == duck_bl
    assert set(spark_bl) == {1, 3, 4}


def test_checks_empty_relation_reports_zero_violations(spark):
    """An empty relation has zero violations, not NULL (SUM over zero
    rows is NULL without the coalesce)."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        checks as ck,
    )

    empty = spark.createDataFrame([], "k long, v string")
    out = {
        r["rule"]: r["n_violations"]
        for r in ck.validate_constraints(
            empty,
            row_rules={"v_not_null": F.col("v").isNotNull()},
            unique_keys={"k_unique": ["k"]},
        ).collect()
    }
    assert out == {"v_not_null": 0, "k_unique": 0}


# ---------------------------------------------------------------------------
# Round-4: real pixel resampling (resize_image). Goldens come from an
# INDEPENDENT pure-Python reimplementation (per-pixel loops, no numpy)
# so a kernel bug can't validate itself.
# ---------------------------------------------------------------------------


def _reference_resample(px, w, h, ch, max_w, max_h, method):
    scale = min(1.0, max_w / w, max_h / h)
    ow = max(1, int(w * scale))
    oh = max(1, int(h * scale))
    out = []
    if method == "nearest":
        for j in range(oh):
            sy = ((2 * j + 1) * h) // (2 * oh)
            for i in range(ow):
                sx = ((2 * i + 1) * w) // (2 * ow)
                for c in range(ch):
                    out.append(px[(sy * w + sx) * ch + c])
    else:  # box
        for j in range(oh):
            y0, y1 = (j * h) // oh, max(((j + 1) * h) // oh, (j * h) // oh + 1)
            for i in range(ow):
                x0, x1 = (i * w) // ow, max(((i + 1) * w) // ow, (i * w) // ow + 1)
                for c in range(ch):
                    s = sum(
                        px[(y * w + x) * ch + c]
                        for y in range(y0, y1)
                        for x in range(x0, x1)
                    )
                    out.append(s // (y1 - y0) // (x1 - x0))
    return ow, oh, out


@pytest.mark.parametrize("method", ["nearest", "box"])
def test_resize_image_matches_reference_impl(spark, method):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    rows = [(i, f"pixel text payload number {i} " * (i + 1)) for i in range(12)]
    rows.append((98, ""))  # empty text -> 1x1 zero image
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in mm.resize_image(
            mm.attach_png_payload(df), max_w=5, max_h=5, method=method
        ).collect()
    }
    assert all(r["status"] == "resized" for r in got.values())
    for doc_id, text in rows:
        data = text.encode()
        w, h = len(data) % 16 + 1, len(data) % 12 + 1
        px = bytes(data[k % len(data)] if data else 0 for k in range(w * h))
        ow, oh, out = _reference_resample(px, w, h, 1, 5, 5, method)
        r = got[doc_id]
        assert (r["src_width"], r["src_height"]) == (w, h)
        assert (r["out_width"], r["out_height"]) == (ow, oh)
        assert r["px_count"] == len(out)
        assert r["px_sum"] == sum(out)
        assert r["px_wsum"] == sum((k + 1) * v for k, v in enumerate(out))


def test_resize_image_identity_when_fits(spark):
    """No upscaling: a target box >= source must return the original
    pixels verbatim (both methods degenerate to identity)."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    df = spark.createDataFrame(
        [(1, "identity test payload"), (2, "x")], "doc_id long, text string"
    )
    for method in ("nearest", "box"):
        for r in mm.resize_image(
            mm.attach_png_payload(df), max_w=64, max_h=64, method=method
        ).collect():
            assert (r["out_width"], r["out_height"]) == (
                r["src_width"],
                r["src_height"],
            ), method
            # identity => checksum equals the raw pixel checksum
            text = {1: "identity test payload", 2: "x"}[r["doc_id"]]
            data = text.encode()
            w, h = len(data) % 16 + 1, len(data) % 12 + 1
            px = [data[k % len(data)] for k in range(w * h)]
            assert r["px_sum"] == sum(px), method
            assert r["px_wsum"] == sum((k + 1) * v for k, v in enumerate(px)), method


def test_resize_image_poisoned_payload_is_error_row(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    good = mm.attach_png_payload(
        spark.createDataFrame([(1, "ok")], "doc_id long, text string")
    )
    bad = spark.createDataFrame(
        [(2, bytearray(b"not a png at all"))], "doc_id long, payload binary"
    )
    out = {
        r["doc_id"]: r["status"]
        for r in mm.resize_image(
            good.select("doc_id", "payload").unionByName(bad), max_w=4, max_h=4
        ).collect()
    }
    assert out == {1: "resized", 2: "error"}


# ---------------------------------------------------------------------------
# Round-5: batched numpy codec + fused one-crossing spellings. The
# fused operators must be ROW-IDENTICAL to their composed counterparts,
# and the batch encoder byte-identical to the per-image encoder.
# ---------------------------------------------------------------------------


def _mm_docs(spark, n=40):
    rows = [(i, f"fused parity doc {i} " * (i % 7 + 1)) for i in range(n)]
    rows += [(97, ""), (98, "x"), (99, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fused_media_matches_union(spark):
    """synth_decode_media (one Arrow crossing) is row-identical to the
    4-way seg-discriminated unionByName of the granular decode
    operators — the gated suite's fast spelling changes the plan, not
    the rows."""
    from pyspark.sql import functions as F

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        audio as aud,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        mp4 as m4,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    docs = _mm_docs(spark)
    composed = (
        mm.synth_decode_png(docs).select(F.lit("png").alias("seg"), "*")
        .unionByName(
            mm.synth_decode_jpeg(docs).select(F.lit("jpeg").alias("seg"), "*"),
            allowMissingColumns=True,
        )
        .unionByName(
            m4.synth_video_metadata(docs).select(F.lit("video").alias("seg"), "*"),
            allowMissingColumns=True,
        )
        .unionByName(
            aud.synth_audio_metadata(docs).select(F.lit("wav").alias("seg"), "*"),
            allowMissingColumns=True,
        )
    )
    fused = mm.synth_decode_media(docs)
    assert [(f.name, f.dataType) for f in fused.schema.fields] == [
        (f.name, f.dataType) for f in composed.schema.fields
    ]
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted((tuple(r) for r in fused.collect()), key=key) == sorted(
        (tuple(r) for r in composed.collect()), key=key
    )


def test_encode_png_batch_byte_identity():
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    datas = [f"batch id text {i} " * (i % 5 + 1) for i in range(30)]
    datas = [d.encode() for d in datas] + [b"", b"q"]
    got = mm._encode_png_batch(datas)
    for i, d in enumerate(datas):
        w, h = len(d) % 16 + 1, len(d) % 12 + 1
        px = (
            np.resize(np.frombuffer(d, dtype=np.uint8), w * h)
            if d
            else np.zeros(w * h, dtype=np.uint8)
        )
        assert got[i] == mm.encode_png(w, h, px.tobytes()), i


def test_fused_spellings_match_composed(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    docs = _mm_docs(spark)

    def rows(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    composed_resize = mm.resize_image(
        mm.attach_png_payload(docs), max_w=6, max_h=6, method="nearest"
    )
    assert rows(mm.synth_resize_png(docs, max_w=6, max_h=6)) == rows(composed_resize)

    composed_decode = mm.decode_image_metadata(mm.attach_png_payload(docs))
    assert rows(mm.synth_decode_png(docs)) == rows(composed_decode)

    payload = mm.attach_binary_payload(docs)
    composed_geo = (
        mm.resize_metadata(payload, max_w=100, max_h=100)
        .join(mm.frame_sample(payload), "doc_id")
        .select(
            "doc_id", "src_width", "src_height", "out_width", "out_height",
            "frame_idx", "frame_ts_ms",
        )
    )
    assert rows(mm.geometry_frames(payload, max_w=100, max_h=100)) == rows(composed_geo)

    from pyspark.sql import functions as F

    composed_pipeline = (
        mm.geometry_frames(payload, max_w=100, max_h=100)
        .join(
            mm.synth_resize_png(docs, max_w=6, max_h=6).select(
                "doc_id",
                F.col("out_width").alias("rs_out_w"),
                F.col("out_height").alias("rs_out_h"),
                "px_count", "px_sum", "px_wsum",
            ),
            "doc_id",
        )
    )
    fused = mm.multimodal_pipeline(
        docs, max_w=100, max_h=100, px_max_w=6, px_max_h=6, parallelism=2
    )
    assert rows(fused) == rows(composed_pipeline)


def test_batched_unfilter_matches_single_path():
    """The padded batch unfilter must agree with the per-image scanline
    decoder on every image, including one pushed to the per-image
    fallback tier (stride > _BATCH_MAX_STRIDE)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.RandomState(7)
    payloads = []
    for w, h in [(1, 1), (3, 12), (16, 5), (16, 12), (7, 7), (80, 3)]:
        px = rng.randint(0, 256, w * h).astype(np.uint8)
        payloads.append(mm.encode_png(w, h, px.tobytes()))
    ws, hs, cts, chunks = mm._decode_payloads(payloads)
    assert (cts >= 0).all()
    got = {}
    for idx, block, ch in chunks:
        for j, i in enumerate(idx):
            got[int(i)] = (
                block[j, : int(hs[i]), : int(ws[i]) * ch].astype(np.uint8).tobytes()
            )
    for i, b in enumerate(payloads):
        w, h, mode, px = mm.decode_png(b)
        assert got[i] == px, i


# ---------------------------------------------------------------------------
# Round-5: baseline JPEG codec (operators/jpeg.py) — flat blocks
# roundtrip integer-exactly (the oracle contract), arbitrary images
# within DCT-rounding tolerance, long zero runs exercise ZRL, and
# malformed payloads degrade to error rows.
# ---------------------------------------------------------------------------


def test_jpeg_flat_blocks_roundtrip_exact():
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    for w, h, vals in [(16, 12, [7, 200, 33, 128]), (8, 8, [250]), (5, 3, [9])]:
        bw, bh = (w + 7) // 8, (h + 7) // 8
        px = np.empty((h, w), dtype=np.uint8)
        for bj in range(bh):
            for bi in range(bw):
                px[bj * 8 : (bj + 1) * 8, bi * 8 : (bi + 1) * 8] = vals[
                    (bj * bw + bi) % len(vals)
                ]
        ww, hh, out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px.tobytes()))
        assert (ww, hh) == (w, h) and out == px.tobytes()


def test_jpeg_random_roundtrip_tolerance_and_zrl():
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    rng = np.random.RandomState(3)
    for w, h in [(16, 12), (24, 17), (7, 5)]:
        px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        ww, hh, out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px.tobytes()))
        got = np.frombuffer(out, dtype=np.uint8).reshape(h, w).astype(np.int64)
        assert np.abs(got - px.astype(np.int64)).max() <= 3
    # a lone high-frequency coefficient forces a >15 zero run (ZRL)
    coef = np.zeros((8, 8))
    coef[7, 7] = 40.0
    block = J._A.T @ coef @ J._A + 128.0
    px = np.clip(np.round(block), 0, 255).astype(np.uint8)
    _, _, out = J.decode_jpeg_gray(J.encode_jpeg_gray(8, 8, px.tobytes()))
    assert out == px.tobytes()


def test_jpeg_malformed_raises_and_operator_isolates(spark):
    import pytest as _pytest

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
        multimodal as mm,
    )

    good_blob = J.encode_jpeg_gray(4, 4, bytes(range(16)))
    for bad in (b"nope", good_blob[:-10], b"\xff\xd8\xff\xdb\x00\x04ab"):
        with _pytest.raises(ValueError):
            J.decode_jpeg_gray(bad)
    df = spark.createDataFrame(
        [(1, bytearray(good_blob)), (2, bytearray(b"not a jpeg"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r["status"] for r in mm.decode_jpeg_metadata(df).collect()}
    assert out == {1: "jpeg-decoded", 2: "error"}


def test_jpeg_fused_matches_composed(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        multimodal as mm,
    )

    docs = _mm_docs(spark)

    def rows(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    composed = mm.decode_jpeg_metadata(mm.attach_jpeg_payload(docs))
    assert rows(mm.synth_decode_jpeg(docs)) == rows(composed)
    got = {r["doc_id"]: r for r in composed.collect()}
    # flat-block contract: checksums predictable straight from the text
    for doc_id, text in [(0, "fused parity doc 0 "), (98, "x"), (97, "")]:
        data = text.encode()
        n = len(data)
        w, h = n % 16 + 1, n % 12 + 1
        bw = (w + 7) // 8
        px = [
            (data[((y // 8) * bw + (x // 8)) % n] if n else 128)
            for y in range(h)
            for x in range(w)
        ]
        r = got[doc_id]
        assert (r["width"], r["height"], r["status"]) == (w, h, "jpeg-decoded")
        assert r["px_count"] == len(px) and r["px_sum"] == sum(px)
        assert r["px_wsum"] == sum((k + 1) * v for k, v in enumerate(px))


# ---------------------------------------------------------------------------
# Round-4: trained quality classifier — learned weights must actually
# generalize (accuracy lift over the hash-weight placeholder on the
# held-out split), and the fit must be deterministic.
# ---------------------------------------------------------------------------


def test_trained_classifier_heldout_accuracy_lift(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.sampling import (
        _key_expr,
        _threshold,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from .conftest import SF_ORACLE

    docs = read_testdata(spark, SF_ORACLE, "documents")
    heldout = docs.filter(
        ~(_key_expr(["doc_id"], tx.TCLS_SPLIT_SEED) < F.lit(_threshold(tx.TCLS_TRAIN_RATE)))
    )
    truth = {
        r["doc_id"]: ("keep" if r["y"] == 1 else "drop")
        for r in tx._stop_labels(heldout, "text", "doc_id").collect()
    }
    trained = {r["doc_id"]: r["label"] for r in tx.trained_quality_classifier(docs).collect()}
    placebo = {r["doc_id"]: r["label"] for r in tx.hashed_ngram_classifier(docs).collect()}
    n = len(truth)
    acc_t = sum(1 for k in truth if trained[k] == truth[k]) / n
    acc_p = sum(1 for k in truth if placebo[k] == truth[k]) / n
    # measured 0.77 vs 0.43 at sf0.01; require a real margin, with
    # headroom for fixture regeneration
    assert acc_t >= acc_p + 0.15, (acc_t, acc_p, n)
    assert acc_t >= 0.65, acc_t


def test_contrast_weight_overflow_fails_loudly(spark):
    """ADVICE r4: once class bigram totals could overflow w = x⁺·N⁻ −
    x⁻·N⁺ in int64, Spark must RAISE (as DuckDB would) instead of
    wrapping silently. Feed synthetic per-bucket counts of 2³¹ so
    N⁺·N⁻ = 2⁶² trips the assert; a normal-sized fit is unaffected."""
    import pytest

    feats = spark.createDataFrame(
        [(1, 0, 1 << 31), (2, 0, 1 << 31)], "doc_id long, bucket int, x long"
    )
    labels = spark.createDataFrame([(1, 1), (2, -1)], "doc_id long, __y long")
    with pytest.raises(Exception, match="contrast-weight overflow"):
        tx._contrast_weights(feats, labels, "doc_id").collect()

    small = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 3)], "doc_id long, bucket int, x long"
    )
    got = tx._contrast_weights(small, labels, "doc_id").collect()
    assert [(r["bucket"], r["w"]) for r in got] == [(0, 5 * 3 - 3 * 5)]


def test_trained_classifier_deterministic(spark):
    rows = [
        (i, ("the quick brown fox " if i % 3 else "scan table merge join ") * (i % 5 + 2))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["score_sum"] for r in tx.trained_quality_classifier(df).collect()}
    b = {r["doc_id"]: r["score_sum"] for r in tx.trained_quality_classifier(df).collect()}
    assert a == b
    assert any(v != 0 for v in a.values())


# ---------------------------------------------------------------------------
# Round-5: COLOR (YCbCr) baseline JPEG — interleaved 4:2:0/4:4:4 MCUs,
# chroma tables, fixed-point color transform (operators/jpeg.py).
# ---------------------------------------------------------------------------


def test_jpeg_color_flat_blocks_exact_both_samplings():
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    w, h = 33, 20  # 3x2 MCUs at 4:2:0 — exercises the interleave
    yv = np.fromfunction(
        lambda y, x: ((x // 8) * 37 + (y // 8) * 11) % 256, (h, w)
    ).astype(np.uint8)
    cb = np.fromfunction(
        lambda y, x: ((x // 16) * 53 + (y // 16) * 29 + 10) % 256, (h, w)
    ).astype(np.uint8)
    cr = np.fromfunction(
        lambda y, x: ((x // 16) * 17 + (y // 16) * 71 + 40) % 256, (h, w)
    ).astype(np.uint8)
    exp = np.stack(J.ycbcr_to_rgb_int(yv, cb, cr), axis=-1)
    for subsample in (True, False):
        data = J.encode_jpeg_color(
            w, h, yv.tobytes(), cb.tobytes(), cr.tobytes(), subsample=subsample
        )
        ww, hh, rgb = J.decode_jpeg_color(data)
        assert (ww, hh) == (w, h)
        assert np.array_equal(np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3), exp)


def test_jpeg_color_random_tolerance_and_color_transform_identity():
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    rng = np.random.RandomState(11)
    h, w = 19, 26
    yp, cbp, crp = (rng.randint(0, 256, (h, w), dtype=np.uint8) for _ in range(3))
    data = J.encode_jpeg_color(
        w, h, yp.tobytes(), cbp.tobytes(), crp.tobytes(), subsample=False
    )
    _, _, rgb = J.decode_jpeg_color(data)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    exp = np.stack(J.ycbcr_to_rgb_int(yp, cbp, crp), axis=-1).astype(np.int64)
    assert np.abs(got - exp).max() <= 4  # all-ones quant: near-lossless
    # fixed-point transform: primaries and white land where they must
    r, g, b = J.rgb_to_ycbcr_int(
        np.array([255, 255, 0, 0]), np.array([255, 0, 255, 0]), np.array([255, 0, 0, 0])
    )
    assert r[0] == 255 and r[3] == 0  # white -> Y=255, black -> Y=0
    y2, cb2, cr2 = J.ycbcr_to_rgb_int(
        np.array([255, 0]), np.array([128, 128]), np.array([128, 128])
    )
    assert y2[0] == 255 and y2[1] == 0  # neutral chroma: identity on Y


def test_jpeg_color_profile_rejections():
    import numpy as np
    import pytest as _pytest

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    w, h = 8, 8
    plane = bytes(64)
    color = J.encode_jpeg_color(w, h, plane, plane, plane)
    gray = J.encode_jpeg_gray(w, h, plane)
    with _pytest.raises(ValueError):
        J.decode_jpeg_color(gray)  # 1 component
    with _pytest.raises(ValueError):
        J.decode_jpeg_gray(color)  # 3 components
    with _pytest.raises(ValueError):
        J.decode_jpeg_color(color[: len(color) - 8])  # truncated scan
    # progressive marker (SOF2) must be rejected, not misparsed
    bad = bytearray(color)
    idx = bytes(bad).find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    with _pytest.raises(ValueError):
        J.decode_jpeg_color(bytes(bad))


def test_jpeg_color_operator_and_fixture_contract(spark):
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
        multimodal as mm,
    )

    docs = _mm_docs(spark)
    out = {r["doc_id"]: r for r in mm.synth_decode_jpeg_color(docs).collect()}
    for doc_id, text in [(0, "fused parity doc 0 "), (98, "x"), (97, "")]:
        data = text.encode()
        n = len(data)
        w, h = n % 33 + 1, n % 20 + 1
        bw, mw = (w + 7) // 8, (w + 15) // 16
        r = out[doc_id]
        assert (r["width"], r["height"], r["status"]) == (w, h, "jpeg-color-decoded")
        yv = np.array(
            [
                [data[((y // 8) * bw + x // 8) % n] if n else 128 for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        cb = np.array(
            [
                [data[((y // 16) * mw + x // 16 + 3) % n] if n else 128 for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        cr = np.array(
            [
                [data[((y // 16) * mw + x // 16 + 7) % n] if n else 128 for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        rr, gg, bb = J.ycbcr_to_rgb_int(yv, cb, cr)
        assert r["px_count"] == 3 * w * h
        assert r["r_sum"] == int(rr.astype(np.int64).sum())
        assert r["g_sum"] == int(gg.astype(np.int64).sum())
        assert r["b_sum"] == int(bb.astype(np.int64).sum())


def test_jpeg_color_flat_encoder_bytes_match_generic():
    """Direct A/B (ADVICE r7): encode_jpeg_color_flat must be
    BYTE-IDENTICAL to the generic FDCT encoder on block-flat planes —
    across every fixture geometry class (1..33 × 1..20, partial edge
    MCUs, single-block, multi-MCU)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    rng = np.random.RandomState(7)
    geoms = [(1, 1), (8, 8), (16, 16), (17, 9), (33, 20), (32, 16),
             (9, 17), (23, 5), (16, 20), (33, 1)]
    for w, h in geoms:
        bw, bh = (w + 7) // 8, (h + 7) // 8
        mx, my = (w + 15) // 16, (h + 15) // 16
        yg = rng.randint(0, 256, (bh, bw))
        cbg = rng.randint(0, 256, (my, mx))
        crg = rng.randint(0, 256, (my, mx))
        # flat path: padded block grids (clamped edge replication)
        yb = [
            int(yg[min(by, bh - 1), min(bx, bw - 1)])
            for by in range(2 * my) for bx in range(2 * mx)
        ]
        cbb = [int(cbg[m, x]) for m in range(my) for x in range(mx)]
        crb = [int(crg[m, x]) for m in range(my) for x in range(mx)]
        flat = J.encode_jpeg_color_flat(w, h, yb, cbb, crb)
        # generic path: materialized full-resolution planes
        yy = np.arange(h)[:, None]
        xx = np.arange(w)[None, :]
        yv = yg[yy // 8, xx // 8].astype(np.uint8)
        cbv = cbg[yy // 16, xx // 16].astype(np.uint8)
        crv = crg[yy // 16, xx // 16].astype(np.uint8)
        generic = J.encode_jpeg_color(
            w, h, yv.tobytes(), cbv.tobytes(), crv.tobytes()
        )
        assert flat == generic, (w, h)


def test_jpeg_idct_matmul_spelling_is_pinned():
    """The two-matmul IDCT ((A.T @ coefs) @ A) is the PINNED decode
    contraction. An einsum spelling is NOT guaranteed bit-identical
    (different float contraction order — verified empirically, which
    is why the docstring no longer claims einsum equivalence); what
    must hold is that every decode path uses this exact spelling, so
    batched and scalar decoders agree bit-for-bit (pinned in
    test_jpeg_color_stats_many_matches_scalar_decode) and the spelling
    itself is deterministic across invocations."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
    )

    rng = np.random.RandomState(13)
    A = J._A
    for n in (1, 7, 64, 301):
        coefs = rng.randint(-1024, 1025, (n, 8, 8)).astype(np.float64)
        once = (A.T @ coefs) @ A
        again = (A.T @ coefs.copy()) @ A
        assert np.array_equal(once, again), n
        # and the batched big-stack result equals per-item slices
        per = np.stack([(A.T @ coefs[i]) @ A for i in range(n)])
        assert np.array_equal(once, per), n


def test_jpeg_color_stats_many_matches_scalar_decode():
    """A/B (r8): decode_jpeg_color_stats_many — the batched
    dequant/IDCT/gather/YCbCr analytics decoder — must reproduce the
    scalar decode_jpeg_color stats EXACTLY across geometries, both
    samplings, random (non-flat) images, duplicate geometries (group
    membership > 1), and error payloads interleaved at the right
    positions."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        jpeg as J,
        multimodal as mm,
    )

    rng = np.random.RandomState(29)
    payloads: list = []
    # fixture files across geometry classes, incl. repeated geometry
    for s in ("", "a", "xy", "fused parity doc 0 ", "zzzzz", "a" * 33,
              "b" * 33, "c" * 52, "d" * 19):
        payloads.append(mm._jpeg_color_fixture_bytes(s.encode()))
    # random non-flat images, both samplings
    for w, h, sub in ((19, 26, False), (33, 20, True), (8, 8, True)):
        yp, cbp, crp = (
            rng.randint(0, 256, (h, w), dtype=np.uint8).tobytes()
            for _ in range(3)
        )
        payloads.append(J.encode_jpeg_color(w, h, yp, cbp, crp, subsample=sub))
    # error payloads interleaved
    payloads.insert(3, b"\xff\xd8not a jpeg")
    payloads.insert(0, b"")
    got = J.decode_jpeg_color_stats_many(payloads)
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        try:
            w, h, rgb = J.decode_jpeg_color(p)
        except Exception:
            assert got[i] is None, i
            continue
        arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        li = np.arange(len(arr), dtype=np.int64) + 1
        packed = arr[:, 0] * 65536 + arr[:, 1] * 256 + arr[:, 2]
        exp = (
            w, h, arr.size, int(arr[:, 0].sum()), int(arr[:, 1].sum()),
            int(arr[:, 2].sum()), int((li * packed).sum()),
        )
        assert got[i] == exp, i


def test_bm25_bit_exact_vs_oracle_and_semantics(spark, duck):
    """BM25 (round 5): scores must be BIT-exact vs the DuckDB oracle —
    the driver's hash compare tolerates zero float drift. This is the
    test that caught DuckDB parsing bare float literals as DECIMAL
    (exact 6.6 vs IEEE 3*2.2) and the JVM-vs-libm ln() divergence the
    driver-side idf literals exist to avoid."""
    import struct

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        text as tx,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.queries import (
        oracle_sqls,
        spark_queries,
    )
    from .conftest import SF_ORACLE

    sdf = spark_queries()["bm25_topk_docs"](spark, SF_ORACLE).toPandas()
    odf = duck.execute(oracle_sqls()["bm25_topk_docs"]).fetchdf()
    assert list(sdf["doc_id"]) == list(odf["doc_id"])
    bits = lambda v: struct.pack(">d", float(v))  # noqa: E731
    assert all(bits(a) == bits(b) for a, b in zip(sdf["score"], odf["score"]))
    # semantics: a doc stuffed with a query term outranks one without
    docs = _docs_df(
        spark,
        [
            (1, "hash hash hash hash table"),
            (2, "completely unrelated words here"),
            (3, "hash join"),
        ],
    )
    out = tx.bm25_topk(docs, ["hash", "join"], k=3).collect()
    assert out[0]["doc_id"] in (1, 3) and out[-1]["doc_id"] == 2
    assert out[0]["score"] > out[-1]["score"]


# ---------------------------------------------------------------------------
# substring_span_dedup (round 5): exact repeated-span removal.
# ---------------------------------------------------------------------------


def _ssd(spark, rows, W=3):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.substring_span_dedup(df, window_tokens=W)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_ssd_cross_doc_span_removed_both_sides(spark):
    # "a b c" appears in both docs -> removed from BOTH (no canonical
    # survivor: Lee et al. cut every occurrence of a duplicated span).
    got = _ssd(
        spark,
        [(1, "a b c x y"), (2, "p q a b c")],
        W=3,
    )
    assert got[1]["n_dup_windows"] == 1 and got[1]["n_spans"] == 1
    assert got[1]["cleaned_text"] == "x y"
    assert got[2]["cleaned_text"] == "p q"
    assert got[1]["n_removed_tokens"] == 3 == got[2]["n_removed_tokens"]


def test_ssd_overlapping_and_adjacent_windows_merge(spark):
    # "a b c d" duplicated: windows (a b c) and (b c d) overlap ->
    # ONE merged span of 4 tokens, not two spans of 3.
    got = _ssd(spark, [(1, "a b c d zz"), (2, "qq a b c d")], W=3)
    assert got[1]["n_dup_windows"] == 2
    assert got[1]["n_spans"] == 1
    assert got[1]["n_removed_tokens"] == 4
    assert got[1]["cleaned_text"] == "zz"


def test_ssd_whole_doc_duplicated_comes_back_empty(spark):
    got = _ssd(spark, [(1, "a b c"), (2, "a b c")], W=3)
    for d in (1, 2):
        assert got[d]["cleaned_n_tokens"] == 0
        assert got[d]["cleaned_text"] == ""
        assert got[d]["n_removed_tokens"] == 3
    assert len(got) == 2


def test_ssd_within_doc_repeat_counts(spark):
    # The span repeats inside one doc -> still a duplicate.
    got = _ssd(spark, [(1, "a b c z a b c")], W=3)
    assert got[1]["n_dup_windows"] == 2
    assert got[1]["n_spans"] == 2
    assert got[1]["cleaned_text"] == "z"


def test_ssd_short_null_and_unique_docs_round_trip(spark):
    got = _ssd(
        spark,
        [(1, "a b"), (2, None), (3, "unique tokens only here")],
        W=3,
    )
    assert got[1]["n_windows"] == 0 and got[1]["cleaned_text"] == "a b"
    assert got[2]["n_tokens"] == 1 and got[2]["cleaned_text"] == ""
    assert got[3]["n_removed_tokens"] == 0
    assert got[3]["cleaned_text"] == "unique tokens only here"
    assert got[3]["cleaned_n_tokens"] == got[3]["n_tokens"] == 4


# ---------------------------------------------------------------------------
# n-gram LM perplexity filter (round 5): hand-computed add-one-smoothed
# inverse-probability surprise on a 4-doc corpus.
# ---------------------------------------------------------------------------


def test_lm_surprise_hand_computed(spark):
    # ref slice (en): doc1 "a b a b a c", doc2 "a b a b"
    #   c2: (a,b)=4, (b,a)=3, (a,c)=1; c1: a=5, b=3; V=2
    # per-bigram term = floor((ctx+V)*1e6 / (c+1)):
    #   (a,b) -> floor((5+2)e6/5) = 1_400_000
    #   (b,a) -> floor((3+2)e6/4) = 1_250_000
    #   (a,c) -> floor((5+2)e6/2) = 3_500_000
    #   unseen (ctx=0) -> floor(2e6/1) = 2_000_000
    docs = spark.createDataFrame(
        [
            (1, "a b a b a c", "en"),
            (2, "a b a b", "en"),
            (3, "x y x", "zh"),
            (4, "z", "en"),  # single token: no bigrams, excluded
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.lm_surprise_filter(docs).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["surprise_micro"] == (2 * 1_400_000 + 2 * 1_250_000 + 3_500_000) // 5
    assert out[2]["surprise_micro"] == (2 * 1_400_000 + 1_250_000) // 3
    assert out[3]["surprise_micro"] == 2_000_000
    # the out-of-reference-language doc is the most surprising
    assert out[3]["surprise_micro"] > out[1]["surprise_micro"] > out[2]["surprise_micro"]
    assert all(r["ppl_bucket"] in ("head", "middle", "tail") for r in out.values())
    assert all(r["n_bigrams"] == n for r, n in [(out[1], 5), (out[2], 3), (out[3], 2)])


def test_lm_surprise_no_reference_slice_degrades_uniform(spark):
    # no docs in the reference language: V=0, all counts 0 -> every
    # bigram term floor((0+0)*1e6/1) = 0; scores 0, never an error.
    docs = spark.createDataFrame(
        [(1, "p q r", "zh"), (2, "s t", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = tx.lm_surprise_filter(docs, ref_lang="en").collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["surprise_micro"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# Corpus composition (round 5): domain cap + source interleave.
# ---------------------------------------------------------------------------


def test_domain_cap_binds_and_orders(spark):
    rows = [(i, f"t{i}", "s" + str(i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sp.domain_cap(
        df, cap=3, group_col="source", score=F.col("doc_id").cast("double")
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1"}
    for src, rs in by_src.items():
        assert len(rs) == 3
        # score desc => highest doc_ids kept, rank 1 = best
        ids = [r["doc_id"] for r in sorted(rs, key=lambda r: r["domain_rank"])]
        assert ids == sorted((r["doc_id"] for r in rs), reverse=True)


def test_interleave_round_robin_order(spark):
    rows = [(i, "sA" if i < 4 else "sB") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        sp.interleave_by_source(df).collect(),
        key=lambda r: r["interleave_key"],
    )
    # balanced 2-source corpus: strict alternation sA,sB,sA,sB,...
    assert [r["source"] for r in out] == ["sA", "sB"] * 4
    # keys are the dense 0..2n-1 sequence for a balanced corpus
    assert [r["interleave_key"] for r in out] == list(range(8))
    # within a source the order is the content-hash order: stable
    # across repartitioning (re-run on a repartitioned input)
    again = sorted(
        sp.interleave_by_source(df.repartition(7)).collect(),
        key=lambda r: r["interleave_key"],
    )
    assert [(r["doc_id"], r["interleave_key"]) for r in again] == [
        (r["doc_id"], r["interleave_key"]) for r in out
    ]


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 5): exact equality with a pure-Python
# reference (Sennrich-style word-frequency BPE, greedy left-to-right).
# ---------------------------------------------------------------------------


def _ref_bpe(texts, num_merges):
    from collections import Counter

    wc = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.strip().lower().split():
            if w:
                wc[w] += 1
    reprs = {w: list(w) for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = Counter()
        for w, syms in reprs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # count desc, then (left, right) asc
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        for w, syms in reprs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reprs[w] = out
    return merges, reprs


def test_bpe_train_matches_reference_at_sf001(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from .conftest import SF_ORACLE

    docs = read_testdata(spark, SF_ORACLE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    ref_merges, ref_reprs = _ref_bpe(texts, 8)
    got = tk.bpe_train(docs, num_merges=8)
    assert got == ref_merges
    # segmentation with the trained table reproduces the reference reprs
    seg = {
        r["word"]: r["pieces"]
        for r in tk.bpe_segment(docs, got).dropDuplicates(["word"]).collect()
    }
    assert seg == {w: p for w, p in ref_reprs.items()}


def test_bpe_adjacent_overlap_and_early_stop(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )

    # "aaaa": pair (a,a) count 3; greedy left-to-right merge -> [aa, aa]
    docs = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    merges = tk.bpe_train(docs, num_merges=2)
    assert merges[0][1:3] == ("a", "a")
    # round 2 ties at count 1 between (aa,aa) and (aa,a); right-asc
    # tie-break picks (aa,a)
    assert merges[1][1:3] == ("aa", "a")
    seg = {r["word"]: r["pieces"] for r in tk.bpe_segment(docs, merges).collect()}
    assert seg["aaaa"] == ["aa", "aa"]
    assert seg["aaa"] == ["aaa"]
    # single-char words: no pairs -> early stop, empty table
    single = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert tk.bpe_train(single, num_merges=3) == []


def test_bpe_handles_regex_special_symbols(spark):
    """Words containing regex metacharacters ('.', '$', '\\\\') train
    and segment correctly — merge patterns are escaped, replacements
    escape '$' and backslash."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )

    docs = spark.createDataFrame(
        [(1, "a.b a.b a.b x$y x$y")], "doc_id long, text string"
    )
    merges = tk.bpe_train(docs, num_merges=4)
    texts = ["a.b a.b a.b x$y x$y"]
    ref_merges, ref_reprs = _ref_bpe(texts, 4)
    assert merges == ref_merges
    seg = {
        r["word"]: r["pieces"]
        for r in tk.bpe_segment(docs, merges).dropDuplicates(["word"]).collect()
    }
    assert seg == ref_reprs


def test_incremental_dedup_statuses(spark):
    """History beats batch: content already indexed is 'dup_history'
    for EVERY batch occurrence; fresh content keeps min-id and marks
    the rest 'dup_batch'; NULL text never matches anything — every
    NULL-text row is 'kept', including when the batch holds SEVERAL
    NULL-text rows (two unknown contents are not duplicates of each
    other) and when history itself contains a NULL fingerprint."""
    hist = spark.createDataFrame(
        [("old content",), (None,)], "text string"
    ).select(F.md5(F.lower(F.trim("text"))).alias("fingerprint"))
    batch = spark.createDataFrame(
        [
            (10, "old content"),      # in history
            (11, "OLD CONTENT  "),    # normalizes to history too
            (12, "fresh"),            # new, first
            (13, "fresh"),            # new, dup within batch
            (14, None),               # NULL text
            (15, None),               # second NULL text — still kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["status"]
        for r in dd.incremental_exact_dedup(batch, hist).collect()
    }
    assert out == {
        10: "dup_history",
        11: "dup_history",
        12: "kept",
        13: "dup_batch",
        14: "kept",  # NULL fingerprint: short-circuited to kept
        15: "kept",  # multi-NULL batch: each kept independently
    }


def test_incremental_dedup_no_broadcast_of_index(spark):
    """The accumulated-index side of the history probe must NOT carry
    a broadcast hint: with the auto-broadcast threshold disabled, any
    BroadcastExchange in the plan could only come from a hard hint —
    assert there is none, so at corpus scale the optimizer is free to
    shuffle-hash the billions-of-fingerprints index instead of
    collecting it to every executor."""
    hist = spark.createDataFrame([("x",)], "text string").select(
        F.md5("text").alias("fingerprint")
    )
    batch = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            dd.incremental_exact_dedup(batch, hist)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastExchange" not in plan, plan


def test_bpe_train_batched_parity_at_64_merges(spark):
    """r9 (VERDICT r8 #5): the batched rounds must reproduce the
    serial greedy merge table EXACTLY — 64 merges against the
    pure-Python reference, plus the degenerate near-serial batch."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
        read_testdata,
    )
    from .conftest import SF_ORACLE

    docs = read_testdata(spark, SF_ORACLE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    ref_merges, _ = _ref_bpe(texts, 64)
    got = tk.bpe_train(docs, num_merges=64)
    assert got == ref_merges
    # a tiny candidate window (max batch 2) must yield the same table
    got_small = tk.bpe_train(docs, num_merges=12, batch_candidates=2)
    assert got_small == ref_merges[:12]


def test_bpe_train_batched_accepts_disjoint_merges_in_one_round(spark):
    """On a distribution with symbol-disjoint top pairs and strictly
    separated counts, one batched round must accept several merges
    (the job-count win), still matching the serial reference."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )

    # counts: (a,b)=9 > (c,d)=7 > (e,f)=5 — pairwise disjoint symbols
    text = " ".join(["ab"] * 9 + ["cd"] * 7 + ["ef"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ref_merges, _ = _ref_bpe([text], 3)
    orig = tk._pair_counts
    calls = [0]

    def counting(*a, **k):
        calls[0] += 1
        return orig(*a, **k)

    tk._pair_counts = counting
    try:
        got = tk.bpe_train(docs, num_merges=3)
    finally:
        tk._pair_counts = orig
    assert got == ref_merges
    assert calls[0] == 1, f"expected 1 batched round, got {calls[0]}"


def test_bpe_train_batched_self_pair_cap_regression(spark):
    """r10 (closes the r9 advisory, plus a deeper hole found while
    fixing it): a batched round must NOT accept a candidate at or
    below floor(count/2) of an already-accepted SELF-pair (l, l) —
    merging (c,c) over runs like "ccc" creates the pair (cc,c) out of
    the accepted pair's own occurrences, bounded only by its own
    count. These corpora made the r9 batching diverge from the serial
    greedy result (found by randomized search); pinned here against
    the pure-Python reference.

    The aliasing case the advisory named (a concatenation spelling an
    existing symbol minted by a different merge history) is guarded
    by the same driver-side vocabulary check; greedy global
    replacement makes it near-impossible to trigger end-to-end, so
    the guard is defensive and this test pins the reachable hole.
    """
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        tokenizer as tk,
    )

    corpora = [
        # (c,c)=18 accepted; (a,a)=7 <= 18//2=9 must wait for round 2
        # (serial: (cc,c)=9 outranks (a,a)=7 after the (c,c) merge).
        ("bbaa " * 6 + "ccc " * 9 + "aabc", 7),
        ("bba " * 3 + "abcca " * 6 + "ccc " * 15 + "cba " * 4, 6),
        ("bccccd bccccd cbbb " + "dd " * 9 + "aabbb " * 5, 5),
    ]
    for text, nm in corpora:
        text = text.strip()
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        ref_merges, _ = _ref_bpe([text], nm)
        got = tk.bpe_train(docs, num_merges=nm)
        assert got == ref_merges, f"batched != serial on {text!r}"
