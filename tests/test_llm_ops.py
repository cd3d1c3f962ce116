"""Property tests for the LLM-pipeline operators (SURVEY.md §5.2 #4):
dedup invariants, MinHash/LSH behavior, ANN recall, multimodal stub.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    dedup as dd,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    multimodal as mm,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    similarity as sim,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    text as tx,
)
from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.files import (
    read_testdata,
)

from .conftest import SF_SMOKE


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),        # exact dup
            (3, "the quick brown fox leaps over the lazy dog"),        # near dup
            (4, "completely different content about spark engines"),
            (5, ""),                                                    # empty
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_groups_identical_texts(spark):
    out = {r["keep_id"]: r["n_dups"] for r in dd.exact_dedup(_docs(spark)).collect()}
    assert out[1] == 2          # docs 1+2 share a fingerprint, min id kept
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_identical_docs_identical_signatures(spark):
    sigs = {r["doc_id"]: (r["sig_0"], r["sig_1"], r["sig_2"], r["sig_3"])
            for r in dd.minhash_signatures(_docs(spark), num_hashes=4).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_candidates_contain_exact_dups(spark):
    sigs = dd.minhash_signatures(_docs(spark), num_hashes=4)
    pairs = {(r["id_a"], r["id_b"])
             for r in dd.lsh_candidate_pairs(sigs, num_hashes=4, band_size=2).collect()}
    assert (1, 2) in pairs              # identical docs always collide
    assert (1, 4) not in pairs          # unrelated docs shouldn't


def test_simhash_identical_equal_and_near_dup_close(spark):
    out = {r["doc_id"]: r["simhash"] for r in dd.simhash32(_docs(spark)).collect()}
    assert out[1] == out[2]
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.ngram_jaccard_pairs(
                 _docs(spark), threshold=0.5, allow_quadratic=True).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.7


def test_lsh_ann_recall_against_brute_force(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.lsh_ann_topk(emb, queries, k=5, num_planes=4).collect()}
    # every query must at least find itself (cosine 1.0 in its own bucket)
    for q in range(10):
        assert (q, q) in approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall degenerated: {recall}"


def test_ivf_ann_recall_against_brute_force(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.ivf_ann_topk(emb, queries, k=5, n_lists=8, n_probe=4).collect()}
    # a query's own vector lands in its nearest list, which is probed first
    for q in range(10):
        assert (q, q) in approx
    # probing half the lists of a data-adaptive quantizer must beat
    # random-hyperplane LSH's floor by a wide margin
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall degenerated: {recall}"


def test_short_vector_scores_null_and_sorts_last(spark):
    """ADVICE r4: pin the fixed-width contract of the dim-passing
    dot/l2_norm/cosine path — a malformed (shorter-than-dim) embedding
    scores NULL (r5: a size()==dim WHEN guard short-circuits the fold)
    and therefore sorts LAST in a top-k instead of erroring or winning;
    the generic dim=None path scores over the zipped prefix instead."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [1.0, 0.0]),  # malformed: declared dim is 4
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    scored = emb.crossJoin(queries).select(
        "vec_id", sim.cosine(F.col("embedding"), F.col("query_vec"), 4).alias("s")
    )
    got = {r["vec_id"]: r["s"] for r in scored.collect()}
    assert got[0] == 1.0 and got[1] is not None
    assert got[2] is None  # malformed row: NULL score, not an error
    topk = sim.brute_force_topk(emb, queries, k=3, dim=4).collect()
    ranks = {r["vec_id"]: r["rank"] for r in topk}
    assert ranks[2] == max(ranks.values())  # NULL-scored row sorts last


def test_lsh_multi_table_recall_dominates_single(spark):
    """L-tables LSH (round 5): more independent tables can only add
    candidate collisions, so top-k recall vs brute force must be
    monotone non-decreasing in num_tables, and every query still finds
    itself. All table signatures come from ONE Arrow crossing."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}

    def recall(num_tables):
        approx = {(r["query_id"], r["vec_id"])
                  for r in sim.lsh_ann_topk(
                      emb, queries, k=5, num_planes=6, num_tables=num_tables
                  ).collect()}
        for q in range(10):
            assert (q, q) in approx
        return len(exact & approx) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1, f"multi-table recall regressed: {r4} < {r1}"
    # absolute floor mirrors the single-table gate (0.2); uniform
    # synthetic embeddings are LSH's worst case, so the monotonicity
    # assertion above is the substantive property
    assert r4 >= 0.25, f"4-table recall too low: {r4}"


def test_ivf_distributed_training_recall_and_determinism(spark):
    """VERDICT r4 #6: the distributed quantizer tier (full-corpus
    mini-batch Lloyd's via mapInPandas partial sums) must match or
    beat the bounded-sample trainer's recall gate — training saw every
    row, so it cannot be worse-than-floor — and be deterministic for a
    fixed corpus layout (partial sums combined in partition order)."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.ivf_ann_topk(
                  emb, queries, k=5, n_lists=8, n_probe=4, n_iter=4,
                  train="distributed").collect()}
    for q in range(10):
        assert (q, q) in approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"distributed-trained IVF recall degenerated: {recall}"
    # determinism: same corpus + seed → identical centroids
    c1 = sim._train_spherical_kmeans_distributed(emb, n_lists=4, n_iter=3, seed=7)
    c2 = sim._train_spherical_kmeans_distributed(emb, n_lists=4, n_iter=3, seed=7)
    assert (c1 == c2).all()
    # unit-sphere invariant
    import numpy as np

    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_ann_deterministic_across_runs(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, sim.ivf_ann_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, sim.ivf_ann_topk(emb, queries, k=5).collect()))
    assert a == b


def _pq_reference_encode(mat, books):
    """Independent loop-spelled PQ encoder (explicit squared-L2 per
    row per subspace) — the A/B twin for the vectorized Spark kernel."""
    import numpy as np

    m, ksub, dsub = books.shape
    out = []
    for row in mat:
        n = (row.astype("float64") ** 2).sum() ** 0.5
        unit = row / n if n > 0 else row.astype("float64")
        codes = []
        for s in range(m):
            sub = unit[s * dsub:(s + 1) * dsub]
            best, best_d = 0, float("inf")
            for c in range(ksub):
                d = float(((sub - books[s][c]) ** 2).sum())
                if d < best_d - 1e-15:  # strict: ties keep lowest code
                    best, best_d = c, d
            codes.append(best)
        out.append(codes)
    return out


def test_pq_encode_matches_loop_reference(spark):
    import numpy as np

    emb = read_testdata(spark, SF_SMOKE, "embeddings").limit(40)
    books = sim.train_pq(emb, m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    got = {r["vec_id"]: list(r["codes"])
           for r in sim.pq_encode(emb, books).collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy())
    want = _pq_reference_encode(mat, books)
    for vid, codes in zip(pdf["vec_id"].tolist(), want):
        assert got[vid] == codes, f"vec {vid}: {got[vid]} != {codes}"


def test_pq_adc_recall_against_brute_force(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.pq_adc_topk(emb, queries, k=5, shortlist=50).collect()}
    # a query's own vector has the maximal ADC self-score, so the
    # shortlist always contains it and the exact rerank puts it first
    for q in range(10):
        assert (q, q) in approx
    # 8-byte codes (32× compression) + 50-deep exact rerank must beat
    # the IVF gate: ADC orders by a quantized-but-global score, not a
    # pruned candidate set
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ-ADC recall degenerated: {recall}"


def test_pq_adc_deterministic_across_runs(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, sim.pq_adc_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, sim.pq_adc_topk(emb, queries, k=5).collect()))
    assert a == b


def test_pq_train_validates_inputs(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        sim.train_pq(emb, m=7)
    with pytest.raises(ValueError, match="< ksub"):
        sim.train_pq(emb.limit(3), m=8, ksub=16)


def test_multimodal_decode_stub_contract(spark):
    docs = read_testdata(spark, SF_SMOKE, "documents").limit(20)
    out = mm.decode_metadata(mm.attach_binary_payload(docs))
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_bytes", "width", "height", "status"]
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_bytes"] > 0
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["status"] == "stub-decoded"


def test_ngram_contamination_counts_shared_shingles(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps high"),  # shares 3 of 3 shingles
            (11, "quick brown fox somewhere"),       # shares 1 ("quick brown fox")
            (12, "nothing in common here"),          # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shared"], r["contamination"])
        for r in dd.ngram_contamination(corpus, bench, shingle_n=3).collect()
    }
    # bench has 3 distinct 3-gram shingles
    assert out[10] == (3, 1.0)
    assert out[11] == (1, round(1 / 3, 6))
    assert 12 not in out


def test_udtf_split_sentences(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, "  no breaks  "), (3, "..."), (4, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__udtf_t")
    rows = spark.sql(
        "SELECT doc_id, s.sentence_idx, s.sentence "
        "FROM __udtf_t, LATERAL split_sentences(text) s"
    ).collect()
    got = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in rows}
    assert got == {
        (1, 0): "One", (1, 1): "Two", (1, 2): "Three",
        (2, 0): "no breaks",
    }  # doc 3 is all breaks -> no rows; NULL text -> no rows


def test_connected_components_chain_and_clique(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )

    # chain 10-11-12-13-14 (diameter 4 forces several propagation
    # rounds), clique {20,21,22}, isolated pair (30,31)
    edges = spark.createDataFrame(
        [
            (11, 10), (11, 12), (13, 12), (13, 14),
            (20, 21), (21, 22), (20, 22),
            (30, 31),
        ],
        "id_a long, id_b long",
    )
    out = {
        r["node"]: r["component"]
        for r in dd.connected_components(edges).collect()
    }
    assert {k: v for k, v in out.items() if k < 20} == {i: 10 for i in range(10, 15)}
    assert {k: v for k, v in out.items() if 20 <= k < 30} == {i: 20 for i in (20, 21, 22)}
    assert out[30] == 30 and out[31] == 30


def test_connected_components_empty_edges(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert dd.connected_components(edges).count() == 0


def test_merge_changes_empty_sides(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        relational as rel,
    )

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    none = spark.createDataFrame([], "k long, v string, op string")
    assert [tuple(r) for r in rel.merge_changes(base, none, key="k").collect()] == [
        (1, "a")
    ]
    empty_base = spark.createDataFrame([], "k long, v string")
    only_insert = spark.createDataFrame([(9, "z", "I")], "k long, v string, op string")
    assert [
        tuple(r) for r in rel.merge_changes(empty_base, only_insert, key="k").collect()
    ] == [(9, "z")]


def test_merge_changes_scd1(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        relational as rel,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")], "k long, v string, op string"
    )
    out = {r["k"]: r["v"] for r in rel.merge_changes(base, changes, key="k").collect()}
    assert out == {1: "a", 2: "B", 4: "d"}  # 2 updated, 3 deleted, 4 inserted


def test_multimodal_resize_never_upscales_and_fits(spark):
    docs = read_testdata(spark, SF_SMOKE, "documents").limit(50)
    out = mm.resize_metadata(mm.attach_binary_payload(docs), max_w=224, max_h=224)
    for r in out.collect():
        assert 1 <= r["out_width"] <= min(224, r["src_width"])
        assert 1 <= r["out_height"] <= min(224, r["src_height"])
        # the binding dimension lands on the box edge, minus at most one
        # pixel of float-floor loss (floor(w * (224/w)) can be 223)
        if r["src_width"] > 224 or r["src_height"] > 224:
            assert 223 <= max(r["out_width"], r["out_height"]) <= 224


def test_multimodal_frame_sample_fanout(spark):
    docs = read_testdata(spark, SF_SMOKE, "documents").limit(30)
    payloads = mm.attach_binary_payload(docs)
    out = mm.frame_sample(payloads)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    sizes = {r["doc_id"]: len(bytes(r["payload"])) for r in payloads.collect()}
    assert set(per_doc) == set(sizes)
    for doc_id, frames in per_doc.items():
        expected = min(12, sizes[doc_id] // 250 + 1)
        assert sorted(frames) == [(i, i * 250) for i in range(expected)]


def test_multimodal_extract_features_shape(spark):
    docs = read_testdata(spark, SF_SMOKE, "documents").limit(10)
    out = mm.extract_features(mm.attach_binary_payload(docs)).collect()
    assert len(out) == 10
    for r in out:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= f < 1.0 for f in r["features"])
    # deterministic: same input -> identical vectors on rerun
    again = mm.extract_features(mm.attach_binary_payload(docs)).collect()
    assert {r["doc_id"]: r["features"] for r in out} == {
        r["doc_id"]: r["features"] for r in again
    }


def test_bpe_like_token_count(spark):
    df = spark.createDataFrame(
        [(1, "don't stop"), (2, ""), (3, "a1b2"), (4, "hello, world! 42")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tx.bpe_like_token_count("text").alias("n")
        ).collect()
    }
    # don|'|t|stop ; "" ; a|1|b|2 ; hello|,|world|!|42
    assert out == {1: 4, 2: 0, 3: 4, 4: 5}


def test_text_stats_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "a b  c\td"), (5, "hi, world!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        tx.token_count("text").alias("nt"),
        tx.punct_count("text").alias("np"),
        tx.quality_score("text").alias("q"),
    ).collect()}
    assert out[1]["nt"] == 0 and out[2]["nt"] == 0
    assert out[3]["nt"] == 1 and out[4]["nt"] == 4
    assert out[5]["np"] == 2                      # ',' and '!'
    assert all(0.0 <= out[i]["q"] <= 1.0 for i in out)


def test_hash_sampling_deterministic_and_partition_invariant(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        sampling as sp,
    )

    df = spark.createDataFrame([(i, f"d{i}") for i in range(2000)], "id long, t string")
    a = {r["id"] for r in sp.hash_sample(df, ["id"], 0.3, seed=5).collect()}
    # same rows regardless of physical layout (the property df.sample lacks)
    b = {
        r["id"]
        for r in sp.hash_sample(df.repartition(13, "t"), ["id"], 0.3, seed=5).collect()
    }
    assert a == b
    assert 0.2 < len(a) / 2000 < 0.4  # ~rate
    # nested rates: a 0.1 sample is a subset of the 0.3 sample (same seed)
    c = {r["id"] for r in sp.hash_sample(df, ["id"], 0.1, seed=5).collect()}
    assert c <= a
    # different seed decorrelates
    d = {r["id"] for r in sp.hash_sample(df, ["id"], 0.3, seed=6).collect()}
    assert d != a


def test_hash_split_partitions_every_row_exactly_once(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        sampling as sp,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = sp.hash_split(df, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    rows = out.collect()
    assert len(rows) == 1000 and all(r["split"] in ("train", "val", "test") for r in rows)
    counts = out.groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in counts}
    assert by["train"] > by["val"] and by["train"] > by["test"]
    # split assignment is a function of the key: consistent across tables
    other = spark.createDataFrame([(i, i * 2) for i in range(1000)], "id long, v long")
    out2 = sp.hash_split(other, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    m1 = {r["id"]: r["split"] for r in rows}
    assert all(m1[r["id"]] == r["split"] for r in out2.collect())


def test_stratified_sample_respects_rates_and_nulls(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        sampling as sp,
    )

    df = spark.createDataFrame(
        [(i, "en") for i in range(500)]
        + [(1000 + i, "zh") for i in range(50)]
        + [(2000 + i, None) for i in range(50)],
        "id long, lang string",
    )
    out = sp.stratified_hash_sample(
        df, "lang", {"en": 0.2, "zh": 1.0}, key_cols=["id"], seed=2
    ).collect()
    langs = [r["lang"] for r in out]
    assert langs.count("zh") == 50          # rate 1.0 keeps everything
    assert 0.1 < langs.count("en") / 500 < 0.35
    assert langs.count(None) == 0           # default_rate=0 drops null stratum
    # sampling is a pure filter: no shuffle in the plan
    plan = (
        sp.hash_sample(df, ["id"], 0.5, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_budget_and_totality(spark):
    from collections import defaultdict

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        packing as pk,
    )

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 900) for i in range(400)] + [(9999, 5000)],
        "doc_id long, tok long",
    )
    out = pk.pack_sequences(
        df, token_col="tok", budget=1000, key_cols=["doc_id"], num_shards=4, seed=1
    ).collect()
    assert len(out) == 401  # every row assigned
    packs = defaultdict(list)
    for r in sorted(out, key=lambda r: r["doc_id"]):  # key order = fill order
        packs[(r["shard"], r["pack_id"])].append(r["tok"])
    for (_, _), toks in packs.items():
        # next-fit-with-bleed bound: the pack was under budget before
        # its last document arrived
        assert sum(toks) - toks[-1] < 1000 or len(toks) == 1
    # oversize doc packs alone
    big = [r for r in out if r["doc_id"] == 9999][0]
    assert len(packs[(big["shard"], big["pack_id"])]) >= 1
    # deterministic under re-partitioning
    out2 = pk.pack_sequences(
        df.repartition(7), token_col="tok", budget=1000, key_cols=["doc_id"],
        num_shards=4, seed=1,
    ).collect()
    assert {(r["doc_id"], r["shard"], r["pack_id"]) for r in out} == {
        (r["doc_id"], r["shard"], r["pack_id"]) for r in out2
    }


def test_merge_changes_null_op_is_upsert(spark):
    # ADVICE r2: a change row with NULL op must upsert, never silently
    # delete the base row.
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        relational as rel,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "A", None), (2, None, "D")], "k long, v string, op string"
    )
    out = {r["k"]: r["v"] for r in rel.merge_changes(base, changes, key="k").collect()}
    assert out == {1: "A"}  # NULL op -> upsert applied; 'D' -> deleted


def test_connected_components_nonconverged_raises_or_warns(spark):
    # ADVICE r2: exhausting max_iter with labels still changing must
    # never emit silently-split components.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(chain, max_iter=2)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dd.connected_components(chain, max_iter=2, on_nonconverged="warn")
        assert out.count() == 11  # partial labels still cover every node
    # converged runs stay silent and correct
    out = {r["node"]: r["component"]
           for r in dd.connected_components(chain, max_iter=25).collect()}
    assert set(out.values()) == {0}


def test_stopword_count_escapes_regex_metachars(spark):
    # ADVICE r2: custom stopwords with regex metacharacters count as
    # literals ('a.b' must not match 'axb').
    df = spark.createDataFrame(
        [(1, "c++ and a.b beat axb c1b"), (2, "plain words only")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            tx.stopword_count("text", stopwords=("c++", "a.b")).alias("n"),
        ).collect()
    }
    assert out == {1: 2, 2: 0}
    # default list unaffected
    base = df.select(tx.stopword_count("text").alias("n")).collect()
    assert [r["n"] for r in sorted(base, key=lambda r: r["n"])] == [0, 1]


def test_ngram_jaccard_requires_blocking_or_optin(spark):
    # VERDICT r2 #4: bare-corpus quadratic call must be an explicit
    # decision, never an accident.
    with pytest.raises(ValueError, match="allow_quadratic"):
        dd.ngram_jaccard_pairs(_docs(spark), threshold=0.9)


def test_jaccard_on_pairs_matches_quadratic_on_candidates(spark):
    # the scale spelling (LSH propose -> exact verify) returns exactly
    # the quadratic tier's scores for every proposed pair
    docs = _docs(spark)
    sigs = dd.minhash_signatures(docs, num_hashes=4)
    cands = dd.lsh_candidate_pairs(sigs, num_hashes=4, band_size=2)
    via_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_on_pairs(cands, docs, threshold=0.5).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.5, allow_quadratic=True
        ).collect()
    }
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert via_pairs == {p: j for p, j in full.items() if p in cand_set}
    assert (1, 2) in via_pairs and via_pairs[(1, 2)] == 1.0


def test_hyperplane_matrix_vectorized_scale():
    # VERDICT r2 #5: plane derivation must stay cheap at 10^3+ planes.
    import time

    sim.hyperplane_matrix.cache_clear()
    t0 = time.monotonic()
    m = sim.hyperplane_matrix(1024, 1024)
    elapsed = time.monotonic() - t0
    assert m.shape == (1024, 1024)
    assert float(m.min()) >= -2.0 and float(m.max()) < 2.0
    # distinct planes, deterministic across calls (lru_cache cleared)
    sim.hyperplane_matrix.cache_clear()
    m2 = sim.hyperplane_matrix(1024, 1024)
    assert (m == m2).all()
    assert (m[0] != m[1]).any()
    assert elapsed < 2.0, f"hyperplane_matrix too slow: {elapsed:.2f}s"


def test_png_codec_roundtrip_all_filters():
    # encode cycles filters 0..4; decode must reconstruct exact pixels
    import numpy as np

    rng = np.random.RandomState(3)
    for w, h in [(1, 1), (5, 3), (16, 12), (7, 11)]:
        px = rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
        blob = mm.encode_png(w, h, px)
        ww, hh, mode, out = mm.decode_png(blob)
        assert (ww, hh, mode) == (w, h, "L")
        assert out == px


def test_png_codec_rejects_corruption():
    import pytest as _pytest

    blob = bytearray(mm.encode_png(4, 4, bytes(range(16))))
    blob[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with _pytest.raises(ValueError):
        mm.decode_png(bytes(blob))
    with _pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")


def test_decode_image_metadata_real_bytes(spark):
    # real bytes -> (width, height, mode) through the mapInPandas path;
    # a poisoned row degrades to status='error', never kills the batch
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 100)], "doc_id long, text string"
    )
    with_png = mm.attach_png_payload(docs)
    poisoned = with_png.union(
        spark.createDataFrame([(99, "zz")], "doc_id long, text string").withColumn(
            "payload", F.encode(F.col("text"), "UTF-8")
        )
    )
    out = {r["doc_id"]: r for r in mm.decode_image_metadata(poisoned).collect()}
    for doc_id, text in [(1, "hello world"), (2, ""), (3, "x" * 100)]:
        n = len(text.encode())
        assert out[doc_id]["status"] == "png-decoded"
        assert out[doc_id]["width"] == n % 16 + 1
        assert out[doc_id]["height"] == n % 12 + 1
        assert out[doc_id]["mode"] == "L"
    assert out[99]["status"] == "error" and out[99]["width"] is None


def test_ivf_persistent_index_matches_adhoc_and_prunes(spark, tmp_path):
    """build_ivf_index/ivf_index_topk (round 5): the persisted index
    must return row-identical results to the ad-hoc tier with the same
    hyperparameters, and the probe scan must carry a PartitionFilter on
    _list — only the probed lists' directories are read (sub-linear
    index I/O, the property that matters at 100 TB)."""
    import io
    from contextlib import redirect_stdout

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, path, n_lists=8, n_iter=4, seed=7)
    got = sorted(
        map(tuple, sim.ivf_index_topk(spark, path, queries, k=5, n_probe=4).collect())
    )
    adhoc = sorted(
        map(tuple, sim.ivf_ann_topk(emb, queries, k=5, n_lists=8, n_probe=4, n_iter=4, seed=7).collect())
    )
    assert got == adhoc
    # partition pruning: the postings scan must filter on _list
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.ivf_index_topk(spark, path, queries, k=5, n_probe=2).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_list" in plan
    # distributed-trainer build path works end to end
    path2 = str(tmp_path / "ivf2")
    sim.build_ivf_index(emb, path2, n_lists=4, n_iter=2, train="distributed")
    out = sim.ivf_index_topk(spark, path2, queries, k=5, n_probe=4).collect()
    assert {(r["query_id"], r["vec_id"]) for r in out} >= {(q, q) for q in range(5)}


def test_refresh_ivf_index_maintains_under_dml(spark, tmp_path):
    """refresh_ivf_index (r11): the CDC-maintained persistent index.
    Init trains + assigns the snapshot; DML on the source across
    SEVERAL commits (delete, vector-moving update, insert) folds in
    ONE refresh as a single MERGE; the maintained postings equal a
    fresh assignment of the CURRENT snapshot under the frozen
    centroids, so an exhaustive probe equals brute force over the
    current corpus; a replayed refresh no-ops (exactly-once, the
    watermark lives in the postings table's txn action)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(11)

    def frame(ids):
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    src = TxTable.create(spark, str(tmp_path / "src"), frame(range(40)))
    idx = str(tmp_path / "idx")
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=4, seed=3) == 0
    postings = TxTable(spark, f"{idx}/postings_tx")
    assert postings.read().count() == 40
    # nothing new since the watermark: no-op
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4) is None

    # three source commits, one fold
    src.delete(F.col("vec_id") % 10 == 0)
    src.update(
        F.col("vec_id") < 4,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(frame(range(100, 105)))
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4) == 3

    # maintained postings == fresh assignment under the FROZEN centroids
    cen = sim._load_centroids(spark, idx)
    cur = src.read()
    expected = set()
    for r in cur.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        expected.add(
            (r["vec_id"], int(np.argmax((v / n if n > 0 else v) @ cen.T)))
        )
    got = {(r["vec_id"], r["_list"]) for r in postings.read().collect()}
    assert got == expected
    assert len(got) == 40 - 4 + 5

    # exhaustive probe (every list) == exact brute force over the
    # current corpus — deleted ids gone, moved vectors re-ranked
    queries = cur.filter(F.col("vec_id").isin(1, 17, 101)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    maintained = sorted(
        map(tuple, sim.ivf_index_topk(spark, idx, queries, k=5, n_probe=4).collect())
    )
    brute = sorted(map(tuple, sim.brute_force_topk(cur, queries, k=5).collect()))
    assert maintained == brute
    # the join-probe path reads the maintained layout identically
    joined = sorted(
        map(
            tuple,
            sim.ivf_index_topk(
                spark, idx, queries, k=5, n_probe=4, probe="join"
            ).collect(),
        )
    )
    assert joined == maintained

    # crash-after-commit replay: no new commit, no data change
    hist = len(postings.history())
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4) is None
    assert len(postings.history()) == hist

    # a row-preserving source commit (OPTIMIZE) nets an EMPTY feed:
    # the refresh must still advance the watermark (else every later
    # refresh re-diffs across the no-op commit forever), and the
    # postings row set must be untouched
    src.optimize(target_file_rows=1000)
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4) == src.latest_version()
    assert {(r["vec_id"], r["_list"]) for r in postings.read().collect()} == got
    assert sim.refresh_ivf_index(spark, src, idx, n_lists=4) is None

    # a foreign table squatting at the postings path is refused —
    # folding into someone else's data would corrupt silently
    idx2 = str(tmp_path / "idx2")
    TxTable.create(spark, f"{idx2}/postings_tx", frame(range(3)))
    with pytest.raises(ValueError, match="watermark"):
        sim.refresh_ivf_index(spark, src, idx2, n_lists=4)


def test_maintained_index_probe_prunes_postings_files(spark, tmp_path):
    """The maintained layout's scale property: probing one list opens
    only that list's files — the ``_list`` zone maps play the role the
    static layout's partitionBy directories play, so probe I/O stays
    ~n_probe/n_lists of the index even though postings live in a
    TxTable (file pruning happens in the LOG, before Spark sees a
    path)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(32):
        v = [0.0, 0.0, 0.0, 0.0]
        v[i % 4] = 1.0  # four orthogonal clusters
        rows.append(
            (i, [float(x + 0.01 * n) for x, n in zip(v, rng.normal(size=4))])
        )
    src = TxTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
    )
    idx = str(tmp_path / "idx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=6, seed=7)
    postings = TxTable(spark, f"{idx}/postings_tx")
    lists = sorted(
        r["_list"] for r in postings.read().select("_list").distinct().collect()
    )
    assert len(lists) >= 2  # well-separated clusters occupy >1 list
    total = len(postings.snapshot().files)
    assert total >= len(lists)  # init clustered one list per file
    pruned = sim._postings_frame(spark, idx, [lists[0]])
    opened = len(pruned.inputFiles())
    assert 0 < opened < total
    # and the pruned frame's rows are exactly that list's postings
    assert pruned.select("_list").distinct().collect()[0][0] == lists[0]


def test_refresh_pq_codes_maintains_under_dml(spark, tmp_path):
    """refresh_pq_codes (r12): the CDC-maintained PQ codes table —
    the memory tier of a fully maintained IVF-PQ index. Init trains +
    encodes the snapshot; DML across several source commits folds in
    ONE merge; the maintained codes equal a fresh encode of the
    CURRENT snapshot under the FROZEN codebooks; the probe over the
    maintained table equals a probe over a from-scratch init at the
    final version (same codebooks); a replayed refresh no-ops; a
    foreign table at the codes path is refused."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(13)

    def frame(ids):
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    src = TxTable.create(spark, str(tmp_path / "src"), frame(range(40)))
    pqp = str(tmp_path / "pq")
    assert (
        sim.refresh_pq_codes(spark, src, pqp, m=4, ksub=8, n_iter=4, seed=3)
        == 0
    )
    codes_tx = TxTable(spark, f"{pqp}/codes_tx")
    assert codes_tx.read().count() == 40
    # nothing new since the watermark: no-op
    assert sim.refresh_pq_codes(spark, src, pqp) is None

    # three source commits, one fold (delete / code-moving update / insert)
    src.delete(F.col("vec_id") % 10 == 0)
    src.update(
        F.col("vec_id") < 4,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(frame(range(100, 105)))
    assert sim.refresh_pq_codes(spark, src, pqp) == 3

    # maintained codes == fresh encode under the FROZEN codebooks
    books = sim._load_pq_codebooks(spark, pqp)
    assert books.shape == (4, 8, 2)
    cur = src.read()
    expected = {
        (r["vec_id"], tuple(r["codes"]))
        for r in sim.pq_encode(cur, books).collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"])) for r in codes_tx.read().collect()
    }
    assert got == expected and len(got) == 40 - 4 + 5

    # probe parity: maintained table == from-scratch init at the final
    # snapshot with the same frozen codebooks (identical corpus+model
    # => identical ADC shortlist => identical ranks)
    queries = cur.filter(F.col("vec_id").isin(1, 17, 101)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    maintained = sorted(
        map(
            tuple,
            sim.pq_codes_maintained_topk(
                spark, pqp, queries, cur, k=5, shortlist=12
            ).collect(),
        )
    )
    fresh_p = str(tmp_path / "pq_fresh")
    sim.refresh_pq_codes(spark, src, fresh_p, codebooks=books)
    fresh = sorted(
        map(
            tuple,
            sim.pq_codes_maintained_topk(
                spark, fresh_p, queries, cur, k=5, shortlist=12
            ).collect(),
        )
    )
    assert maintained == fresh
    # every query's self-neighbor survives the lossy shortlist
    assert {(q, q, 1) for q in (1, 17, 101)} <= set(maintained)

    # composed with a maintained IVF index, an exhaustive probe's
    # candidate restriction is the identity — row-identical
    idx = str(tmp_path / "idx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=4, seed=3)
    comp = sorted(
        map(
            tuple,
            sim.pq_codes_maintained_topk(
                spark, pqp, queries, cur, k=5, shortlist=12,
                ivf_path=idx, n_probe=4,
            ).collect(),
        )
    )
    assert comp == maintained

    # crash-after-commit replay: no new commit, no data change
    hist = len(codes_tx.history())
    assert sim.refresh_pq_codes(spark, src, pqp) is None
    assert len(codes_tx.history()) == hist

    # a foreign table squatting at the codes path is refused
    pq2 = str(tmp_path / "pq2")
    TxTable.create(spark, f"{pq2}/codes_tx", sim.pq_encode(frame(range(3)), books))
    with pytest.raises(ValueError, match="watermark"):
        sim.refresh_pq_codes(spark, src, pq2)


def _max_probe_opens(postings, n_lists: int) -> int:
    """Worst-case file opens for a single-list probe, computed from
    the log's zone maps exactly as read_pruned prunes: a file is
    opened for list l when its _list [min, max] interval covers l (or
    it carries no stats)."""
    snap = postings.snapshot()

    def opens(l: int) -> int:
        n = 0
        for m in snap.files.values():
            mn, mx = (m.get("stats") or {}).get("_list", [None, None])
            if mn is None or mx is None or (mn <= l <= mx):
                n += 1
        return n

    return max(opens(l) for l in range(n_lists))


def test_optimize_ivf_index_retightens_zone_maps(spark, tmp_path):
    """optimize_ivf_index (r12, the r11 weak item): refresh churn
    rewrites matched files with mixed-list contents, loosening the
    _list zone maps that stand in for directory pruning — file opens
    per probe grow monotonically. One OPTIMIZE range-clusters the
    live rows back to ~one list per file, and probe results stay
    exactly brute-force throughout (pure file-level rewrite)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(7)

    def frame(ids):
        rows = []
        for i in ids:
            v = [0.0, 0.0, 0.0, 0.0]
            v[i % 4] = 1.0  # four orthogonal clusters
            rows.append(
                (i, [float(x + 0.01 * n) for x, n in zip(v, rng.normal(size=4))])
            )
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    src = TxTable.create(spark, str(tmp_path / "src"), frame(range(32)))
    idx = str(tmp_path / "idx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=6, seed=7)
    postings = TxTable(spark, f"{idx}/postings_tx")
    assert _max_probe_opens(postings, 4) == 1  # init: range-clustered

    # churn: scattered updates + inserts force MERGE rewrites whose
    # output files mix lists -> zone maps widen
    src.update(
        F.col("vec_id") % 3 == 1,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(frame(range(100, 110)))
    sim.refresh_ivf_index(spark, src, idx)
    grew = _max_probe_opens(postings, 4)
    assert grew > 1, "churn should have loosened the zone maps"

    # the policy: one OPTIMIZE re-tightens to ~n_probe/n_lists opens
    assert sim.optimize_ivf_index(spark, idx) is not None
    assert _max_probe_opens(postings, 4) == 1

    # probes stayed exact across churn AND compaction
    cur = src.read()
    queries = cur.filter(F.col("vec_id").isin(1, 105)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = sorted(
        map(tuple, sim.ivf_index_topk(spark, idx, queries, k=4, n_probe=4).collect())
    )
    want = sorted(map(tuple, sim.brute_force_topk(cur, queries, k=4).collect()))
    assert got == want
    # an OPTIMIZE is row-preserving: the NEXT refresh sees an empty
    # postings feed and the index keeps folding source DML normally
    src.delete(F.col("vec_id") == 105)
    sim.refresh_ivf_index(spark, src, idx)
    assert postings.read().filter(F.col("vec_id") == 105).count() == 0


def test_rebuild_ivf_index_retrains_on_drift(spark, tmp_path):
    """rebuild_ivf_index + rebuild_pq_codes (r12): the retrain-on-
    drift complement of the refresh loop. After the corpus walks off
    the training snapshot, a rebuild retrains on the CURRENT snapshot
    and atomically swaps postings+model (the commit references its
    centroid artifact via the __ivf_centroids__ txn marker, so probes
    and later folds always load the model the live postings were
    assigned with); cohesion improves, exhaustive probes stay exact,
    folds keep working against the rebuilt model, and a replayed
    rebuild no-ops."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(21)

    def frame(ids, axes):
        rows = []
        for i in ids:
            v = [0.0] * 8
            v[axes[i % len(axes)]] = 1.0
            rows.append(
                (i, [float(x + 0.01 * n) for x, n in zip(v, rng.normal(size=8))])
            )
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(32), axes=[0, 1, 2, 3])
    )
    idx = str(tmp_path / "idx")
    pqp = str(tmp_path / "pq")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=6, seed=21)
    sim.refresh_pq_codes(spark, src, pqp, m=4, ksub=8, n_iter=4, seed=21)
    postings = TxTable(spark, f"{idx}/postings_tx")
    old_cents = sim._maintained_centroids(spark, idx, postings.snapshot())

    def cohesion(cents) -> float:
        tot = 0.0
        for r in src.read().collect():
            v = np.asarray(r["embedding"], dtype=np.float64)
            n = np.linalg.norm(v)
            u = v / n if n > 0 else v
            tot += float(np.max(u @ cents.T / np.linalg.norm(cents, axis=1)))
        return tot

    # DRIFT: the corpus moves to four DIFFERENT axes; the frozen
    # quantizer still folds correctly (exhaustive probes exact) but
    # fits poorly
    src.delete(F.lit(True))
    src.append(frame(range(200, 240), axes=[4, 5, 6, 7]))
    sim.refresh_ivf_index(spark, src, idx)
    sim.refresh_pq_codes(spark, src, pqp)
    drifted = cohesion(old_cents)

    # rebuilds without an init are refused
    with pytest.raises(ValueError, match="refresh_ivf_index first"):
        sim.rebuild_ivf_index(spark, src, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="refresh_pq_codes first"):
        sim.rebuild_pq_codes(spark, src, str(tmp_path / "nope"))

    v = sim.rebuild_ivf_index(spark, src, idx, n_lists=4, n_iter=6, seed=22)
    assert v == src.latest_version()
    assert sim.rebuild_pq_codes(spark, src, pqp, m=4, ksub=8, seed=22) == v

    # the swap is commit-referenced: the snapshot's marker resolves to
    # the versioned artifact, and the retrained model fits the drifted
    # corpus strictly better
    snap = postings.snapshot()
    assert snap.txns[sim._CENTROIDS_TXN] == v
    new_cents = sim._maintained_centroids(spark, idx, snap)
    assert new_cents.shape == old_cents.shape
    assert cohesion(new_cents) > drifted

    # postings == fresh assignment under the REBUILT model
    expected = set()
    for r in src.read().collect():
        vv = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(vv)
        expected.add(
            (r["vec_id"], int(np.argmax((vv / n if n > 0 else vv) @ new_cents.T)))
        )
    got = {(r["vec_id"], r["_list"]) for r in postings.read().collect()}
    assert got == expected

    # probes: exhaustive == brute over the current corpus; the
    # maintained IVF-PQ composition reads both rebuilt artifacts
    cur = src.read()
    queries = cur.filter(F.col("vec_id").isin(201, 237)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got_p = sorted(
        map(tuple, sim.ivf_index_topk(spark, idx, queries, k=4, n_probe=4).collect())
    )
    want = sorted(map(tuple, sim.brute_force_topk(cur, queries, k=4).collect()))
    assert got_p == want
    comp = sim.pq_codes_maintained_topk(
        spark, pqp, queries, cur, k=4, shortlist=10, ivf_path=idx, n_probe=4
    ).collect()
    assert {(r["query_id"], r["vec_id"]) for r in comp if r["rank"] == 1} == {
        (201, 201), (237, 237)
    }

    # replayed rebuilds no-op (atomic swap is idempotent)
    hv = postings.latest_version()
    assert sim.rebuild_ivf_index(spark, src, idx, n_lists=4) is None
    assert sim.rebuild_pq_codes(spark, src, pqp) is None
    assert postings.latest_version() == hv

    # the NEXT fold assigns against the rebuilt model
    src.append(frame(range(300, 305), axes=[4, 5, 6, 7]))
    sim.refresh_ivf_index(spark, src, idx)
    sim.refresh_pq_codes(spark, src, pqp)
    got2 = {(r["vec_id"], r["_list"]) for r in postings.read().collect()}
    for r in src.read().filter(F.col("vec_id") >= 300).collect():
        vv = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(vv)
        assert (
            r["vec_id"],
            int(np.argmax((vv / n if n > 0 else vv) @ new_cents.T)),
        ) in got2
    # and the maintained codes equal a fresh encode under the REBUILT
    # codebooks (the fold loaded the versioned artifact, not the
    # init-era sidecar)
    new_books = sim._maintained_codebooks(
        spark, pqp, TxTable(spark, f"{pqp}/codes_tx").snapshot()
    )
    fresh_codes = {
        (r["vec_id"], tuple(r["codes"]))
        for r in sim.pq_encode(src.read(), new_books).collect()
    }
    maint_codes = {
        (r["vec_id"], tuple(r["codes"]))
        for r in TxTable(spark, f"{pqp}/codes_tx").read().collect()
    }
    assert maint_codes == fresh_codes


def test_refresh_minhash_index_maintains_under_dml(spark, tmp_path):
    """refresh_minhash_index (r13): the CDC-maintained LSH dedup
    index. Init signs the snapshot; multi-commit DML folds in ONE
    merge; maintained signatures equal a fresh minhash_signatures of
    the CURRENT corpus; pairs and probe candidates served from stored
    signatures equal the ad-hoc spellings; a replayed refresh no-ops;
    geometry is frozen at init (a conflicting fold is refused); a
    foreign table at the sigs path is refused."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def frame(ids):
        rows = [
            (i, " ".join(words[(i + j) % len(words)] for j in range(6)))
            for i in ids
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(30)), stats_columns=["doc_id"]
    )
    idx = str(tmp_path / "idx")
    assert dd.refresh_minhash_index(
        spark, src, idx, num_hashes=4, band_size=2, shingle_n=3
    ) == 0
    sigs_tx = TxTable(spark, f"{idx}/sigs_tx")
    assert sigs_tx.read().count() == 30
    assert dd.refresh_minhash_index(spark, src, idx) is None  # current

    # churn: delete / text-changing update / insert, ONE fold
    src.delete(F.col("doc_id") % 7 == 0)
    src.update(
        F.col("doc_id") % 5 == 1,
        {"text": F.concat(F.col("text"), F.lit(" omega omega"))},
    )
    src.append(frame(range(100, 108)))
    assert dd.refresh_minhash_index(spark, src, idx) == 3

    cur = src.read()
    fresh = dd.minhash_signatures(cur, num_hashes=4, shingle_n=3)
    want_sigs = {tuple(r) for r in fresh.collect()}
    got_sigs = {tuple(r) for r in sigs_tx.read().collect()}
    assert got_sigs == want_sigs

    # pairs served from stored signatures == ad-hoc pairs on the
    # current corpus
    want_pairs = sorted(
        map(tuple, dd.lsh_candidate_pairs(fresh, num_hashes=4).collect())
    )
    got_pairs = sorted(
        map(tuple, dd.minhash_index_pairs(spark, idx).collect())
    )
    assert got_pairs == want_pairs and len(got_pairs) > 0

    # probe candidates == the pair relation restricted to the probes
    probes = cur.filter(F.col("doc_id") < 5)
    got_probe = {
        (r["probe_id"], r["doc_id"])
        for r in dd.minhash_index_probe(spark, idx, probes).collect()
    }
    want_probe = {
        (a, b) for a, b in want_pairs if a < 5
    } | {(b, a) for a, b in want_pairs if b < 5}
    assert got_probe == {(p, c) for p, c in want_probe}

    # replayed fold no-ops (no new commit)
    hist = len(sigs_tx.history())
    assert dd.refresh_minhash_index(spark, src, idx) is None
    assert len(sigs_tx.history()) == hist

    # geometry is frozen: a fold with conflicting explicit geometry is
    # refused before touching anything
    src.append(frame(range(200, 202)))
    with pytest.raises(ValueError, match="geometry"):
        dd.refresh_minhash_index(spark, src, idx, num_hashes=6)
    # default-args folds keep using the frozen geometry
    assert dd.refresh_minhash_index(spark, src, idx) == src.latest_version()
    # ... and an explicit value MATCHING the frozen geometry is fine
    src.append(frame(range(210, 212)))
    assert (
        dd.refresh_minhash_index(spark, src, idx, num_hashes=4, shingle_n=3)
        == src.latest_version()
    )

    # a foreign table squatting at the sigs path is refused
    idx2 = str(tmp_path / "idx2")
    import os

    os.makedirs(idx2, exist_ok=True)
    TxTable.create(
        spark, f"{idx2}/sigs_tx", dd.minhash_signatures(frame(range(3)))
    )
    dd._write_json_atomic(
        f"{idx2}/geometry.json",
        {"num_hashes": 8, "band_size": 2, "shingle_n": 3},
    )
    with pytest.raises(ValueError, match="watermark"):
        dd.refresh_minhash_index(spark, src, idx2)


def test_refresh_hyperplane_index_maintains_under_dml(spark, tmp_path):
    """refresh_hyperplane_index (r14, VERDICT r13 missing #1): the
    CDC-maintained embedding near-dup index. Init buckets the
    snapshot; multi-commit DML folds in ONE merge; maintained state
    equals a fresh bucket pass over the CURRENT corpus; pairs and
    probe matches served from stored state equal the ad-hoc blocked
    tier; a replayed refresh no-ops; geometry is frozen at init
    (conflicting fold refused; matching explicit values accepted); a
    foreign table at the sigs path is refused; the hot-bucket cap
    bounds a boilerplate bucket."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(61)

    def frame(ids):
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(30)), stats_columns=["vec_id"]
    )
    idx = str(tmp_path / "idx")
    assert (
        sim.refresh_hyperplane_index(spark, src, idx, num_planes=3, dim=8) == 0
    )
    sigs_tx = TxTable(spark, f"{idx}/sigs_tx")
    assert sigs_tx.read().count() == 30
    assert sim.refresh_hyperplane_index(spark, src, idx) is None  # current

    # churn: delete / vector-flipping update / insert, ONE fold
    src.delete(F.col("vec_id") % 7 == 0)
    src.update(
        F.col("vec_id") % 5 == 1,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(frame(range(100, 108)))
    assert sim.refresh_hyperplane_index(spark, src, idx) == 3

    cur = src.read()
    fresh = cur.select(
        "vec_id",
        "embedding",
        sim.hyperplane_bits(F.col("embedding"), 3, 8).alias("bucket"),
    )
    want_state = {
        (r["vec_id"], tuple(r["embedding"]), r["bucket"])
        for r in fresh.collect()
    }
    got_state = {
        (r["vec_id"], tuple(r["embedding"]), r["bucket"])
        for r in sigs_tx.read().collect()
    }
    assert got_state == want_state

    # pairs served from stored state == ad-hoc blocked tier on the
    # current corpus (same planes: bucket_planes=3, dim=8)
    thr = 0.2
    want_pairs = sorted(
        map(
            tuple,
            sim.cosine_near_dup_pairs(
                cur, threshold=thr, bucket_planes=3, dim=8
            ).collect(),
        )
    )
    got_pairs = sorted(
        map(
            tuple,
            sim.hyperplane_index_pairs(spark, idx, threshold=thr).collect(),
        )
    )
    assert got_pairs == want_pairs and len(got_pairs) > 0

    # probe matches == the pair relation restricted to the probes
    probes = cur.filter(F.col("vec_id") < 5)
    got_probe = {
        (r["probe_id"], r["vec_id"])
        for r in sim.hyperplane_index_probe(
            spark, idx, probes, threshold=thr
        ).collect()
    }
    want_probe = {(a, b) for a, b in want_pairs if a < 5} | {
        (b, a) for a, b in want_pairs if b < 5
    }
    assert got_probe == want_probe

    # replayed fold no-ops (no new commit)
    hist = len(sigs_tx.history())
    assert sim.refresh_hyperplane_index(spark, src, idx) is None
    assert len(sigs_tx.history()) == hist

    # geometry frozen: conflicting explicit geometry refused, matching
    # explicit values accepted, defaults keep the frozen geometry
    src.append(frame(range(200, 202)))
    with pytest.raises(ValueError, match="geometry"):
        sim.refresh_hyperplane_index(spark, src, idx, num_planes=8)
    with pytest.raises(ValueError, match="geometry"):
        sim.refresh_hyperplane_index(spark, src, idx, dim=16)
    assert (
        sim.refresh_hyperplane_index(spark, src, idx, num_planes=3, dim=8)
        == src.latest_version()
    )

    # a foreign table squatting at the sigs path is refused
    idx2 = str(tmp_path / "idx2")
    import os

    os.makedirs(idx2, exist_ok=True)
    TxTable.create(spark, f"{idx2}/sigs_tx", frame(range(3)))
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators.dedup import (
        _write_json_atomic,
    )

    _write_json_atomic(f"{idx2}/geometry.json", {"num_planes": 3, "dim": 8})
    with pytest.raises(ValueError, match="watermark"):
        sim.refresh_hyperplane_index(spark, src, idx2)

    # hot-bucket cap: identical vectors collapse into one bucket —
    # capped pairs are C(cap,2) among the cap smallest ids
    boiler = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    bsrc = TxTable.create(spark, str(tmp_path / "bsrc"), boiler)
    bidx = str(tmp_path / "bidx")
    sim.refresh_hyperplane_index(spark, bsrc, bidx, num_planes=3, dim=8)
    capped = {
        tuple(r)
        for r in sim.hyperplane_index_pairs(
            spark, bidx, threshold=0.5, max_bucket_size=4
        ).collect()
    }
    assert capped == {(a, b) for a in range(4) for b in range(4) if a < b}


def test_rebuild_hyperplane_index_migrates_geometry(spark, tmp_path):
    """rebuild_hyperplane_index (r14): the embedding twin of the
    minhash geometry migration. Endpoint pair-parity under old and
    new plane counts; snapshot-resolved geometry (time travel pairs
    old buckets with old planes); replay no-op; post-migration folds
    freeze the NEW geometry; the cadence knob migrates on its first
    differing tick."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.streaming.runner import (
        CadenceRunner,
    )
    from tests.test_sources_streaming import _FakeClock

    rng = np.random.default_rng(71)

    def frame(ids):
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(30)), stats_columns=["vec_id"]
    )
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="initialize"):
        sim.rebuild_hyperplane_index(spark, src, idx, num_planes=5)
    sim.refresh_hyperplane_index(spark, src, idx, num_planes=3, dim=8)
    sigs_tx = TxTable(spark, f"{idx}/sigs_tx")
    v_old = sigs_tx.latest_version()

    def adhoc(planes):
        return sorted(
            map(
                tuple,
                sim.cosine_near_dup_pairs(
                    src.read(), threshold=0.2, bucket_planes=planes, dim=8
                ).collect(),
            )
        )

    def served():
        return sorted(
            map(
                tuple,
                sim.hyperplane_index_pairs(spark, idx, threshold=0.2)
                .collect(),
            )
        )

    assert served() == adhoc(3)

    src.append(frame(range(100, 104)))
    assert (
        sim.rebuild_hyperplane_index(spark, src, idx, num_planes=5)
        == src.latest_version()
    )
    assert served() == adhoc(5)
    # replay no-op
    hist = len(sigs_tx.history())
    assert sim.rebuild_hyperplane_index(spark, src, idx, num_planes=5) is None
    assert len(sigs_tx.history()) == hist
    # time travel pairs old buckets with old planes
    assert sim._hyperplane_geometry(idx, sigs_tx.snapshot(version=v_old)) == {
        "num_planes": 3, "dim": 8,
    }
    assert sim._hyperplane_geometry(idx, sigs_tx.snapshot()) == {
        "num_planes": 5, "dim": 8,
    }
    # folds after migration freeze the NEW geometry
    src.delete(F.col("vec_id") % 9 == 4)
    with pytest.raises(ValueError, match="rebuild_hyperplane_index"):
        sim.refresh_hyperplane_index(spark, src, idx, num_planes=3)
    assert (
        sim.refresh_hyperplane_index(spark, src, idx, num_planes=5, dim=8)
        == src.latest_version()
    )
    assert served() == adhoc(5)

    # cadence knob: a runner with a wider target migrates, then folds
    clk = _FakeClock(t0=0.0)
    r = CadenceRunner.for_hyperplane_index_refresh(
        spark, src, idx,
        migrate_geometry={"num_planes": 4, "dim": 8},
        clock=clk, sleep=clk.sleep,
    )
    r.run(max_cycles=1)
    assert r.failures == 0
    assert sim._hyperplane_geometry(idx, sigs_tx.snapshot())["num_planes"] == 4
    src.append(frame(range(200, 203)))
    r.run(max_cycles=2)
    assert r.failures == 0
    assert served() == adhoc(4)


def test_rebuild_minhash_index_migrates_geometry(spark, tmp_path):
    """rebuild_minhash_index (r14, VERDICT r13 missing #2): geometry
    migration as a first-class op. Old→new geometry swap is atomic
    (versioned sidecar + marker in the SAME commit, including the
    schema change when num_hashes changes via
    overwrite(replace_schema=True)); pairs served at both endpoints
    equal the ad-hoc spelling under that endpoint's geometry (time
    travel pairs old sigs with old banding); a replayed rebuild
    no-ops; folds after the migration use the NEW geometry (explicit
    old geometry now refused, explicit new geometry accepted)."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    words = ["eta", "theta", "iota", "kap", "lam", "mux"]

    def frame(ids):
        rows = [
            (i, " ".join(words[(i + j) % len(words)] for j in range(6)))
            for i in ids
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(30)), stats_columns=["doc_id"]
    )
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="initialize"):
        dd.rebuild_minhash_index(spark, src, idx, num_hashes=8)
    dd.refresh_minhash_index(
        spark, src, idx, num_hashes=4, band_size=2, shingle_n=3
    )
    sigs_tx = TxTable(spark, f"{idx}/sigs_tx")
    v_old = sigs_tx.latest_version()

    def adhoc(nh, bs, sn):
        cur = src.read()
        fresh = dd.minhash_signatures(
            cur, num_hashes=nh, shingle_n=sn
        )
        return sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(
                    fresh, num_hashes=nh, band_size=bs
                ).collect(),
            )
        )

    def served():
        return sorted(
            map(tuple, dd.minhash_index_pairs(spark, idx).collect())
        )

    assert served() == adhoc(4, 2, 3)

    # migrate: wider signatures + shingle change (schema-changing)
    src.append(frame(range(100, 104)))  # rebuild signs the CURRENT corpus
    assert (
        dd.rebuild_minhash_index(
            spark, src, idx, num_hashes=8, band_size=2, shingle_n=2
        )
        == src.latest_version()
    )
    assert len(sigs_tx.snapshot().schema.fields) == 1 + 8  # doc_id + sig_0..7
    assert served() == adhoc(8, 2, 2)

    # replayed rebuild (same geometry, same source version) no-ops
    hist = len(sigs_tx.history())
    assert (
        dd.rebuild_minhash_index(
            spark, src, idx, num_hashes=8, band_size=2, shingle_n=2
        )
        is None
    )
    assert len(sigs_tx.history()) == hist

    # time travel: the PRE-rebuild snapshot still pairs with the OLD
    # geometry (marker-resolved), so historical reads stay coherent
    old_snap = sigs_tx.snapshot(version=v_old)
    old_geo = dd._minhash_geometry(idx, old_snap)
    assert old_geo == {"num_hashes": 4, "band_size": 2, "shingle_n": 3}
    assert dd._minhash_geometry(idx, sigs_tx.snapshot()) == {
        "num_hashes": 8, "band_size": 2, "shingle_n": 2,
    }

    # folds after migration: frozen geometry is the NEW one
    src.delete(F.col("doc_id") % 11 == 2)
    with pytest.raises(ValueError, match="rebuild_minhash_index"):
        dd.refresh_minhash_index(spark, src, idx, num_hashes=4)
    assert (
        dd.refresh_minhash_index(spark, src, idx, num_hashes=8, shingle_n=2)
        == src.latest_version()
    )
    assert served() == adhoc(8, 2, 2)

    # banding-only migration (band_size) keeps the schema, swaps geometry
    src.append(frame(range(200, 202)))
    assert (
        dd.rebuild_minhash_index(spark, src, idx, band_size=4)
        == src.latest_version()
    )
    assert served() == adhoc(8, 4, 2)


def test_cadence_minhash_geometry_migration(spark, tmp_path):
    """r14: for_minhash_index_refresh(migrate_geometry=) — the
    config-driven path onto rebuild_minhash_index. A fresh runner
    initializes directly at the target geometry; pointing a NEW
    runner with a different target at an existing index migrates on
    its first tick and folds on later ticks; conflicting
    refresh_kwargs/migrate_geometry keys are refused at
    construction."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.streaming.runner import (
        CadenceRunner,
    )
    from tests.test_sources_streaming import _FakeClock

    words = ["nu", "xi", "omi", "pi", "rho", "sig"]

    def frame(ids):
        rows = [
            (i, " ".join(words[(i + j) % len(words)] for j in range(5)))
            for i in ids
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(20)), stats_columns=["doc_id"]
    )
    idx = str(tmp_path / "idx")
    clk = _FakeClock(t0=0.0)

    with pytest.raises(ValueError, match="once"):
        CadenceRunner.for_minhash_index_refresh(
            spark, src, idx,
            refresh_kwargs={"num_hashes": 4},
            migrate_geometry={"num_hashes": 8},
            clock=clk, sleep=clk.sleep,
        )
    with pytest.raises(ValueError, match="accepts"):
        CadenceRunner.for_minhash_index_refresh(
            spark, src, idx,
            migrate_geometry={"planes": 8},
            clock=clk, sleep=clk.sleep,
        )

    # fresh index: initialize DIRECTLY at the target geometry
    r = CadenceRunner.for_minhash_index_refresh(
        spark, src, idx,
        migrate_geometry={"num_hashes": 4, "band_size": 2, "shingle_n": 2},
        clock=clk, sleep=clk.sleep,
    )
    r.run(max_cycles=1)
    assert r.failures == 0
    sigs_tx = TxTable(spark, f"{idx}/sigs_tx")
    assert dd._minhash_geometry(idx, sigs_tx.snapshot())["num_hashes"] == 4

    # operator changes the config: new runner, wider target — first
    # tick migrates, second tick folds DML under the new geometry
    r2 = CadenceRunner.for_minhash_index_refresh(
        spark, src, idx,
        migrate_geometry={"num_hashes": 8, "band_size": 2, "shingle_n": 2},
        clock=clk, sleep=clk.sleep,
    )
    r2.run(max_cycles=1)
    assert r2.failures == 0
    assert dd._minhash_geometry(idx, sigs_tx.snapshot())["num_hashes"] == 8

    src.append(frame(range(50, 54)))
    r2.run(max_cycles=2)
    assert r2.failures == 0
    cur = src.read()
    fresh = dd.minhash_signatures(cur, num_hashes=8, shingle_n=2)
    want = sorted(
        map(
            tuple,
            dd.lsh_candidate_pairs(fresh, num_hashes=8, band_size=2)
            .collect(),
        )
    )
    got = sorted(map(tuple, dd.minhash_index_pairs(spark, idx).collect()))
    assert got == want


def test_lsh_hot_bucket_cap_bounds_pathological_bucket(spark):
    """cap_band_buckets (r14, VERDICT r13 weak #1): N identical docs
    land in ONE band bucket per band; uncapped that's C(N,2) candidate
    pairs, capped it's C(cap,2) — the cap survivors are the cap
    smallest ids (deterministic truncation), capped output is a subset
    of uncapped, and the physical plan truncates map-side
    (WindowGroupLimit Partial BEFORE the exchange), so the
    pathological bucket never rides the wire."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )

    n, cap = 60, 5
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document").alias(
            "text"
        ),
    )
    sigs = dd.minhash_signatures(docs, num_hashes=4, shingle_n=3)
    uncapped = dd.lsh_candidate_pairs(sigs, num_hashes=4, band_size=2)
    capped = dd.lsh_candidate_pairs(
        sigs, num_hashes=4, band_size=2, max_bucket_size=cap
    )

    un_pairs = {tuple(r) for r in uncapped.collect()}
    cap_pairs = {tuple(r) for r in capped.collect()}
    assert len(un_pairs) == n * (n - 1) // 2  # quadratic blow-up
    assert len(cap_pairs) == cap * (cap - 1) // 2  # O(cap²), not O(N²)
    assert cap_pairs <= un_pairs
    # deterministic: the cap smallest ids survive
    assert {i for p in cap_pairs for i in p} == set(range(cap))

    # plan pin: partial group-limit before the exchange — the cap is
    # enforced on the map side, not after shuffling the full bucket
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan

    # cap=None is the identity; invalid caps are refused
    assert dd.cap_band_buckets(sigs, max_bucket_size=None) is sigs
    with pytest.raises(ValueError, match="max_bucket_size"):
        dd.lsh_candidate_pairs(
            sigs, num_hashes=4, band_size=2, max_bucket_size=0
        )


def test_minhash_index_serving_honors_hot_bucket_cap(spark, tmp_path):
    """Both maintained serve paths thread max_bucket_size: pairs are
    capped per bucket, probe candidates are bounded by the INDEX-side
    cap while the probe batch itself is never truncated."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        dedup as dd,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    n, cap = 20, 3
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate body").alias("text")
    )
    src = TxTable.create(
        spark, str(tmp_path / "src"), docs, stats_columns=["doc_id"]
    )
    idx = str(tmp_path / "idx")
    dd.refresh_minhash_index(
        spark, src, idx, num_hashes=4, band_size=2, shingle_n=3
    )

    pairs = {
        tuple(r)
        for r in dd.minhash_index_pairs(
            spark, idx, max_bucket_size=cap
        ).collect()
    }
    assert len(pairs) == cap * (cap - 1) // 2
    assert {i for p in pairs for i in p} == set(range(cap))

    # probe: every probe doc still reports candidates, but only
    # against the cap surviving index members (minus itself)
    probes = src.read().filter(F.col("doc_id") >= n - 2)  # ids n-2, n-1
    got = {
        (r["probe_id"], r["doc_id"])
        for r in dd.minhash_index_probe(
            spark, idx, probes, max_bucket_size=cap
        ).collect()
    }
    assert got == {(p, c) for p in (n - 2, n - 1) for c in range(cap)}


def test_pq_codes_maintained_join_probe_parity(spark, tmp_path):
    """VERDICT r12 #3: pq_codes_maintained_topk(probe='join') — the
    DataFrame-scale twin of the driver probe over the maintained
    layout. Row-identical to probe='driver' for both shapes (all-pairs
    ADC and the full IVF-PQ composition), including after DML churn;
    and the join path never collects the query table (it works above
    a driver bound that makes the driver path refuse)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(47)

    def frame(ids):
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    src = TxTable.create(spark, str(tmp_path / "src"), frame(range(40)))
    pqp, idx = str(tmp_path / "pq"), str(tmp_path / "idx")
    sim.refresh_pq_codes(spark, src, pqp, m=4, ksub=8, n_iter=4, seed=47)
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=4, seed=47)
    # churn both tiers so the parity covers folded state, not just init
    src.delete(F.col("vec_id") % 10 == 3)
    src.update(
        F.col("vec_id") < 4,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.append(frame(range(100, 106)))
    sim.refresh_pq_codes(spark, src, pqp)
    sim.refresh_ivf_index(spark, src, idx)

    cur = src.read()
    queries = cur.filter(F.col("vec_id").isin(1, 18, 101)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    for extra in (
        {},
        {"ivf_path": idx, "n_probe": 4},
        {"ivf_path": idx, "n_probe": 2},
    ):
        drv = sorted(
            map(
                tuple,
                sim.pq_codes_maintained_topk(
                    spark, pqp, queries, cur, k=5, shortlist=12, **extra
                ).collect(),
            )
        )
        jn = sorted(
            map(
                tuple,
                sim.pq_codes_maintained_topk(
                    spark, pqp, queries, cur, k=5, shortlist=12,
                    probe="join", **extra,
                ).collect(),
            )
        )
        assert jn == drv, extra
    # r11 doctrine holds on the maintained layout too: the pair
    # relation ships codes + LUT ints only — no plan node carries the
    # query vector alongside the codes
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.pq_codes_maintained_topk(
            spark, pqp, queries, cur, k=5, shortlist=12,
            ivf_path=idx, n_probe=4, probe="join",
        ).explain(True)
    offending = [
        ln for ln in buf.getvalue().splitlines()
        if "codes" in ln and "query_vec" in ln
    ]
    assert not offending, offending
    # the join path is the scale escape hatch the driver guard names
    with pytest.raises(ValueError, match="probe='join'"):
        sim.pq_codes_maintained_topk(
            spark, pqp, queries, cur, k=5, shortlist=12,
            ivf_path=idx, n_probe=4, max_driver_queries=2,
        )
    over = sim.pq_codes_maintained_topk(
        spark, pqp, queries, cur, k=5, shortlist=12,
        ivf_path=idx, n_probe=4, max_driver_queries=2, probe="join",
    )
    assert over.count() == 15  # 3 queries × k=5, no collect anywhere
    with pytest.raises(ValueError, match="probe must be"):
        sim.pq_codes_maintained_topk(
            spark, pqp, queries, cur, k=5, probe="nope"
        )


def test_lut_broadcast_guard_falls_back_exactly(spark, tmp_path, monkeypatch):
    """ADVICE r13: the all-pairs probe='join' branch force-broadcasts
    a LUT whose row count is Q·m·ksub — linear in the query table.
    Above _LUT_BROADCAST_MAX_ROWS the hint is dropped (AQE decides).
    Forcing the threshold to 0 must change ONLY the plan: rows stay
    identical, and the plan carries no forced broadcast of the LUT
    mapInPandas subtree."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(53)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    src = TxTable.create(spark, str(tmp_path / "src"), vecs)
    pqp = str(tmp_path / "pq")
    sim.refresh_pq_codes(spark, src, pqp, m=4, ksub=8, n_iter=3, seed=53)
    cur = src.read()
    queries = cur.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kw = dict(k=4, shortlist=10, probe="join")
    want = sorted(
        map(
            tuple,
            sim.pq_codes_maintained_topk(spark, pqp, queries, cur, **kw)
            .collect(),
        )
    )
    monkeypatch.setattr(sim, "_LUT_BROADCAST_MAX_ROWS", 0)
    guarded = sim.pq_codes_maintained_topk(spark, pqp, queries, cur, **kw)
    assert sorted(map(tuple, guarded.collect())) == want
    # the logical plan must not carry a broadcast HINT on the LUT side
    # (AQE may still choose broadcast at runtime — that's the point)
    lp = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in lp


def test_skew_rebuild_trigger_threads_sample_fraction(spark, tmp_path):
    """ADVICE r13: the scheduled drift trigger accepts the sampled
    read added for exactly its cadence-scale case. fraction=1.0 is a
    Bernoulli(1) sample — the trigger must agree with the unsampled
    scalar; invalid fractions are refused through the same path."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(59)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    src = TxTable.create(spark, str(tmp_path / "src"), vecs)
    idx = str(tmp_path / "idx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=3, seed=59)

    skew = sim.ivf_occupancy_skew(spark, idx)
    trig = sim.skew_rebuild_trigger(threshold=skew - 1e-9, sample_fraction=1.0)
    assert trig(spark, idx) is True
    trig_hi = sim.skew_rebuild_trigger(
        threshold=skew + 1e-9, sample_fraction=1.0
    )
    assert trig_hi(spark, idx) is False
    with pytest.raises(ValueError, match="sample_fraction"):
        sim.skew_rebuild_trigger(threshold=1.0, sample_fraction=2.0)(spark, idx)


def test_probe_pins_one_snapshot_across_rebuild(spark, tmp_path):
    """ADVICE r12 (snapshot pinning): a probe resolves ONE snapshot
    per table up front and pins every read to it. A rebuild committing
    AFTER the probe plan is constructed but BEFORE its (lazy) action
    must not mix the old model with new postings/codes: the already-
    constructed plan keeps reading the pinned pre-rebuild version
    (snapshot isolation), and a freshly constructed plan sees the
    rebuilt pair. Exercised for both maintained probe paths
    (ivf_index_topk and the fully maintained IVF-PQ composition)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(29)

    def frame(ids, axes):
        rows = []
        for i in ids:
            v = [0.0] * 8
            v[axes[i % len(axes)]] = 1.0
            rows.append(
                (i, [float(x + 0.01 * n) for x, n in zip(v, rng.normal(size=8))])
            )
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    src = TxTable.create(
        spark, str(tmp_path / "src"), frame(range(24), axes=[0, 1, 2, 3])
    )
    idx = str(tmp_path / "idx")
    pqp = str(tmp_path / "pq")
    sim.refresh_ivf_index(spark, src, idx, n_lists=4, n_iter=6, seed=29)
    sim.refresh_pq_codes(spark, src, pqp, m=4, ksub=8, n_iter=4, seed=29)

    cur = src.read(version=0)
    queries = cur.filter(F.col("vec_id").isin(1, 7)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # plans constructed NOW: model already resolved, data reads lazy
    ivf_plan = sim.ivf_index_topk(spark, idx, queries, k=4, n_probe=4)
    pq_plan = sim.pq_codes_maintained_topk(
        spark, pqp, queries, cur, k=4, shortlist=10, ivf_path=idx, n_probe=4
    )
    want_ivf = sorted(map(tuple, ivf_plan.collect()))
    want_pq = sorted(map(tuple, pq_plan.collect()))
    assert want_ivf == sorted(
        map(tuple, sim.brute_force_topk(cur, queries, k=4).collect())
    )

    # the race: drift + rebuild BOTH tiers before the plans re-execute
    src.delete(F.col("vec_id") >= 12)
    src.append(frame(range(200, 224), axes=[4, 5, 6, 7]))
    sim.refresh_ivf_index(spark, src, idx)
    sim.refresh_pq_codes(spark, src, pqp)
    assert sim.rebuild_ivf_index(
        spark, src, idx, n_lists=4, n_iter=6, seed=30
    ) == src.latest_version()
    assert sim.rebuild_pq_codes(
        spark, src, pqp, m=4, ksub=8, n_iter=4, seed=30
    ) == src.latest_version()

    # pinned plans replay the PRE-rebuild pairing bit-for-bit — no
    # old-model/new-postings mix in either direction
    assert sorted(map(tuple, ivf_plan.collect())) == want_ivf
    assert sorted(map(tuple, pq_plan.collect())) == want_pq

    # a fresh plan resolves the rebuilt snapshot and equals brute
    # force over the current corpus
    cur2 = src.read()
    q2 = cur2.filter(F.col("vec_id").isin(201, 223)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sorted(
        map(tuple, sim.ivf_index_topk(spark, idx, q2, k=4, n_probe=4).collect())
    )
    assert got == sorted(
        map(tuple, sim.brute_force_topk(cur2, q2, k=4).collect())
    )


def test_postings_frame_empty_probe_set_returns_typed_empty(spark, tmp_path):
    """ADVICE r11: an empty query set on the maintained layout must
    return an empty frame (like the static path's isin([])), not raise
    min()-of-empty-sequence."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    rng = np.random.default_rng(3)
    src = TxTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=4)]) for i in range(8)],
            "vec_id long, embedding array<float>",
        ),
    )
    idx = str(tmp_path / "idx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=2, n_iter=2, seed=3)
    out = sim._postings_frame(spark, idx, [])
    assert out.count() == 0
    assert {"vec_id", "embedding", "_list"} <= set(out.columns)


def test_brute_force_topk_plan_is_scale_safe(spark):
    """r13 (the r12 weak item, pinned as a regression test alongside
    the PLANS.md rows): the ranking exchange must be BOUNDED — a
    WindowGroupLimit in Partial mode precedes the Exchange, so each
    map task emits at most q·k rows and the shuffle never carries the
    n·q scored cross product — and the per-side norm precompute must
    survive optimization (exactly 2 SQRT folds in the plan; a
    CollapseProject regression re-inlining norms into the pair
    projection would show 4+)."""
    import re

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.brute_force_topk(emb, queries, k=10, dim=64).explain("formatted")
    p = buf.getvalue()
    mp = re.search(r"\(\d+\) WindowGroupLimit\n[^(]*Arguments: [^\n]*Partial", p)
    me = re.search(r"\(\d+\) Exchange", p)
    assert mp is not None, "partial WindowGroupLimit missing from the plan"
    assert me is not None and mp.start() < me.start(), (
        "the partial top-k must precede the ranking exchange"
    )
    assert p.count("SQRT(aggregate") == 2, p.count("SQRT(aggregate")


def test_driver_probe_query_bound_refused(spark, tmp_path):
    """VERDICT r12 #5: probe='driver' paths collect the query set —
    above the configurable bound they must refuse with a pointed
    error naming probe='join', not silently materialize a query TABLE
    on the driver. The refusing read is itself bounded
    (limit(bound+1)), so even the refusal never collects the full
    set."""
    import numpy as np

    rng = np.random.default_rng(41)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(16)],
        "vec_id long, embedding array<float>",
    )
    queries = vecs.limit(6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="probe='join'"):
        sim.pq_adc_topk(
            vecs, queries, k=3, m=4, ksub=4, n_iter=2,
            max_driver_queries=3,
        )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    src = TxTable.create(spark, str(tmp_path / "bsrc"), vecs)
    idx = str(tmp_path / "bidx")
    sim.refresh_ivf_index(spark, src, idx, n_lists=2, n_iter=2, seed=41)
    with pytest.raises(ValueError, match="probe='join'"):
        sim.ivf_index_topk(
            spark, idx, queries, k=3, n_probe=2, max_driver_queries=3
        )
    # within the bound both paths work unchanged
    assert (
        sim.ivf_index_topk(
            spark, idx, queries, k=3, n_probe=2, max_driver_queries=6
        ).count()
        > 0
    )


def test_lut_values_threshold_falls_back_exactly(spark, monkeypatch):
    """ADVICE r12: the VALUES spelling of the driver ADC LUT inlines
    n_q×m×ksub literal tuples into one SQL string — above the
    threshold it falls back to the RDD-backed createDataFrame path.
    Forcing the threshold to 0 must change ONLY the plan shape: the
    driver probe's rows stay identical (same _pq_luts integers)."""
    import numpy as np

    rng = np.random.default_rng(43)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    queries = vecs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kw = dict(k=3, m=4, ksub=4, n_iter=2, seed=43, train_sample=24)
    want = sorted(map(tuple, sim.pq_adc_topk(vecs, queries, **kw).collect()))
    monkeypatch.setattr(sim, "_LUT_VALUES_MAX_ROWS", 0)
    got = sorted(map(tuple, sim.pq_adc_topk(vecs, queries, **kw).collect()))
    assert got == want


def test_int8_quantization_invariants(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    zero = spark.createDataFrame(
        [(9_000_001, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    q = sim.quantize_int8(emb.select("vec_id", "embedding").unionByName(zero))
    rows = q.collect()
    assert len(rows) == emb.count() + 1
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["qvec"]), r["vec_id"]
        # a max-magnitude positive element must hit exactly +127
        if r["scale"] > 0:
            assert 127 in r["qvec"] or -127 in r["qvec"] or any(
                abs(v) >= 126 for v in r["qvec"]
            )
    z = by_id[9_000_001]
    assert z["scale"] == 0.0 and all(v == 0 for v in z["qvec"])


def test_int8_rerank_recall_against_brute_force(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    two_stage = {(r["query_id"], r["vec_id"])
                 for r in sim.int8_rerank_topk(
                     emb, queries, k=5, shortlist=25).collect()}
    for q in range(10):
        assert (q, q) in two_stage  # self-neighbor survives both stages
    # int8 keeps ~7 bits of the score: the shortlist rarely drops a
    # true top-5 neighbor, and the float rerank restores exact order
    recall = len(exact & two_stage) / len(exact)
    assert recall >= 0.9, f"int8 two-stage recall degenerated: {recall}"


def test_cms_overestimates_never_under(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        aggregates as ag,
    )
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        text as tx,
    )

    docs = read_testdata(spark, SF_SMOKE, "documents")
    toks = docs.filter(F.trim(F.col("text")) != "").select(
        F.explode(tx.tokens("text")).alias("tok")
    )
    n_total = toks.count()
    true = {
        r["tok"]: r["c"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    est = {
        r["value"]: r["est_count"]
        for r in ag.cms_heavy_hitters(
            toks, "tok", width=64, depth=3, k=10_000
        ).collect()
    }
    assert set(est) == set(true)
    for v, e in est.items():
        # the CMS guarantee: never under-estimates, never above N
        assert true[v] <= e <= n_total, (v, true[v], e)


def test_cms_dominant_value_ranks_first(spark):
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        aggregates as ag,
    )

    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string")
    out = ag.cms_heavy_hitters(df, "v", width=128, depth=3, k=3).collect()
    assert out[0]["value"] == "hot" and out[0]["rank"] == 1
    assert out[0]["est_count"] >= 500


def test_cms_rejects_degenerate_params(spark):
    import pytest as _pytest

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        aggregates as ag,
    )

    df = spark.createDataFrame([("x",)], "v string")
    for bad in ({"width": 0}, {"depth": 0}, {"k": 0}):
        with _pytest.raises(ValueError):
            ag.cms_heavy_hitters(df, "v", **bad)


def test_int8_null_embedding_degrades_not_poisons(spark):
    """A NULL embedding row quantizes to (NULL qvec, NULL scale) and is
    ABSENT from retrieval results (posexplode drops it) — the same
    degraded-not-poisoned contract as dot()'s short-vector guard."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        similarity as sim,
    )

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    nulled = spark.createDataFrame(
        [(9_000_002, None)], "vec_id long, embedding array<float>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(nulled)
    q = {r["vec_id"]: r for r in sim.quantize_int8(corpus).collect()}
    assert q[9_000_002]["qvec"] is None and q[9_000_002]["scale"] is None
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = sim.int8_rerank_topk(corpus, queries, k=5, shortlist=10).collect()
    assert all(r["vec_id"] != 9_000_002 for r in hits)
    assert {r["query_id"] for r in hits} == {0, 1, 2}  # queries unaffected


def test_pca_fit_matches_numpy_reference(spark):
    import numpy as np

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    model = sim.pca_fit(emb, k=8)
    assert model["components"].shape == (8, 64)
    # independent reference: numpy covariance + eigh on collected rows
    mat = np.stack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)
    ref_mean = mat.mean(axis=0)
    assert np.allclose(model["mean"], ref_mean, rtol=1e-9, atol=1e-12)
    cov = np.cov(mat, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert np.allclose(model["explained_variance"], evals, rtol=1e-7)
    # each fitted component must be (up to sign) an eigenvector:
    # Cv = λv
    for comp, lam in zip(model["components"], model["explained_variance"]):
        assert np.allclose(cov @ comp, lam * comp, atol=1e-8)
    # orthonormal basis, variance sorted descending
    gram = model["components"] @ model["components"].T
    assert np.allclose(gram, np.eye(8), atol=1e-10)
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] >= 0 for i in range(len(ev) - 1))


def test_pca_transform_and_whitening(spark):
    import numpy as np

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    model = sim.pca_fit(emb, k=4)
    out = sim.pca_transform(emb, model, whiten=True).select("vec_id", "pca")
    proj = np.stack(out.toPandas()["pca"].to_numpy())
    assert proj.shape[1] == 4
    # whitened projection: zero mean, unit variance per coordinate
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(proj.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_pca_fit_deterministic_and_validates(spark):
    import numpy as np

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    a = sim.pca_fit(emb, k=3)
    b = sim.pca_fit(emb, k=3)
    assert np.array_equal(a["components"], b["components"])
    assert np.array_equal(a["mean"], b["mean"])
    with pytest.raises(ValueError, match="k=99 > dim"):
        sim.pca_fit(emb, k=99)
    with pytest.raises(ValueError, match="at least 2"):
        sim.pca_fit(emb.limit(1), k=2)


def test_ivf_pq_recall_against_brute_force(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.ivf_pq_topk(
                  emb, queries, k=5, n_lists=8, n_probe=4, shortlist=50
              ).collect()}
    # the query's own vector: nearest list probed first, maximal ADC
    # self-score keeps it in the shortlist, exact rerank ranks it #1
    for q in range(10):
        assert (q, q) in approx
    # candidate restriction (half the lists) stacked on 8-byte codes
    # must still hold the IVF gate thanks to the 50-deep exact rerank
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"IVF-PQ recall degenerated: {recall}"


def test_ivf_pq_deterministic_and_subsets_probed_lists(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, sim.ivf_pq_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, sim.ivf_pq_topk(emb, queries, k=5).collect()))
    assert a == b
    # probing EVERY list makes the candidate set exhaustive: IVF-PQ
    # then equals plain PQ-ADC with the same codebooks/shortlist
    full = sorted(map(tuple, sim.ivf_pq_topk(
        emb, queries, k=5, n_lists=8, n_probe=8, shortlist=50).collect()))
    pq_only = sorted(map(tuple, sim.pq_adc_topk(
        emb, queries, k=5, shortlist=50).collect()))
    assert full == pq_only


def test_pq_distributed_training_recall_and_determinism(spark):
    """r9 (VERDICT r8 #2): the distributed PQ trainer must match the
    sample tier's recall gate and be run-to-run deterministic; its
    codebooks drive the identical encode/ADC path."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    b1 = sim.train_pq(emb, m=8, ksub=16, train="distributed")
    b2 = sim.train_pq(emb, m=8, ksub=16, train="distributed")
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all(), "distributed PQ training not deterministic"

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in sim.pq_adc_topk(
                  emb, queries, k=5, shortlist=50, train="distributed"
              ).collect()}
    for q in range(10):
        assert (q, q) in approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"distributed-PQ recall degenerated: {recall}"


def test_pq_distributed_validates_inputs(spark):
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        sim.train_pq(emb, m=7, train="distributed")
    with pytest.raises(ValueError, match="< ksub"):
        sim.train_pq(emb.limit(3), m=8, ksub=16, train="distributed")
    with pytest.raises(ValueError, match="sample.*distributed"):
        sim.train_pq(emb, train="bogus")


def test_ivf_index_join_probe_matches_driver_probe(spark, tmp_path):
    """r9 (VERDICT r8 #7): the distributed probe path (query set stays
    a DataFrame; probes shuffle by _list) must be row-identical to the
    driver-side probe path, keep partition pruning, and reject unknown
    probe modes."""
    import io
    from contextlib import redirect_stdout

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "ivfj")
    sim.build_ivf_index(emb, path, n_lists=8, n_iter=4, seed=7)
    drv = sorted(map(tuple, sim.ivf_index_topk(
        spark, path, queries, k=5, n_probe=3, probe="driver").collect()))
    jnd = sorted(map(tuple, sim.ivf_index_topk(
        spark, path, queries, k=5, n_probe=3, probe="join").collect()))
    assert drv == jnd
    # the join path must still prune postings partitions on _list
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.ivf_index_topk(
            spark, path, queries, k=5, n_probe=2, probe="join"
        ).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_list" in plan
    with pytest.raises(ValueError, match="driver.*join"):
        sim.ivf_index_topk(spark, path, queries, probe="bogus")


def test_ivf_index_probe_modes_agree_on_zero_norm_query(spark, tmp_path):
    """r10 (r9 advisory): an all-zero query vector must not NaN-poison
    the driver probe's argsort — both probe modes normalize with the
    same where=norm>0 guard and stay row-identical on it."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    zq = spark.createDataFrame(
        [(9001, [0.0] * dim)], "query_id long, query_vec array<float>"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).unionByName(zq)
    path = str(tmp_path / "ivfz")
    sim.build_ivf_index(emb, path, n_lists=4, n_iter=3, seed=7)
    drv = sorted(map(tuple, sim.ivf_index_topk(
        spark, path, queries, k=3, n_probe=2, probe="driver").collect()))
    jnd = sorted(map(tuple, sim.ivf_index_topk(
        spark, path, queries, k=3, n_probe=2, probe="join").collect()))
    assert drv == jnd
    assert all(r == r for t in drv for r in t if isinstance(r, float))  # no NaN


def test_pq_adc_join_probe_matches_driver_probe(spark):
    """r10 (VERDICT r9 #1): pq_adc_topk(probe='join') keeps the query
    set a DataFrame (executor-side per-Arrow-batch LUTs) and must be
    row-identical to the driver LUT path — both draw their integers
    from the shared _pq_luts builder."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    drv = sorted(map(tuple, sim.pq_adc_topk(
        emb, queries, k=5, shortlist=40, probe="driver").collect()))
    jnd = sorted(map(tuple, sim.pq_adc_topk(
        emb, queries, k=5, shortlist=40, probe="join").collect()))
    assert drv == jnd and len(drv) > 0
    # r11 (VERDICT r10 #1): the pair relation ships codes + LUT ints
    # only — no plan node may carry the query vector alongside codes
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.pq_adc_topk(
            emb, queries, k=5, shortlist=40, probe="join"
        ).explain(True)
    offending = [
        ln for ln in buf.getvalue().splitlines()
        if "codes" in ln and "query_vec" in ln
    ]
    assert not offending, offending
    with pytest.raises(ValueError, match="driver.*join"):
        sim.pq_adc_topk(emb, queries, probe="bogus")


def test_ivf_pq_join_probe_matches_driver_probe(spark):
    """r10 (VERDICT r9 #1): ivf_pq_topk(probe='join') — probe lists
    from a pandas_udf over query rows, candidates via the _list join,
    executor-side ADC — must be row-identical to the driver path."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 41 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    kw = dict(k=5, n_lists=8, n_probe=3, shortlist=40)
    drv = sorted(map(tuple, sim.ivf_pq_topk(
        emb, queries, probe="driver", **kw).collect()))
    jnd = sorted(map(tuple, sim.ivf_pq_topk(
        emb, queries, probe="join", **kw).collect()))
    assert drv == jnd and len(drv) > 0
    # r11 (VERDICT r10 #1): candidate relation = ids + codes + LUT
    # ints; the query vector never rides along with the codes
    buf = io.StringIO()
    with redirect_stdout(buf):
        sim.ivf_pq_topk(emb, queries, probe="join", **kw).explain(True)
    offending = [
        ln for ln in buf.getvalue().splitlines()
        if "codes" in ln and "query_vec" in ln
    ]
    assert not offending, offending
    with pytest.raises(ValueError, match="driver.*join"):
        sim.ivf_pq_topk(emb, queries, probe="bogus")


def test_pq_adc_join_probe_zero_norm_query_parity(spark):
    """Degenerate input: an all-zero query vector must produce the
    same rows on both ADC probe paths (NULL cosine ranks by id
    tie-break; LUT integers are rint(0×scale)=0 on both)."""
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    zq = spark.createDataFrame(
        [(9001, [0.0] * dim)], "query_id long, query_vec array<float>"
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).unionByName(zq)
    drv = sorted(map(tuple, sim.pq_adc_topk(
        emb, queries, k=3, probe="driver").collect()))
    jnd = sorted(map(tuple, sim.pq_adc_topk(
        emb, queries, k=3, probe="join").collect()))
    assert drv == jnd
    assert {q for q, _, _ in drv} == {0, 1, 2, 9001}


def test_rrf_fuse_semantics(spark):
    """rrf_fuse (r14): contribution math, one-armed documents, the
    (score desc, id asc) tie-break, and the input contracts."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        retrieval as rt,
    )

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank long"
    )
    out = {
        r["doc_id"]: r
        for r in rt.rrf_fuse(
            [("x", a), ("y", b)], k=10, rrf_k=60, id_col="doc_id"
        ).collect()
    }
    assert set(out) == {10, 20, 30, 40}
    # doc 20 sums both arms; 10/30/40 ride one arm each (NULL other)
    assert out[20]["x_rank"] == 2 and out[20]["y_rank"] == 1
    assert out[10]["y_rank"] is None and out[40]["x_rank"] is None
    assert out[20]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61
    # fused order: 20 (two arms) first; 10 and 40?  1/61 > 1/62, and
    # the equal-score pair (30 at 1/63 vs nothing) orders by id
    ranks = {d: r["rank"] for d, r in out.items()}
    assert ranks[20] == 1 and ranks[10] == 2 and ranks[40] == 3
    assert ranks[30] == 4
    # equal rrf ties break by id: two docs alone at the same rank
    c = spark.createDataFrame([(7, 1), (3, 1)], "doc_id long, rank long")
    d = spark.createDataFrame(
        [(99, 1)], "doc_id long, rank long"
    ).limit(0)
    tie = rt.rrf_fuse([("u", c), ("v", d)], k=10).collect()
    assert [r["doc_id"] for r in sorted(tie, key=lambda r: r["rank"])] == [3, 7]
    with pytest.raises(ValueError, match="non-empty"):
        rt.rrf_fuse([], k=5)
    with pytest.raises(ValueError, match="distinct"):
        rt.rrf_fuse([("x", a), ("x", b)], k=5)


def test_hybrid_rrf_topk_matches_manual_fusion(spark):
    """hybrid_rrf_topk == manually fusing its two arms' top lists —
    the operator adds exactly the RRF arithmetic, nothing else."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        retrieval as rt,
    )

    docs = read_testdata(spark, SF_SMOKE, "documents")
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = {
        r["doc_id"]: r
        for r in rt.hybrid_rrf_topk(
            docs, emb, ["vector", "join"], queries,
            k=8, k_each=15, rrf_k=60, dim=64,
        ).collect()
    }
    srank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            tx.bm25_topk(docs, ["vector", "join"], k=15).collect()
        )
    }
    vrank = {
        r["vec_id"]: r["rank"]
        for r in sim.brute_force_topk(emb, queries, k=15, dim=64).collect()
    }
    fused = {
        d: (1.0 / (60 + srank[d]) if d in srank else 0.0)
        + (1.0 / (60 + vrank[d]) if d in vrank else 0.0)
        for d in set(srank) | set(vrank)
    }
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert [(d, s) for d, s in want] == [
        (d, got[d]["rrf_score"])
        for d in [d for d, _ in want]
    ]
    for rank_pos, (d, _) in enumerate(want, start=1):
        assert got[d]["rank"] == rank_pos
        assert got[d]["text_rank"] == srank.get(d)
        assert got[d]["vec_rank"] == vrank.get(d)


def test_ivf_filtered_probe_parity_and_pruning(spark, tmp_path):
    """Filtered ANN (r14): the predicate restricts the top-k to
    matching rows only — on BOTH probe modes and BOTH index layouts —
    and `where_range` skips files via the maintained postings' id
    zone maps (conjunctive with the `_list` pruning)."""
    import numpy as np

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
        TxTable,
    )

    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    flt = (F.col("vec_id") >= 100) & (F.col("vec_id") <= 299) & (
        F.col("vec_id") % 2 == 0
    )
    want = sorted(
        map(
            tuple,
            sim.brute_force_topk(
                emb.filter(flt), queries, k=5, dim=64
            ).collect(),
        )
    )
    kw = dict(
        k=5, n_probe=6, dim=64,
        where="vec_id % 2 = 0", where_range=("vec_id", 100, 299),
    )

    # static layout (partitionBy directories)
    static = str(tmp_path / "static")
    sim.build_ivf_index(emb, static, n_lists=6, n_iter=4, seed=3)
    for probe in ("driver", "join"):
        got = sorted(map(tuple, sim.ivf_index_topk(
            spark, static, queries, probe=probe, **kw).collect()))
        assert got == want, probe

    # maintained layout: one file per id-range slice => zone maps on
    # vec_id can skip files the range excludes
    src = TxTable.create(
        spark, str(tmp_path / "src"),
        emb.filter("vec_id < 100").repartition(1),
    )
    for lo in range(100, 500, 100):
        src.append(
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)
            ).repartition(1)
        )
    maint = str(tmp_path / "maint")
    assert sim.refresh_ivf_index(
        spark, src, maint, n_lists=6, n_iter=4, seed=3
    ) == 4
    for probe in ("driver", "join"):
        got = sorted(map(tuple, sim.ivf_index_topk(
            spark, maint, queries, probe=probe, **kw).collect()))
        assert got == want, probe

    # the conjunctive skip itself, on a layout where the second
    # dimension is actually clustered: one file per (bucket, id
    # slice) — read_pruned(extra=) must intersect BOTH zone maps and
    # open a strict subset, and an after-the-fact optimize(zorder_by)
    # is what re-clusters a churned postings table into this shape
    zt_path = str(tmp_path / "zt")
    zt = None
    for bucket in range(2):
        for lo in (0, 100, 200):
            part = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)
            ).select(F.lit(bucket).alias("_list"), "vec_id", "embedding")
            if zt is None:
                zt = TxTable.create(
                    spark, zt_path, part.repartition(1),
                    stats_columns=["_list", "vec_id"],
                )
            else:
                zt.append(part.repartition(1))
    full = zt.read_pruned("_list", 0, 1)
    ranged = zt.read_pruned("_list", 0, 1, extra=[("vec_id", 100, 199)])
    one_bucket = zt.read_pruned(
        "_list", 1, 1, extra=[("vec_id", 100, 199)]
    )
    assert len(full.inputFiles()) == 6
    assert len(ranged.inputFiles()) == 2
    assert len(one_bucket.inputFiles()) == 1
    assert one_bucket.count() == 100
    assert ranged.count() == 200

    # read_pruned(extra=) contract: unknown stats column refused
    with pytest.raises(ValueError, match="zone-map"):
        zt.read_pruned("_list", 0, 5, extra=[("embedding", 0, 1)])


def test_hybrid_rrf_topk_refuses_multi_row_query(spark):
    """The dense arm's query frame must be the hybrid query's one
    vector — a multi-row frame would silently multiply fusion rows."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        retrieval as rt,
    )

    docs = read_testdata(spark, SF_SMOKE, "documents")
    emb = read_testdata(spark, SF_SMOKE, "embeddings")
    two = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError, match="exactly one row"):
        rt.hybrid_rrf_topk(docs, emb, ["vector"], two, k=5)
    with pytest.raises(ValueError, match="exactly one row"):
        rt.hybrid_rrf_topk(docs, emb, ["vector"], two.limit(0), k=5)
