"""Round-3 curation-surface queries: Gopher repetition signals, PII
redaction, winnowing fingerprints, mixture upsampling.

These extend the LLM-pipeline north star (BASELINE.json) beyond the
round-2 surface. Hard-gate coverage for the operator family lives in
the gated ``text_profile_docs`` suite (queries_suites.py, inside the
driver's 50-query window); the queries here are the granular
spellings — tail-registered, benchmarked, and locally oracle-gated by
tests/test_oracle_parity.py like every other registry entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import duckdb_hash56_sql
from .operators import dedup as dd
from .operators import sampling as sp
from .operators import text as tx
from .queries import register
from .sources.files import read_testdata

_D_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def _micro_sql(num: str, den: str) -> str:
    return f"CASE WHEN ({den}) > 0 THEN (({num}) * 1000000) // ({den}) ELSE 0 END"


# ---------------------------------------------------------------------------
# Gopher top-n-gram repetition: per-document most frequent word 2-gram
# and the fraction of the document's characters it covers. The one
# repetition signal that needs a shuffle (explode → groupBy → window
# top-1; two exchanges total, both clustered on doc_id).
# ---------------------------------------------------------------------------


@register(
    "gopher_repetition_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, length(text) AS n_chars, {_D_TOKS} AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id, n_chars,
             unnest(list_transform(generate_series(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i + 1])) AS gram
      FROM toks WHERE len(tk) >= 2
    ),
    gc AS (
      SELECT doc_id, n_chars, gram, COUNT(*) AS gram_count
      FROM grams GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT doc_id, gram, gram_count, n_chars,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY gram_count DESC, gram ASC) AS rn
      FROM gc
    )
    SELECT doc_id, gram AS top_gram, CAST(gram_count AS BIGINT) AS gram_count,
           CAST(({_micro_sql("gram_count * length(gram)", "n_chars")}) / 1000000.0
                AS DOUBLE) AS top_gram_char_frac
    FROM top WHERE rn = 1
    """,
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return tx.top_ngram_stats(docs, text_col="text", id_col="doc_id", n=2)


# ---------------------------------------------------------------------------
# PII scrub: the corpus has no PII, so both engines append the SAME
# deterministic synthetic email/IP/phone per doc (the
# attach_png_payload pattern, multimodal.py) — the detector and the
# redactor are then verified on real matches, byte-for-byte.
# ---------------------------------------------------------------------------


# Deterministic synthetic PII (same bytes in both engines) — shared
# with the gated curation_suite (queries_suites.py).
PII_SYNTH_SQL = (
    "text || ' contact u' || doc_id || '@ex-' || (doc_id % 7) || '.org ip 10.'"
    " || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) || ' tel +1'"
    " || lpad(CAST((doc_id * 37) % 1000000000 AS VARCHAR), 9, '0')"
)


def pii_synth_col() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact u"), d.cast("string"),
        F.lit("@ex-"), (d % 7).cast("string"), F.lit(".org ip 10."),
        (d % 256).cast("string"), F.lit(".0."), ((d * 3) % 256).cast("string"),
        F.lit(" tel +1"),
        F.lpad(((d * 37) % 1_000_000_000).cast("string"), 9, "0"),
    )


def _pii_oracle() -> str:
    email, ip, phone = tx.PII_EMAIL, tx.PII_IPV4, tx.PII_PHONE
    return f"""
    WITH s AS (SELECT doc_id, {PII_SYNTH_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{ip}'))    AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{email}', '<EMAIL>', 'g'),
               '{ip}', '<IP>', 'g'),
               '{phone}', '<PHONE>', 'g') AS redacted
    FROM s
    """


@register("pii_redact_docs", _pii_oracle())
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    synth = pii_synth_col()
    counts = tx.pii_counts(synth)
    return docs.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
        tx.redact_pii(synth).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS): per-doc count + checksum of the
# selected fingerprint set — the aggregate view of
# dedup.winnow_fingerprints' (doc_id, fp) pairs, fully oracle-exact
# through the shared md5 hash family.
# ---------------------------------------------------------------------------

_WINNOW_HASH = duckdb_hash56_sql("substr(t, CAST(pos AS INT), 8)")


@register(
    "winnow_fingerprint_docs",
    f"""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ),
    p AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(length(t) - 7, 1))) AS pos
      FROM n
    ),
    h AS (
      SELECT doc_id, pos, ({_WINNOW_HASH}) % 4294967296 AS hv FROM p
    ),
    m AS (
      SELECT doc_id,
             MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
      FROM h
    ),
    d AS (SELECT DISTINCT doc_id, fp FROM m)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
           CAST(SUM(fp) AS BIGINT) AS fp_sum
    FROM d GROUP BY doc_id
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    fps = dd.winnow_fingerprints(docs, text_col="text", id_col="doc_id", k=8, window=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.sum("fp").alias("fp_sum"),
    )


# ---------------------------------------------------------------------------
# Mixture upsampling: fractional epochs per language (zh 2.5×, de
# 1.5×, es 1.0×, en 0.3×, fr 0× — rows vanish), reported per
# language. Deterministic: same copies every run, any partitioning.
# ---------------------------------------------------------------------------

_MIX = {"en": 0.3, "zh": 2.5, "es": 1.0, "de": 1.5, "fr": 0.0}
_MIX_SEED = 11


def _mixture_oracle() -> str:
    copies = sp.duckdb_upsample_sql(
        "lang", _MIX, key_cols=["doc_id"], seed=_MIX_SEED, default_multiplier=1.0
    )
    return f"""
    WITH c AS (SELECT doc_id, lang, {copies} AS copies FROM documents),
    e AS (SELECT doc_id, lang, unnest(generate_series(1, copies)) AS copy_idx FROM c)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(copy_idx) AS BIGINT) AS copy_sum
    FROM e GROUP BY lang
    """


@register("mixture_upsample_docs", _mixture_oracle())
def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    up = sp.repeat_upsample(
        docs, "lang", _MIX, key_cols=["doc_id"], seed=_MIX_SEED, default_multiplier=1.0
    )
    return up.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("copy_idx").cast("long").alias("copy_sum"),
    )
