"""Python UDTFs (SURVEY.md §2.10 D5) — the one-row-to-many-rows user
extension tier (Spark 3.5+/4 ``@udtf``), completing the UDF ladder:
scalar pandas_udf → grouped applyInPandas → mapInPandas → table
function.

A UDTF is the RIGHT tool when the fan-out logic is imperative (stateful
per-row parsing, irregular record splitting) and can't be spelled as
``explode(expr)``. It runs row-at-a-time in Python — the slow path —
so anything expressible as explode + codegen expressions (see
queries_extra.top_tokens_docs) should stay native; sentence splitting
here is the deliberately-simple capability pin.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# \s-based trim on both engines (Python re and RE2 agree on ASCII
# whitespace; str.strip() would also eat \x0b/\x0c, which RE2's \s does
# not — a real cross-engine hash mismatch, pinned by the oracle).
_EDGE_WS = re.compile(r"^\s+|\s+$")
_SENTENCE_BREAK = re.compile(r"[.!?]+")


@udtf(returnType="sentence_idx int, sentence string")
class SplitSentences:
    """text -> one row per non-empty sentence, 0-indexed in order."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        i = 0
        for part in _SENTENCE_BREAK.split(text):
            p = _EDGE_WS.sub("", part)
            if p:
                yield (i, p)
                i += 1


def register_udtfs(spark) -> None:
    """Idempotently register the package's UDTFs for SQL use
    (``..., LATERAL split_sentences(text)``)."""
    spark.udtf.register("split_sentences", SplitSentences)
