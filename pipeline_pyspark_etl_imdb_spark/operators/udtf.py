"""Python UDTF surface (Spark 4.x table functions + LATERAL join).

The reference keeps its whole pipeline UDF-free (SURVEY.md §2.9) and so
does this engine's core — but the UDTF/LATERAL shape is part of the API
surface a Spark-native engine must expose, so it's covered here by one
genuinely-useful operator: a text segmenter that explodes each document
into fixed-budget token windows (the "pre-tokenize into model-sized
pieces" step of a training pipeline).

Scale notes: a UDTF is Python-side row generation — Arrow-batched when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is on (set by
``segment_documents``), but still off the codegen path. Use it when the
per-row logic genuinely needs imperative Python; for everything
expressible as builtin expressions (this segmenter included —
``corpus.chunk_documents`` is the expression-only equivalent) the
builtin path wins. The pair exists precisely so the engine covers BOTH
idioms and tests pin them to identical semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

_WS = re.compile(r"\s+")


@udtf(returnType="seg_idx int, n_tokens int, segment string", useArrow=True)
class SegmentText:
    """Explode a document into consecutive ``max_tokens``-word segments.

    One input row -> ceil(n_tokens / max_tokens) output rows; the last
    segment may be short. NULL/empty text yields no rows (LATERAL drops
    the parent row, matching unnest-of-empty-list semantics).
    """

    def eval(self, text: str, max_tokens: int):  # noqa: D102
        if not text:
            return
        toks = [t for t in _WS.split(text) if t]
        for i in range(0, len(toks), max_tokens):
            seg = toks[i : i + max_tokens]
            yield i // max_tokens, len(seg), " ".join(seg)


def segment_documents(
    docs: DataFrame, max_tokens: int = 10, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, seg_idx, n_tokens, segment) via the UDTF + LATERAL join.

    Map-only: the UDTF runs inside the scan stage (no shuffle); Arrow
    batching is pinned at the UDTF itself (``useArrow=True`` on the
    decorator) so NO session conf is mutated as a side effect. The
    temp-view name is derived from md5 of the column names, so it is
    stable across processes (Python's randomized hash() is not) and
    distinct per column pair."""
    import hashlib

    spark: SparkSession = docs.sparkSession
    spark.udtf.register("segment_text", SegmentText)
    tag = hashlib.md5(f"{text_col}:{id_col}".encode()).hexdigest()[:8]
    view = f"__udtf_docs_{tag}"
    docs.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT {id_col}, s.seg_idx, s.n_tokens, s.segment
        FROM {view}, LATERAL segment_text({text_col}, {max_tokens}) s
        """
    )
