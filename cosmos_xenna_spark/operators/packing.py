"""Training-sequence construction: GPT-style concat-and-chunk packing
and RAG-style overlapping text chunking.

``pack_sequences`` maps a document corpus onto fixed-length training
sequences the way LLM pretraining loaders do: conceptually concatenate
every document's tokens in a deterministic corpus order and split the
stream into ``seq_len``-token sequences (documents straddle sequence
boundaries). The output is the *assignment table* — one row per
(sequence, document-slice) — which is what a distributed writer needs
to materialize shards. The global token offset of each document is an
exact distributed prefix sum (:func:`..ranking.global_cumsum` — quantile
buckets + driver-literal offsets, never a single-partition window), and
the per-document sequence fan-out is a row-local ``sequence`` explode.
Total shape at 100 TB: one approxQuantile pass, one small counts job,
one hash shuffle by bucket — no global sort, no single partition.

``chunk_text`` splits each document into overlapping word windows
(chunk size / stride), the standard RAG indexing transform; purely
row-local (one explode, no shuffle).

Reference parity: the reference pipelines leave sharding/packing to
user stages over opaque samples (e.g. the caption pipeline in
``/root/reference/examples/simple_vlm_inference.py``); here it is a
first-class relational operator with an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.ranking import global_cumsum


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign whitespace tokens of each document to fixed-length
    training sequences (concat-and-chunk, documents straddle).

    Returns one row per (seq_id, doc) slice:
      - ``seq_id``: 0-based sequence index,
      - ``doc_id``: the source document,
      - ``doc_tok_start`` / ``doc_tok_end``: the half-open token range
        of the document that lands in this sequence (document-relative,
        0-based),
      - ``seq_offset``: where that slice starts within the sequence.

    All outputs BIGINT. Corpus order is ``id_col`` ascending; token
    count is ``size(split(text, ' '))``.
    """
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("__n_tok"),
    )
    with_end = global_cumsum(base, "__n_tok", [id_col], out_col="__end")
    laid = with_end.select(
        id_col,
        "__n_tok",
        (F.col("__end") - F.col("__n_tok")).alias("__start"),
    )
    lo = F.expr(f"__start DIV {seq_len}")
    hi = F.expr(f"(__start + __n_tok - 1) DIV {seq_len}")
    exploded = laid.select(
        id_col,
        "__n_tok",
        "__start",
        F.explode(F.sequence(lo, hi)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    return exploded.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.col(id_col),
        F.greatest(F.lit(0).cast("bigint"), seq_start - F.col("__start")).alias(
            "doc_tok_start"
        ),
        F.least(
            F.col("__n_tok"), seq_start + seq_len - F.col("__start")
        ).alias("doc_tok_end"),
        F.greatest(F.lit(0).cast("bigint"), F.col("__start") - seq_start).alias(
            "seq_offset"
        ),
    )


def chunk_text(
    docs: DataFrame,
    chunk_words: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping word windows (RAG chunking).

    Chunk ``i`` covers words ``[i*stride, i*stride + chunk_words)``
    where ``stride = chunk_words - overlap``; the last chunk may be
    short. One chunk minimum per document. Row-local explode, no
    shuffle. Returns (doc_id, chunk_id, chunk_text, n_words).
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("require 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    base = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__ws")
    )
    # number of chunks: 1 + ceil(max(0, n - chunk) / stride)
    n_chunks = F.expr(
        f"1 + CAST(ceil(greatest(0, size(__ws) - {chunk_words}) / {stride}.0) AS BIGINT)"
    )
    exploded = base.select(
        id_col,
        "__ws",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    piece = F.expr(f"slice(__ws, chunk_id * {stride} + 1, {chunk_words})")
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_words"),
    )
