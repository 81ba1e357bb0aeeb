"""Text chunking + junk filtering — SURVEY F7 / the S11 ingest path.

Reference: fixed-size character chunks with overlap (config.py:99-100:
CHUNK_SIZE=1000 / CHUNK_OVERLAP=200, text_splitter.py via
RecursiveCharacterTextSplitter) and junk-pattern / section-name exclusion
(text_splitter.py:17-52, 123-179).

Engine shape: chunking is a pure JVM projection — ``sequence`` over chunk
starts + ``substring`` + ``posexplode`` — so chunking a 100 TB corpus is
shuffle-free and codegen'd. The junk predicate is ``rlike`` over a reduced,
deterministic pattern set (the reference's regexes minus the catastrophic-
backtracking ones, which differ by regex engine anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 1000   # config.py:99
CHUNK_OVERLAP = 200  # config.py:100

#: Junk predicates (engine-owned, deterministic subset of
#: text_splitter.py:17-30): section labels that mark non-scientific content.
JUNK_REGEXES = (
    r"(?i)author\s+contributions?[:.]",
    r"(?i)(funding|financial\s+support)[:.]",
    r"(?i)(conflicts?\s+of\s+interest|competing\s+interests?)[:.]",
    r"(?i)acknowledgm?ents?[:.]",
)


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Fixed-size overlapping character chunks, JVM-side.

    Chunk i covers [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the final chunk is the remainder (>=1
    chunk even for short texts). Output: (id, chunk_idx, chunk, chunk_len).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts, lambda i: F.col(text_col).substr(i * stride + 1, F.lit(chunk_size))
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .filter(F.length("chunk") > 0)
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


def junk_predicate(text: Column) -> Column:
    """F7: true when the text matches any junk pattern."""
    pred = F.lit(False)
    for rx in JUNK_REGEXES:
        pred = pred | text.rlike(rx)
    return pred


def filter_junk_chunks(chunks: DataFrame, chunk_col: str = "chunk") -> DataFrame:
    """Drop junk chunks (text_splitter.py:123-179 exclusion semantics)."""
    return chunks.filter(~junk_predicate(F.col(chunk_col)))
