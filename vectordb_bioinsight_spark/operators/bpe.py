"""Byte-pair-encoding tokenizer training + encoding, Spark-first.

The training-data tier counts tokens with whitespace and BPE-ish regex
heuristics (functions/text.py); this module adds the real thing: learn a
merge table from the corpus (Sennrich et al. 2016, arXiv:1508.07909 — the
standard subword algorithm behind GPT/Llama tokenizers) and apply it,
entirely as DataFrame plans. Extends the reference's token counting
(`backend/app/core/text_splitter.py` counts chars/words per chunk) to the
vocabulary-construction capability an LLM data pipeline needs.

Scale design (the whole point):
* **The corpus is scanned exactly once** — into a frequency-weighted WORD
  vocabulary (``word, n``). Every training iteration then runs over that
  vocab table (distinct words: ~1e5-1e7 rows at any corpus size), never the
  corpus. This is the classic frequency-compression trick: pair counts over
  the corpus equal pair counts over the vocab weighted by word frequency.
* **One driver scalar per iteration**: the argmax pair (count desc, pair
  asc — deterministic). State = the merge list, O(n_merges).
* **Lineage is truncated** every few merges with localCheckpoint (an
  iterative loop otherwise stacks n_merges transforms into one plan).
* **Encoding is scan-local**: a separator-anchored ``replace`` chain (small
  merge tables — stays in whole-stage codegen, and is exactly expressible
  in ANSI SQL, so the encode path is hash-oracle-able) or a broadcast
  merge-dict pandas UDF (large tables).

Greedy-leftmost semantics note: every symbol is INDIVIDUALLY wrapped —
``␟s1␟␟s2␟␟s3␟`` — and merge (l, r) is ``replace('␟l␟␟r␟' -> '␟lr␟')``.
Because each symbol carries its own pair of anchors, a replacement emits a
complete wrapped symbol and the scan can match the immediately following
pair: a run ``a a a a`` merges to ``aa aa`` in ONE pass, exactly BPE's
leftmost non-overlapping rule. (The single-shared-anchor form
``␟a␟a␟a␟a␟`` is WRONG here: the first match consumes the separator the
second needs, merging only every other occurrence per pass — caught by
review, regression-pinned in tests/test_bpe.py.) The wrapping also blocks
token-prefix false matches: ``a bb`` never matches ``␟a␟␟b␟``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Symbol separator / anchors for the replace-chain form. Unit-separator
#: control char — cannot appear in tokenized text (tokenize strips to
#: [a-z0-9]); guarded in encode anyway.
SEP = "\x1f"

#: End-of-word marker appended to each word before learning merges, so the
#: model distinguishes "low" the word from "low" the prefix (the standard
#: Sennrich formulation).
EOW = "</w>"


def words_with_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """The one corpus scan: frequency-weighted word vocabulary.

    Output: (word, n) — distinct lowercase [a-z0-9]+ words with corpus
    counts. All downstream training cost is bounded by THIS table's size,
    not the corpus's.
    """
    from vectordb_bioinsight_spark.functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _spaced(word: Column, eow: bool) -> Column:
    """``hello`` -> ``␟h␟␟e␟␟l␟␟l␟␟o␟␟</w>␟`` — every symbol wrapped in its
    OWN anchor pair (see the module greedy-leftmost note).

    split-by-empty-pattern emits a trailing "" element; filter it so the
    anchor arithmetic stays exact."""
    syms = F.filter(F.split(word, ""), lambda c: F.length(c) > 0)
    if eow:
        syms = F.concat(syms, F.array(F.lit(EOW)))
    return F.concat(F.lit(SEP), F.array_join(syms, SEP + SEP), F.lit(SEP))


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 100,
    min_pair_count: int = 2,
    eow: bool = True,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list [(left, right), ...] — driver-side by design (it IS the
    model, O(n_merges) scalars; the reference ships model files the same
    way).

    Per iteration: adjacent-pair counts over the vocab table (explode of
    per-word symbol arrays weighted by word count, one bounded groupBy),
    deterministic argmax (count desc, left asc, right asc), scan-local
    merge application via the anchored replace. Stops early when no pair
    reaches ``min_pair_count``.
    """
    vocab = (
        words_with_counts(docs, text_col)
        .select(_spaced(F.col("word"), eow).alias("w"), "n")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        inner = F.regexp_replace(F.col("w"), f"^{SEP}|{SEP}$", "")
        syms = F.split(inner, SEP + SEP)
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    syms,
                    F.slice(syms, 2, 1_000_000),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "n",
        ).filter(F.col("p.r").isNotNull())
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
            .first()
        )
        if top is None or top["cnt"] < min_pair_count:
            break
        left, right = top["p"]["l"], top["p"]["r"]
        merges.append((left, right))
        pat = F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}")
        rep = F.lit(f"{SEP}{left}{right}{SEP}")
        vocab = vocab.select(F.replace(F.col("w"), pat, rep).alias("w"), "n")
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_merges:
            # truncate lineage — an iterative loop otherwise compounds one
            # replace per merge into a single enormous plan. Every 4 (not
            # 8) keeps each round's generated pair-agg method comfortably
            # under janino's 64 KB limit (the silent-fallback failure
            # class the r08 sweep caught in bootstrap_rate_ci — SCALING
            # rule 40 coda) at the cost of one extra small-vocab
            # materialization; the final iteration never checkpoints
            # (the vocab is not read again once the merge list completes)
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned model as a DataFrame (rank, left, right) — the shippable
    artifact (write with sources/writers; join-free broadcast dimension)."""
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    eow: bool = True,
) -> DataFrame:
    """Apply a merge list: per word, the anchored replace chain in merge
    order, then split back to subword tokens. Purely scan-local JVM
    expressions (zero shuffle, whole-stage codegen) — and because each
    merge is one literal ``replace``, the whole encode is expressible in
    ANSI SQL, which keeps this path hash-oracle-able.

    Suits the typical inlined-model size (hundreds of merges). For
    multi-10k merge tables prefer :func:`bpe_encode_udf`.

    Output: input columns + ``out_col: array<string>`` of subword tokens
    in reading order (EOW marker stripped).
    """
    from vectordb_bioinsight_spark.functions.text import tokenize

    # EOW strip must happen BEFORE the empty filter: a standalone "</w>"
    # symbol (full word merged away from its marker) must vanish, not
    # survive as ""
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(
                tokenize(text_col),
                lambda w: F.filter(
                    F.transform(
                        F.split(
                            F.regexp_replace(
                                _apply_merges(_spaced(w, eow), merges),
                                f"^{SEP}|{SEP}$",
                                "",
                            ),
                            SEP + SEP,
                        ),
                        lambda t: F.regexp_replace(t, "</w>$", ""),
                    ),
                    lambda t: F.length(t) > 0,
                ),
            )
        ),
    )


def _apply_merges(spaced: Column, merges: list[tuple[str, str]]) -> Column:
    for left, right in merges:
        spaced = F.replace(
            spaced,
            F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
            F.lit(f"{SEP}{left}{right}{SEP}"),
        )
    return spaced


def bpe_encode_udf(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    eow: bool = True,
) -> DataFrame:
    """Encode with a broadcast merge-rank dict and an Arrow-batched pandas
    UDF — the path for LARGE merge tables (a 50k-merge chain of replaces
    would blow the codegen budget). Classic priority-queue-free encode:
    repeatedly merge the best-ranked adjacent pair per word.

    Semantics match :func:`bpe_encode` exactly for any merge list that was
    produced by :func:`bpe_train` (equivalence is test-pinned); the UDF
    applies merges in rank order like the replace chain.
    """
    import pandas as pd

    from vectordb_bioinsight_spark.functions.text import tokenize

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))

    def _encode(*cols):  # no type hints: postponed annotations break
        (words,) = cols  # pandas_udf's hint inference under __future__
        mlist = bc.value

        def one(ws):
            out = []
            for w in ws:
                syms = list(w) + ([EOW] if eow else [])
                for left, right in mlist:
                    i, merged = 0, []
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    syms = merged
                out.extend(s[: -len(EOW)] if eow and s.endswith(EOW) else s for s in syms)
            return [s for s in out if s]

        return words.map(one)

    encode = F.pandas_udf(_encode, "array<string>")
    return df.withColumn(out_col, encode(tokenize(text_col)))
