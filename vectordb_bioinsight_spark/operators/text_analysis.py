"""Text-analysis operators — BASELINE extension (LLM-data-pipeline ops).

Language-ID heuristic, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. All pure column
expressions — a 100 TB corpus pass is an embarrassingly parallel projection
with predicate/column pruning intact (only ``doc_id, text`` are read).

Reference analogs: junk-content predicate (backend/app/core/text_splitter.py:
17-52, 123-179), keyword tokenize + stopword discipline
(backend/app/utils/trend_analyzer.py:216-230).
"""

from __future__ import annotations

from pyspark import StorageLevel
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64
from vectordb_bioinsight_spark.functions.text import STOPWORDS, punct_ratio, token_count, tokenize

#: Tiny per-language stopword profiles for the n-gram/stopword language
#: heuristic. Deterministic and SQL-expressible; a real model would be a
#: broadcast dimension table with the same join shape.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "for", "with", "that"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("los", "las", "que", "una", "por"),
    "fr": ("les", "des", "une", "est", "pour"),
}


def quality_score_expr(text_col: str | F.Column, toks: F.Column | None = None) -> F.Column:
    """The deterministic [0,1] quality heuristic of :func:`text_stats` as a
    single scan-local column expression (rounded 6 dp, identical to the
    ``quality_score`` column), so pipelines can GATE on quality without
    joining the stats table back onto the corpus — that join re-scans the
    corpus and shuffles for a value derivable in the same projection.

    ``toks``: pass an existing token-array column to share one tokenize.
    """
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    if toks is None:
        toks = tokenize(text)
    n_tok = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = F.when(n_tok > 0, n_sw.cast("double") / n_tok).otherwise(F.lit(0.0))
    pr = punct_ratio(text)
    quality = (
        F.least(n_tok.cast("double") / 20.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(pr * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
    )
    return F.round(quality, 6)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token/char/quality statistics.

    Output: (doc_id, n_chars, n_tokens, n_distinct_tokens, avg_token_len,
    punct_ratio, stopword_ratio, quality_score). All ratios rounded 6 dp.
    quality_score is a deterministic [0,1] heuristic: penalize very short
    docs, high punctuation, low stopword incidence — the reference's junk
    heuristics re-expressed as a score.
    """
    # project the token array ONCE — four downstream expressions share it
    # (an explicit projection instead of trusting codegen subexpression
    # elimination across higher-order functions), and count stopword hits
    # with isin (InSet hash probe), not an O(|SW|) array_contains scan
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        tokenize(text_col).alias("_toks"),
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = F.when(n_tok > 0, n_sw.cast("double") / n_tok).otherwise(F.lit(0.0))
    avg_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    pr = punct_ratio(F.col("_text"))
    quality = quality_score_expr("_text", toks=toks)
    return staged.select(
        F.col("doc_id"),
        F.length(F.col("_text")).cast("long").alias("n_chars"),
        token_count("_text").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language heuristic. Output (doc_id, lang_pred, lang_hits).

    Picks the language whose profile words occur most often (ties broken by
    lexicographically-last language code — a total, deterministic order).
    ``unknown`` when nothing hits.
    """
    toks = tokenize(F.col(text_col), min_len=2)
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(w) for w in words]), t))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    # Struct comparison is field-by-field: desc sort gives max hits, then
    # lexicographically-last lang on ties — a total order.
    best = F.sort_array(F.array(*scores), asc=False).getItem(0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("unknown")).alias("lang_pred"),
        best.getField("hits").cast("long").alias("lang_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: portable 64-bit hash of the normalized token
    stream (case/punct-insensitive content identity — 'rolling hash' family).

    Output (doc_id, fp). Two docs with identical token streams share fp.
    """
    normalized = F.concat_ws(" ", tokenize(text_col))
    return df.select(F.col(id_col).alias("doc_id"), portable_hash64(normalized).alias("fp"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm) — the *rolling-hash* fingerprint family: hash every k-gram of
    the token stream, then keep the minimum hash of each sliding window of
    ``window`` consecutive k-gram hashes.

    Guarantee: two documents sharing any token run of length >= window+k-1
    share at least one fingerprint — substring-level containment detection,
    where whole-doc hashing (``fingerprint``) only catches full equality and
    MinHash estimates set overlap.

    Entirely JVM array expressions per row (transform/slice/array_min) — no
    explode of the k-gram stream, no Python; the only wide operation is the
    final distinct fingerprint set per doc. Output: (doc_id, fp) exploded,
    distinct per doc.

    Each stage is MATERIALIZED as a projected column before the next refers
    to it. Inlining ``hashes`` into the window-min transform re-evaluates
    the whole hash array once per window position — O(grams × windows) md5
    calls per document (quadratic; measured as a hang at sf0.1). Staged
    projections evaluate each array once per row.
    """
    toks_df = df.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    grams_df = toks_df.select(
        "doc_id",
        F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_grams"),
    )
    hash_df = grams_df.select(
        "doc_id", F.transform(F.col("_grams"), lambda g: portable_hash64(g)).alias("_h")
    )
    hashes = F.col("_h")
    mins = F.when(
        F.size(hashes) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(hashes) - (window - 1)),
            lambda i: F.array_min(F.slice(hashes, i, window)),
        ),
    ).otherwise(
        # shorter than one window: the global min is the single fingerprint
        F.when(F.size(hashes) > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return hash_df.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    drop_stopwords: bool = True,
) -> DataFrame:
    """V11: TF-IDF keyword extraction — top-k weighted terms per document.

    idf uses the sklearn TfidfVectorizer default (smooth_idf=True):
    ``idf(t) = ln((1 + N) / (1 + df(t))) + 1``; the reference declares
    exactly that capability (trend_analyzer.py:21, TfidfVectorizer import
    guarded by SKLEARN_AVAILABLE). sklearn's per-doc L2 normalization is
    omitted: it rescales all of a doc's weights by one positive constant, so
    the per-doc ranking this operator returns is identical.

    Physical plan (three shuffles, all map-side combinable or broadcast):
      1. postings: tokenize scan → groupBy(doc, term) count — the only
         corpus-sized shuffle;
      2. df(t): groupBy(term) over the postings (postings are already
         distinct per (doc, term), so count(*) IS the document frequency) —
         output is vocabulary-sized, so the join back is left declarative
         and AQE broadcasts it only when it is actually small (a 100 TB
         corpus's long-tail vocabulary can exceed any broadcast budget);
         the 1-row corpus count is always broadcast;
      3. per-doc top-k: window over doc_id on the postings, ranked by the
         ROUNDED weight (+ term tiebreak) for cross-engine hash stability.

    Output: (doc_id, term, tf, tfidf, rk) — best-first per doc.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("term")
    )
    if drop_stopwords:
        toks = toks.filter(~F.col("term").isin(*STOPWORDS))
    postings = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    n_docs = df.agg(F.count("*").cast("double").alias("_n"))
    term_df = postings.groupBy("term").agg(F.count("*").cast("double").alias("_df"))
    scored = (
        postings.join(term_df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((1.0 + F.col("_n")) / (1.0 + F.col("_df"))) + 1.0), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rk")
    )


def keyword_and_match(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
) -> DataFrame:
    """F10: keep only documents containing ALL query keywords — the
    reference's AND-logic relevance gate (precision_search.py:540-545:
    ``len(matched_keywords) == len(keywords)``), with its substring-
    containment match (``kw_lower in content``) on the lowercased text.

    A pure projection + filter (no shuffle, predicate fully pushable):
    matched = the keyword literals found in the text; rows survive iff
    every keyword matched. Output: (doc_id, n_matched, matched_keywords
    as a sorted CSV string — scalar, canonicalizer-safe).
    """
    kws = sorted({k.lower() for k in keywords})
    matched = F.filter(
        F.array(*[F.lit(k) for k in kws]),
        lambda kw: F.contains(F.lower(F.col(text_col)), kw),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(matched).alias("n_matched"),
            F.concat_ws(",", matched).alias("matched_keywords"),
        )
        .filter(F.col("n_matched") == len(kws))
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText quality
    rules (Rae et al. 2021, §A1.1: "fraction of duplicate n-grams") used by
    every production pretraining-data pipeline:

    * dup_2gram_ratio / dup_3gram_ratio = 1 - distinct/total n-grams,
    * top_token_ratio = occurrences of the most frequent token / n_tokens,
    * bpe_tokens = the BPE-ish pretokenizer budget (corpus accounting).

    Pure per-row array expressions (tokenize once, shingle, distinct) — an
    embarrassingly parallel projection at any corpus size, like text_stats.
    Output ratios rounded 6 dp; empty/short docs yield 0 ratios.
    """
    from vectordb_bioinsight_spark.functions.text import bpe_token_count, shingles_from_tokens

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        tokenize(text_col).alias("_toks"),
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)

    def dup_ratio(n: int):  # noqa: ANN202
        grams = shingles_from_tokens(toks, n)
        total = F.size(grams)
        return F.when(
            total > 0, 1.0 - F.size(F.array_distinct(grams)).cast("double") / total
        ).otherwise(F.lit(0.0))

    # top-token frequency via the (token, count) histogram of the row's array
    counts = F.transform(
        F.array_distinct(toks), lambda t: F.size(F.filter(toks, lambda x: x == t))
    )
    top_ratio = F.when(
        n_tok > 0, F.array_max(counts).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    return staged.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        bpe_token_count(F.col("_text")).cast("long").alias("bpe_tokens"),
        F.round(dup_ratio(2), 6).alias("dup_2gram_ratio"),
        F.round(dup_ratio(3), 6).alias("dup_3gram_ratio"),
        F.round(top_ratio, 6).alias("top_token_ratio"),
    )


def unigram_logprob_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-model quality scoring, the CCNet/perplexity-filter shape
    (Wenzek et al. 2019): score each document by its mean token log-
    probability under a unigram model fitted ON THE CORPUS ITSELF — the
    distributed analog of "train a LM on clean data, keep low-perplexity
    docs". Outlier docs (junk, boilerplate, wrong language) score far below
    the corpus mode.

    Physical plan: postings groupBy (the only corpus shuffle) → global
    vocabulary counts (second, vocabulary-sized agg left declarative for
    AQE broadcast) → per-doc weighted sum. No OOV smoothing is needed: the
    model's support is exactly the corpus vocabulary.

    Output: (doc_id, n_tokens, avg_logprob, perplexity) rounded 6 dp; docs
    with no tokens are dropped (nothing to score).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("term")
    )
    postings = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    vocab = postings.groupBy("term").agg(F.sum("tf").cast("double").alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_tot"))
    scored = (
        postings.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * F.log(F.col("_cnt") / F.col("_tot"))) / F.sum("tf")).alias(
                "_avg_lp"
            ),
        )
    )
    # perplexity is derived from the ROUNDED avg_logprob so both numbers
    # stay cross-engine stable (exp amplifies last-ulp sum-order noise)
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("_avg_lp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.round(F.col("_avg_lp"), 6)), 6).alias("perplexity"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark-contamination detection — the eval-decontamination step of
    a pretraining pipeline: flag corpus documents sharing verbatim token
    runs with any benchmark document, via winnowing fingerprint overlap
    (the MOSS guarantee: any shared run of >= window+k-1 tokens shares a
    fingerprint, so substring-level contamination cannot hide from this
    join the way it hides from whole-doc hashing).

    Physical plan: fingerprint both sides (scan-local array expressions),
    equi-join on the fingerprint value (benchmark side is the small one —
    left declarative for AQE to broadcast), count distinct shared prints
    per (corpus_doc, benchmark_doc). ``min_shared`` suppresses single-
    fingerprint coincidences.

    Output: (doc_id, bench_id, n_shared) with n_shared >= min_shared.
    """
    fp_c = winnow_fingerprints(corpus, id_col, text_col, k=k, window=window)
    fp_b = winnow_fingerprints(benchmark, id_col, text_col, k=k, window=window).withColumnRenamed(
        "doc_id", "bench_id"
    )
    return (
        fp_c.join(fp_b, "fp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dsir_logratio_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: "F.Column",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    document by the log-likelihood ratio of its hashed n-gram features under
    a target-domain model vs the raw-corpus model. High scorers "look like"
    the target domain; select top-k (or gumbel-resample) for training.

    Features are unigrams + bigrams hashed into ``n_buckets`` buckets
    (the paper's hashed n-gram generative model), both models Laplace
    +1-smoothed over the bucket space, so OOV is impossible by construction.

    Output: (id, n_feats, dsir_score) where dsir_score is the MEAN per-
    feature log-ratio, rounded 6 dp (mean, not sum, so the score is
    length-invariant like the perplexity filter it complements).

    Physical plan: feature hashing is scan-local; the two model fits are one
    map-side-combinable groupBy on a bounded key space (≤ n_buckets rows —
    broadcastable by construction); per-doc scoring joins docs' bucket
    counts against the tiny model table. The bucket space bounds state at
    100 TB: model size is O(n_buckets), never O(vocabulary).
    """
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_tgt"),
        tokenize(text_col).alias("_toks"),
    )
    feats = toks.select(
        "doc_id",
        "_tgt",
        F.explode(
            F.concat(F.col("_toks"), shingles_from_tokens("_toks", 2))
        ).alias("_feat"),
    ).select(
        "doc_id",
        "_tgt",
        F.pmod(portable_hash64("_feat"), F.lit(n_buckets)).alias("_b"),
    )
    # DSIR is inherently two-pass (fit the bucket model, then score every
    # doc against it), and both passes read the hashed-feature counts.
    # Materialize them ONCE (spill-capable) instead of re-running the
    # tokenize+explode+hash scan per pass — AQE does not reuse the exchange
    # across the two consumers (verified on the physical plan), so without
    # this the corpus is scanned twice. CacheManager keys on the canonical
    # plan, so repeated invocations share one entry. Measured 2.7 s → 1.0 s
    # at sf0.1; at 100 TB this is the difference between one and two full
    # corpus scans.
    doc_counts = feats.groupBy("doc_id", "_b").agg(
        F.count("*").cast("long").alias("tf"),
        F.max(F.col("_tgt")).alias("_tgt"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bucket_counts = doc_counts.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(0)).alias("ct"),
        F.sum("tf").alias("cr"),
    )
    totals = bucket_counts.agg(
        F.sum("ct").cast("double").alias("Tt"), F.sum("cr").cast("double").alias("Tr")
    )
    logratio = F.log(
        (F.col("ct") + 1) / (F.col("Tt") + F.lit(float(n_buckets)))
    ) - F.log((F.col("cr") + 1) / (F.col("Tr") + F.lit(float(n_buckets))))
    return (
        doc_counts.join(bucket_counts, "_b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("tf") * logratio) / F.sum("tf"), 6).alias("dsir_score"),
        )
    )


def compression_ratio_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Compression-ratio quality signal: zlib-compressed size / raw size per
    document (the Gopher-rules companion signal — highly repetitive or
    templated text compresses far below normal prose; random noise
    compresses above it). Both tails are filter candidates.

    Runs as an Arrow-batched pandas UDF (zlib is not expressible as a JVM
    expression); per-row work is one deflate over the document bytes — CPU-
    bound, scan-local, no shuffle. No SQL twin exists (DuckDB has no zlib),
    so catalog exposure would be rows-only; semantics are pinned by unit
    tests against Python zlib directly.

    Output: (id, n_bytes, n_compressed, compression_ratio[4dp]).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _csize(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        )

    out = df.select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        _csize(F.col(text_col)).alias("n_compressed"),
    )
    return out.withColumn(
        "compression_ratio",
        F.round(
            F.when(F.col("n_bytes") > 0, F.col("n_compressed") / F.col("n_bytes"))
            .otherwise(F.lit(0.0)),
            4,
        ),
    )


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Bigram-LM quality scoring — the next rung above
    :func:`unigram_logprob_scores` on the CCNet ladder (their production
    filter is a 5-gram KenLM; the distributed trick is identical at every
    order): score each doc by its mean conditional token log-probability
    p(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V) under the corpus-fitted,
    add-α-smoothed bigram model. Junk/templated text diverges from the
    corpus transition structure even when its unigram mix looks normal.

    Output: (doc_id, n_bigrams, avg_logprob, perplexity), rounded 6 dp;
    docs with < 2 tokens are dropped (no bigram to score).

    Physical plan: one exploded bigram projection feeding (a) the per-doc
    counts and (b) the corpus bigram model (two map-side-combinable
    groupBys); the context model and V are vocabulary-bounded joins AQE
    broadcasts. Same shuffle discipline as the unigram op — model size is
    O(distinct bigrams), never corpus size.
    """
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_toks")
    )
    big = toks.select(
        "doc_id", F.explode(shingles_from_tokens("_toks", 2)).alias("bg")
    )
    uni = toks.select("doc_id", F.explode(F.col("_toks")).alias("w"))
    doc_bg = big.groupBy("doc_id", "bg").agg(F.count("*").cast("long").alias("tf"))
    model_bg = doc_bg.groupBy("bg").agg(F.sum("tf").cast("double").alias("cbg"))
    model_ctx = (
        uni.groupBy(F.col("w").alias("ctx")).agg(F.count("*").cast("double").alias("cctx"))
    )
    vocab_n = model_ctx.agg(F.count("*").cast("double").alias("V"))
    a = F.lit(float(alpha))
    ctx_of = F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
    scored = (
        doc_bg.join(model_bg, "bg")
        .withColumn("_ctx", ctx_of)
        .join(model_ctx, F.col("_ctx") == F.col("ctx"))
        .crossJoin(F.broadcast(vocab_n))
        .withColumn(
            "_lp", F.log((F.col("cbg") + a) / (F.col("cctx") + a * F.col("V")))
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        (F.sum(F.col("tf") * F.col("_lp")) / F.sum("tf")).alias("_avg"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round("_avg", 6).alias("avg_logprob"),
        F.round(F.exp(-F.round(F.col("_avg"), 6)), 6).alias("perplexity"),
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_matches: int = 1,
) -> DataFrame:
    """Exact n-gram eval-decontamination — the GPT-3 appendix-C recipe
    (Brown et al. 2020) and the PaLM/Llama variant: a corpus document is
    contaminated when it shares >= ``min_matches`` distinct verbatim
    n-grams with ANY benchmark document. The winnowing twin
    (:func:`contamination_check`) samples fingerprints for long-run
    detection; this one inventories EVERY n-gram, the published standard
    for eval-set overlap (n=13 on word tokens in GPT-3; configurable here
    because synthetic docs are short).

    Output: one row per corpus doc — (doc_id, n_matched, contaminated) —
    clean docs included with n_matched = 0, so the result is directly
    usable as a keep/drop gate.

    Physical plan at 100 TB: both sides' n-grams are scan-local array
    expressions hashed to 64-bit (functions/hashing.py) so the join key
    is 8 bytes, never the gram string. The benchmark inventory is
    dimension-sized (eval sets are MBs) -> explicitly broadcast; the
    corpus side shuffles only (doc_id, hash) AFTER the broadcast
    semi-match, i.e. shuffle volume is proportional to CONTAMINATED
    grams, not corpus grams. The final left join restores clean docs.
    """
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    def _grams(df: DataFrame) -> DataFrame:
        # project the token array BEHIND the explode boundary: inlining
        # tokenize() into the shingle lambda re-runs the regex split per
        # element_at reference (no CSE inside higher-order functions,
        # SCALING.md rule 25) — measured 140 s -> 17 s at 1M docs
        toked = df.select(
            F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_toks")
        )
        return toked.select(
            "doc_id", F.explode(shingles_from_tokens("_toks", n)).alias("_g")
        ).select("doc_id", portable_hash64("_g").alias("gh"))

    bench_grams = _grams(benchmark).select("gh").distinct()
    # broadcast-join FIRST, dedup after: the (doc_id, gh) distinct then
    # shuffles only grams that matched the benchmark — the semantics are
    # identical (distinct of an inner join == join of distincts here) but
    # the 1M-doc probe went 244 s -> join-first cost, because distinct-
    # before-join shuffles EVERY corpus gram
    matched = (
        _grams(corpus)
        .join(F.broadcast(bench_grams), "gh")
        .distinct()  # count each shared gram once per doc
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_matched"), F.lit(0).cast("long")).alias("n_matched"),
            (F.coalesce(F.col("n_matched"), F.lit(0)) >= min_matches).alias("contaminated"),
        )
    )


#: per-process cache of the hashed-linear weight Literal Columns — pure
#: constants keyed by (n_buckets, seed); see hashed_linear_quality.
_WEIGHT_LITERALS: dict = {}


def hashed_linear_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """fastText-style linear quality-classifier scoring (Joulin et al.
    2016) — the "quality classifier" gate of the CCNet / LLaMA / GPT-3
    data pipelines: hashed bag-of-words features, one weight per bucket,
    sigmoid of the mean feature weight as the keep score.

    The weight vector here is a deterministic hash-derived stand-in
    (training the real classifier is external model fitting, like
    embedding inference — see operators/inference.py); the SCORING plan
    is the real one and is what matters at corpus scale: bucket ids and
    weights are computed inline per token, so the whole operator is a
    scan-local projection — zero shuffles, zero model table, O(n_buckets)
    state by construction. A trained model would swap the weight
    expression for a broadcast array literal, same plan shape.

    Weights are dyadic rationals (integer/1024), so the per-doc sum is
    EXACT in binary floating point regardless of summation order —
    cross-engine hashable without rounding tricks.

    Output: (doc_id, n_tokens, quality_logit, quality_score, keep);
    empty docs score logit 0 -> 0.5 -> kept (neutral prior).
    """
    import hashlib

    # the weight vector is a pure function of the bucket id, so it is
    # precomputed driver-side (n_buckets hashes, once per PROCESS) and
    # inlined as ONE pre-folded Literal — the scan then pays one md5 per
    # token (bucket id) + an array lookup, not two md5s (measured ~2x at
    # 1M docs). This is also the exact shape a TRAINED model takes: swap
    # the literal for its weight array. Values match the salted-hash
    # formula bit-for-bit (dyadic rationals), so the SQL twin is
    # unchanged. The r09 form parsed a 4096-element array(...) SQL string
    # per call: parsing is ~4 ms, but ANALYSIS walks the 4096-child
    # CreateArray on every downstream Dataset op (~280 ms per select,
    # ~0.5 s of the query's build); a single-node Literal (F.lit of the
    # numpy array — identical values, r10 twin-checked) analyzes in ~0 ms
    # and is cached per (n_buckets, seed) because its own creation costs
    # ~0.5 s of py4j element conversion. A cached CONSTANT expression,
    # never data: the exact MINHASH_PERMS precedent.
    def _bucket_weight(b: int) -> float:
        h = int(hashlib.md5(f"{seed}|{b}".encode()).hexdigest()[:15], 16)
        return ((h % 2001) - 1000) / 1024.0

    warr = _WEIGHT_LITERALS.get((n_buckets, seed))
    if warr is None:
        import numpy as np

        warr = F.lit(
            np.array([_bucket_weight(b) for b in range(n_buckets)], dtype=np.float64)
        )
        _WEIGHT_LITERALS[(n_buckets, seed)] = warr

    def _w(tok: F.Column) -> F.Column:
        return F.element_at(warr, (portable_hash64(tok) % n_buckets + 1).cast("int"))

    toks = tokenize(text_col)
    wsum = F.aggregate(F.transform(toks, _w), F.lit(0.0), lambda acc, v: acc + v)
    n = F.size(toks)
    logit = F.round(F.when(n > 0, wsum / n).otherwise(F.lit(0.0)), 6)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        logit.alias("quality_logit"),
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


def class_tfidf_top_terms(
    df: DataFrame,
    class_col: str,
    text_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Class-based TF-IDF (the BERTopic c-TF-IDF formulation, Grootendorst
    2022) — label every document CLUSTER with its most characteristic
    terms: score(t, c) = (tf(t,c) / |c|) * ln(1 + A / f(t)) with A the
    average cluster token count and f(t) the corpus term frequency. The
    cluster-interpretation step that follows any clustering/semdedup pass
    (reference analog: the keyword summaries the trends tier attaches to
    topic groups, trend_analyzer.py).

    Physical plan: one token explode -> ONE (class, term) groupBy; the
    per-class totals and the global average are class-cardinality
    aggregates (broadcast); the term-frequency join is term-keyed
    (AQE-sized). Top-n per class via a class-partitioned rank window.

    Output: (class, term, tf, ctfidf, rank), ties to the smaller term.
    """
    from pyspark.sql import Window

    toked = df.select(
        F.col(class_col).alias("cls"), tokenize(text_col).alias("_toks")
    )
    toks = toked.select("cls", F.explode(F.col("_toks")).alias("term"))
    tf = toks.groupBy("cls", "term").agg(F.count("*").cast("long").alias("tf"))
    ctot = tf.groupBy("cls").agg(F.sum("tf").cast("double").alias("_ct"))
    avg_ct = ctot.agg(F.avg("_ct").alias("_A"))
    fterm = tf.groupBy("term").agg(F.sum("tf").cast("double").alias("_f"))
    scored = (
        tf.join(F.broadcast(ctot), "cls")
        .join(fterm, "term")
        .crossJoin(F.broadcast(avg_ct))
        .withColumn(
            "ctfidf",
            F.round(
                (F.col("tf") / F.col("_ct")) * F.log(1.0 + F.col("_A") / F.col("_f")),
                6,
            ),
        )
    )
    w = Window.partitionBy("cls").orderBy(F.desc("ctfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(F.col("cls").alias(class_col), "term", "tf", "ctfidf", "rank")
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_phrase_len: int = 4,
    top_n: int = 3,
    min_word_len: int = 3,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — phrase-level
    keywords where the tfidf/keyword tier is word-level: candidate
    phrases are maximal stopword-free token runs, each word scores
    deg/freq over the DOCUMENT'S candidates, a phrase scores the sum of
    its word scores. The reference extracts keywords by frequency with
    a stopword list (trend_analyzer.py:216-230); RAKE is the published
    multi-word upgrade on the same ingredients.

    Plan: phrase segmentation is a SCAN-LOCAL fold over the token array
    (accumulator = open run + closed phrases — no posexplode, no
    token-position window; the first formulation windowed 200M token
    rows and cost 100 s/1M docs, the fold cut it to the shuffles below),
    then doc-keyed aggregations over PHRASE-level rows for word stats
    and phrase scores; the final top-n rank window reuses the doc
    partitioning. Every shuffle is keyed by doc; nothing is
    corpus-global.

    Output: (doc_id, phrase, n_words, score, rank) — top_n per doc,
    score rounded 4 dp, ties to the lexicographically smaller phrase.
    """
    from pyspark.sql import Window

    from vectordb_bioinsight_spark.functions.text import STOPWORDS

    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])

    def _is_stop(t):
        return F.array_contains(stop_arr, t) | (F.length(t) < min_word_len)

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    empty_cur = F.array().cast("array<string>")
    zero = F.struct(
        empty_cur.alias("cur"),
        F.array().cast("array<array<string>>").alias("out"),
    )

    def _close(acc):
        return F.when(
            F.size(acc["cur"]) > 0, F.concat(acc["out"], F.array(acc["cur"]))
        ).otherwise(acc["out"])

    def _step(acc, t):
        return F.when(
            _is_stop(t),
            F.struct(empty_cur.alias("cur"), _close(acc).alias("out")),
        ).otherwise(
            F.struct(
                F.concat(acc["cur"], F.array(t)).alias("cur"),
                acc["out"].alias("out"),
            )
        )

    phrase_arrays = F.filter(
        F.aggregate(toks, zero, _step, _close),
        lambda p: F.size(p) <= max_phrase_len,
    )
    ph = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(phrase_arrays).alias("phrase_id", "words"),
    )
    # word stats are DOC-LOCAL in RAKE, so they fold back as a per-doc
    # map instead of a word-level join (the join formulation moved ~100M
    # word-occurrence rows through one more exchange at 1M docs)
    pw = ph.select(
        "doc_id", F.size("words").alias("plen"), F.explode("words").alias("word")
    )
    wstats = pw.groupBy("doc_id", "word").agg(
        (F.sum("plen") / F.count("*")).alias("wscore")
    )
    wmap = wstats.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "wscore"))
        ).alias("wmap")
    )
    scored = (
        ph.join(wmap, "doc_id")
        .select(
            "doc_id",
            F.array_join("words", " ").alias("phrase"),
            F.size("words").cast("int").alias("n_words"),
            F.round(
                F.aggregate(
                    "words",
                    F.lit(0.0),
                    lambda acc, w: acc + F.element_at(F.col("wmap"), w),
                ),
                4,
            ).alias("score"),
        )
        .groupBy("doc_id", "phrase", "n_words")
        .agg(F.max("score").alias("score"))
    )
    rw = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= top_n)
    )
