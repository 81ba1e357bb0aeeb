"""Deduplication operators — BASELINE extension (LLM-data-pipeline ops).

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard dedup over a document corpus.
All hashing uses the engine's portable md5-derived 64-bit hash
(functions/hashing.py) so every stage is reproducible in DuckDB/Python —
near-dedup is usually the *least* testable part of a data pipeline; here it is
hash-for-hash oracle-checkable.

Scale design (100 TB corpus):
* shingle -> minhash is a pure projection (no shuffle);
* LSH banding turns all-pairs comparison into an equi-join on (band, bucket) —
  the only shuffle, keyed on band-buckets whose fan-out we cap;
* candidate verification re-checks true Jaccard only on pairs that collide,
  so the quadratic step never materializes.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64, salted_hash64
from vectordb_bioinsight_spark.functions.text import shingles, tokenize


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups via content hash.

    Output: (content_hash, n_docs, doc_ids) for groups with n_docs>1, where
    doc_ids is the sorted group membership as a comma-joined STRING (scalar
    columns survive any downstream canonicalizer/sink; an array column here
    is strictly harder to hash, sort, or CSV-export).
    One map-side-combinable groupBy on a 64-bit key — at 100 TB this is the
    cheapest possible full-corpus dedup (no text comparison after hashing).
    """
    return (
        df.select(portable_hash64(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.concat_ws(",", F.sort_array(F.collect_list(id_col))).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures in long form: (doc_id, h_idx, min_hash).

    h_i(doc) = min over shingles s of H(i||s), H = portable 60-bit hash.
    Long form keeps banding a plain groupBy (no wide row needed) and matches
    the oracle's SQL shape. Docs with fewer tokens than the shingle size have
    no signature (dropped — nothing to near-match on).

    Physical plan: ONE shingle scan; all ``num_hashes`` mins as parallel
    aggregates of one groupBy (map-side combinable); unpivot to long via
    ``stack`` — no per-hash union re-scan (which would cost num_hashes
    corpus passes).
    """
    wide = minhash_signatures_wide(df, id_col, text_col, num_hashes, shingle_n)
    stack_args = ", ".join(f"CAST({i} AS BIGINT), mh_{i}" for i in range(num_hashes))
    return wide.selectExpr(
        id_col, f"stack({num_hashes}, {stack_args}) AS (h_idx, min_hash)"
    )


def minhash_signatures_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Same signatures with one row per doc — single scan, no union fan-out.

    Computes all ``num_hashes`` mins in ONE aggregation over exploded
    shingles. Each shingle is md5-hashed ONCE (portable_hash64); the k
    permutations are integer affine maps h_i = (a_i*h + b_i) mod (2^61-1)
    (functions/hashing.minhash_perm_family). md5 is the kernel cost of
    MinHash, so one md5 + k multiply-mods per shingle instead of k md5
    calls is a ~k-fold kernel saving at the same LSH quality. This is the
    production path (the long-form variant exists for oracle symmetry).
    """
    from vectordb_bioinsight_spark.functions.hashing import minhash_perm_family_sql
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens, tokenize

    sh = (
        df.select(F.col(id_col), tokenize(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(shingles_from_tokens("_toks", shingle_n)).alias("shingle"))
        # NO distinct: min() is duplicate-insensitive, and a distinct here
        # would shuffle the full (id, shingle) fan-out before the aggregate —
        # the groupBy's map-side combine already collapses everything local
        .select(F.col(id_col), portable_hash64("shingle").alias("_h"))
    )
    # each permutation's affine map is rendered as SQL text and parsed once
    # (the Column-API composition cost ~2.7k py4j round trips of plan-build
    # per call at k=16; identical tree — r10 single-parse discipline, twins
    # pinned in tests/test_sql_fastpath_twins.py)
    aggs = [
        F.expr(f"min({sql})").alias(f"mh_{i}")
        for i, sql in enumerate(minhash_perm_family_sql("`_h`", num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _band_rows(
    signatures_wide: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(id, band, bucket) rows via ONE projection: all band buckets are
    built as an inline array of structs and exploded. A per-band
    union-of-selects would re-execute the signature aggregation subtree
    once PER BAND (the plan tree repeats it; Spark has no cross-branch
    CSE) — 4x the minhash cost for bands=4, measured as the dominant cost
    of the ingest near-dedup entry."""
    rows_per_band = num_hashes // bands
    structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                portable_hash64(F.concat_ws(",", *cols)).alias("bucket"),
            )
        )
    return signatures_wide.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    signatures_wide: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band-bucket become candidate pairs.

    Band hash = portable hash of the concatenated band slice. Output
    (doc1, doc2) with doc1 < doc2, distinct. The band join is the only
    shuffle; bucket sizes are bounded in practice because identical bands
    imply near-identical text.
    """
    banded = _band_rows(signatures_wide, id_col, num_hashes, bands)
    a = banded.select("band", "bucket", F.col(id_col).alias("doc1"))
    b2 = banded.select("band", "bucket", F.col(id_col).alias("doc2"))
    return (
        a.join(b2, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    With ``candidates`` (e.g. LSH output) only those pairs are scored —
    the scalable path. Without it, pairs are generated by joining on shared
    shingles (still avoids the full cross product; fine at corpus sizes where
    shared-shingle fan-out is bounded).

    Output: (doc1, doc2, inter_size, union_size, jaccard), jaccard rounded to
    6 dp for cross-engine hash stability.
    """
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    sh = (
        df.select(F.col(id_col), tokenize(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(shingles_from_tokens("_toks", shingle_n)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc1"), "shingle")
    b = sh.select(F.col(id_col).alias("doc2"), "shingle")
    if candidates is not None:
        # restrict BEFORE the fan-out: expand each candidate pair with doc1's
        # shingles, then equi-join (doc2, shingle) against doc2's set — the
        # shared-shingle blow-up (hot shingles x all docs containing them)
        # never materializes; cost is candidate-pairs x shingles-per-doc.
        inter = (
            candidates.select("doc1", "doc2")
            .join(a, "doc1")
            .join(b, ["doc2", "shingle"])
            .groupBy("doc1", "doc2")
            .agg(F.count("*").cast("long").alias("inter_size"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc1") < F.col("doc2"))
            .groupBy("doc1", "doc2")
            .agg(F.count("*").cast("long").alias("inter_size"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "doc1").withColumnRenamed("n_sh", "n1"), "doc1")
        .join(sizes.withColumnRenamed(id_col, "doc2").withColumnRenamed("n_sh", "n2"), "doc2")
        .withColumn("union_size", (F.col("n1") + F.col("n2") - F.col("inter_size")).cast("long"))
        .withColumn("jaccard", F.round(F.col("inter_size") / F.col("union_size"), 6))
        .select("doc1", "doc2", "inter_size", "union_size", "jaccard")
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint per document (token-level, unweighted).

    bit_j(doc) = 1 iff sum over distinct tokens t of sign((H(t)>>j)&1) > 0.

    Physical plan: tokenize+hash scan, then ONE groupBy(doc) where each bit's
    vote total is a conditional aggregate (1 << j is a Python literal —
    exact integer arithmetic, no column-valued shifts), then a pure
    projection reassembles the integer. One shuffle total; no per-bit row
    explosion (which would multiply the shuffle by ``bits``).
    Output (doc_id, simhash). Near-dup = small Hamming distance; pairing via
    band-join on bit slices mirrors lsh_candidate_pairs.
    """
    toks = df.select(F.col(id_col), F.explode(F.array_distinct(tokenize(text_col))).alias("tok"))
    hashed = toks.withColumn("hv", portable_hash64("tok"))
    # per-bit vote aggregates and the reassembly sum are rendered as SQL
    # text and parsed once each (identical CASE/sum trees; the Column-API
    # loops cost ~2.5k py4j round trips of plan-build at bits=32 — r10
    # single-parse discipline)
    votes = hashed.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (hv & {1 << j}) != 0 THEN 1 ELSE -1 END)"
            ).alias(f"_v_{j}")
            for j in range(bits)
        ]
    )
    total = " + ".join(
        f"(CASE WHEN _v_{j} > 0 THEN CAST({1 << j} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return votes.select(F.col(id_col), F.expr(total).alias("simhash"))


def near_dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.7,
    assume_unique: bool = False,
) -> DataFrame:
    """Production dedup ordering: EXACT dedup first, near-dedup on the
    representatives.

    ``assume_unique=True`` skips the internal exact-dedup groupBy when the
    caller's input is ALREADY one row per distinct content (e.g. the
    training pipeline persists its exact-dedup representatives first) —
    otherwise that redundant shuffle re-runs once per downstream consumer.

    Why the order matters (measured): LSH candidate generation is quadratic
    per bucket — a corpus with k exact copies of a doc puts all k in the
    same bucket and yields C(k,2) candidate pairs per band. Collapsing exact
    duplicates first (one cheap hash groupBy) bounds every bucket to
    near-misses only. On a 200x-duplicated 1M-doc probe this is the
    difference between ~10^8 candidate pairs and ~10^5.

    Output: (id1, id2, jaccard) near-dup pairs among exact-dedup
    representatives (min doc id per content group), plus implicit exact
    groups via ``exact_duplicates``.
    """
    if assume_unique:
        reps = df.select(id_col, text_col)
    else:
        reps = (
            df.select(portable_hash64(text_col).alias("_ch"), F.col(id_col), F.col(text_col))
            .groupBy("_ch")
            .agg(F.min(id_col).alias(id_col), F.first(text_col).alias(text_col))
            .drop("_ch")
        )
    sigs = minhash_signatures_wide(reps, id_col, text_col, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes=num_hashes, bands=bands)
    return ngram_jaccard_pairs(reps, id_col, text_col, candidates=cands, min_jaccard=min_jaccard)


def dedup_clusters(pairs: DataFrame, id1: str = "doc1", id2: str = "doc2") -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    over the pair graph, cluster id = min doc id reachable (the SlimPajama /
    production fuzzy-dedup convention — pairs say "these two are similar",
    but survivors must be picked per transitive cluster, or chains A~B~C
    either drop too much with pairwise-greatest removal or keep both ends).

    Output: (doc_id, cluster_rep) for every doc appearing in a pair; the
    survivor of each cluster is the row with doc_id == cluster_rep.

    Scale: hash-min label propagation (operators/network.connected_
    components) — O(diameter) shuffles; near-dup clusters are shallow
    (duplicates of one source document), so the fixed point lands in a few
    iterations. Input pairs are the LSH-bucketed candidate output, never
    all-pairs.
    """
    from vectordb_bioinsight_spark.operators.network import connected_components

    edges = pairs.select(F.col(id1).alias("entity1"), F.col(id2).alias("entity2"))
    cc = connected_components(edges)
    return cc.select(F.col("entity").alias("doc_id"), F.col("component").alias("cluster_rep"))


def near_dedup_survivors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """End-to-end fuzzy dedup with cluster-correct survivor selection:
    exact-dedup representatives → LSH-restricted Jaccard pairs →
    connected components → keep exactly one doc (the min id) per cluster.
    Returns the surviving rows of ``df`` (all columns).
    """
    from pyspark.sql import Window

    pairs = near_dedup_pipeline(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands, min_jaccard=min_jaccard
    )
    clusters = dedup_clusters(pairs, "doc1", "doc2")
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias(id_col)
    )
    # exact-duplicate non-representatives also lose (near_dedup_pipeline only
    # ever emits the min-id rep of each exact group)
    exact_losers = (
        df.select(portable_hash64(text_col).alias("_ch"), F.col(id_col))
        .withColumn("_rep", F.min(id_col).over(Window.partitionBy("_ch")))
        .filter(F.col(id_col) != F.col("_rep"))
        .select(id_col)
    )
    return df.join(losers.unionByName(exact_losers).distinct(), id_col, "left_anti")


def near_dedup_best_survivors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """:func:`near_dedup_survivors` with a BEST-SCORE survivor per cluster
    instead of min-id — the RefinedWeb/quality-aware variant (keep the
    longest / highest-quality copy, not the one that happened to get the
    smallest id). Ties break to the smaller id, so the rule stays total
    and partition-independent.

    Cluster correctness: the pair graph is built on exact-group min-id
    representatives exactly as before (identical texts have identical
    shingles, so WHICH rep carries the group into the graph cannot change
    the near-dup edges); every doc then maps through its exact rep to its
    transitive cluster — docs outside any near-dup cluster form
    singleton clusters keyed by their exact group — and the max-score doc
    of each cluster survives.
    """
    from pyspark.sql import Window

    keyed = df.select(
        F.col(id_col), portable_hash64(text_col).alias("_ch")
    ).withColumn("_erep", F.min(id_col).over(Window.partitionBy("_ch")))
    pairs = near_dedup_pipeline(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands, min_jaccard=min_jaccard
    )
    clusters = dedup_clusters(pairs, "doc1", "doc2").select(
        F.col("doc_id").alias("_erep"), F.col("cluster_rep").alias("_crep")
    )
    member = keyed.join(clusters, "_erep", "left").withColumn(
        "_ckey", F.coalesce(F.col("_crep"), F.col("_erep"))
    )
    w = Window.partitionBy("_ckey").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    winners = (
        member.join(df.select(F.col(id_col), F.col(score_col).alias("_score")), id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def repeated_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
    tokens_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact repeated-substring spans — the ExactSubstr dedup of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) at word-shingle granularity: every word n-gram occurring
    in >= ``min_docs`` distinct docs is a duplicated position; overlapping /
    adjacent duplicated positions within a doc merge into maximal spans (the
    unit a cleaning pipeline cuts out, rather than dropping whole docs).

    Output: (id, span_id, span_start, span_end, n_dup_ngrams) — 0-based
    inclusive TOKEN positions; span_id numbers a doc's spans in order.

    Scale shape: the suffix-array of the original is replaced by pure
    relational algebra — shingle+hash is a scan-local projection (the same
    one MinHash rides), duplicated-shingle detection is a map-side-combinable
    count-distinct groupBy on a 64-bit key, the hit join is an equi-join on
    that key (AQE broadcasts it when the dup set is small), and span merge
    is gaps-and-islands window algebra partitioned by doc. Nothing is
    quadratic; nothing collects.

    ``tokens_col``: a pre-tokenized array column to read instead of
    tokenizing ``text_col`` — lets a caller that also needs the token
    stream (the span-cut chain) tokenize the corpus ONCE and share it.
    """
    from pyspark.sql import Window

    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    if tokens_col is not None:
        toks = df.select(F.col(id_col), F.col(tokens_col).alias("_toks"))
    else:
        toks = df.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    # The hashed-shingle positions feed BOTH the duplicated-shingle groupBy
    # and the hit join, and AQE does not reuse the exchange across the two
    # consumers — by default, materialize the projection once
    # (spill-capable) instead of running the shingle+hash scan twice: the
    # relational analog of "build the suffix index once"; at 100 TB it
    # halves the corpus scans (measured 2.3 s → 1.0 s standalone at sf0.1).
    # Callers whose INPUT is already a persisted token projection (the
    # fused span-cut chain) pass ``materialize=False``: there the upstream
    # scan is already paid once, and storing the much larger position-level
    # table costs more than recomputing shingle+hash from cached arrays.
    sh = toks.select(
        F.col(id_col),
        F.posexplode(shingles_from_tokens("_toks", n)).alias("pos", "_sh"),
    ).select(
        id_col, F.col("pos").cast("long").alias("pos"), portable_hash64("_sh").alias("_h")
    )
    if materialize:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if min_docs == 2:
        # "appears in >= 2 DISTINCT docs" == min(id) != max(id): min/max are
        # map-side combinable (one shuffle of partial aggs), while
        # countDistinct plans as expand + a second aggregate pass over the
        # position-level table — the dominant shuffle of this operator
        dup = (
            sh.groupBy("_h")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("_h")
        )
    else:
        dup = (
            sh.groupBy("_h")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("_h")
        )
    hits = sh.join(dup, "_h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    is_new = F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        hits.withColumn("_new", is_new)
        .withColumn("span_id", F.sum("_new").over(wsum).cast("long"))
        .groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_dup_ngrams"),
        )
    )


def duplicated_token_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc fraction of tokens covered by cross-doc repeated spans — the
    corpus-duplication measure of Lee et al. §4 (what fraction of the corpus
    is verbatim-duplicated text). Docs with no duplicated span report 0.0.

    Output: (id, n_tokens, dup_tokens, dup_frac[4dp]).
    """
    spans = repeated_ngram_spans(df, id_col, text_col, n=n, min_docs=min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens")
    )
    toks = df.select(
        F.col(id_col), F.size(tokenize(text_col)).cast("long").alias("n_tokens")
    )
    return (
        toks.join(per_doc, id_col, "left")
        .fillna({"dup_tokens": 0})
        .withColumn(
            "dup_frac",
            F.round(
                F.when(F.col("n_tokens") > 0, F.col("dup_tokens") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def near_dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """Incremental NEAR-dedup: drop arriving-batch docs whose text is a
    near-duplicate (n-gram Jaccard >= ``min_jaccard``) of ANY existing
    corpus doc — the fuzzy companion of
    :func:`~vectordb_bioinsight_spark.operators.bloom.dedup_against_corpus`
    (which only catches byte-exact content). Together they are the
    ingest-time dedup pair of a growing pretraining corpus: exact check via
    the broadcast Bloom bitmap, fuzzy check via this asymmetric LSH join.

    Plan shape (the corpus side is the big one, so everything is driven to
    keep it cheap): MinHash signatures on BOTH sides (one shingle scan
    each; at scale the corpus signatures are a PRECOMPUTED table appended
    per batch, exactly like the BM25 incremental index); band-bucket
    equi-join restricted to (batch, corpus) pairs only — never
    batch×batch or corpus×corpus; candidate-restricted Jaccard verify
    (cost = candidate pairs × shingles/doc); anti join back onto the
    batch. The only full-corpus cost is the signature scan, which
    amortizes to zero when signatures are maintained incrementally.

    Output: the surviving batch rows (all columns).
    """
    from vectordb_bioinsight_spark.functions.text import shingles_from_tokens

    b_sig = minhash_signatures_wide(batch, id_col, text_col, num_hashes, shingle_n)
    c_sig = minhash_signatures_wide(corpus, id_col, text_col, num_hashes, shingle_n)
    cands = (
        _band_rows(b_sig, id_col, num_hashes, bands)
        .withColumnRenamed(id_col, "doc1")
        .join(
            _band_rows(c_sig, id_col, num_hashes, bands).withColumnRenamed(id_col, "doc2"),
            ["band", "bucket"],
        )
        .select("doc1", "doc2")
        .distinct()
    )
    b_sh = (
        batch.select(F.col(id_col).alias("doc1"), tokenize(text_col).alias("_toks"))
        .select("doc1", F.explode(shingles_from_tokens("_toks", shingle_n)).alias("shingle"))
        .distinct()
    )
    c_sh = (
        corpus.select(F.col(id_col).alias("doc2"), tokenize(text_col).alias("_toks"))
        .select("doc2", F.explode(shingles_from_tokens("_toks", shingle_n)).alias("shingle"))
        .distinct()
    )
    b_sizes = b_sh.groupBy("doc1").agg(F.count("*").cast("long").alias("_n1"))
    c_sizes = c_sh.groupBy("doc2").agg(F.count("*").cast("long").alias("_n2"))
    inter = (
        cands.join(b_sh, "doc1")
        .join(c_sh, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("long").alias("_i"))
    )
    dup_pairs = (
        inter.join(b_sizes, "doc1")
        .join(c_sizes, "doc2")
        .withColumn(
            "_j",
            F.round(F.col("_i") / (F.col("_n1") + F.col("_n2") - F.col("_i")), 6),
        )
        .filter(F.col("_j") >= min_jaccard)
    )
    losers = dup_pairs.select(F.col("doc1").alias(id_col)).distinct()
    return batch.join(losers, id_col, "left_anti")
