"""Text-analysis & dedup query catalog — BASELINE's LLM-data-pipeline
extensions on the ``documents`` table, every one oracle-checkable thanks to
the portable md5-derived hash (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.text import STOPWORDS, tokenize_duckdb
from vectordb_bioinsight_spark.operators.dedup import (
    exact_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
from vectordb_bioinsight_spark.operators.text_analysis import (
    fingerprint,
    language_id,
    text_stats,
    tfidf_top_terms,
)
from vectordb_bioinsight_spark.operators.trends import keyword_frequencies
from vectordb_bioinsight_spark.sources.readers import load_table

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
_TOK3 = tokenize_duckdb("text")
_TOK2 = tokenize_duckdb("text", min_len=2)
_SHINGLE3 = (
    "CASE WHEN length(tk) < 3 THEN []::VARCHAR[] "
    "ELSE list_transform(range(1, length(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END"
)


def q_keyword_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: top-20 non-stopword token frequencies (trend_analyzer.py:216-230)."""
    docs = load_table(spark, sf_dir, "documents")
    return keyword_frequencies(docs, "text", top_n=20)


SQL_KEYWORD_TOPN = f"""
WITH words AS (
  SELECT unnest({_TOK3}) AS word FROM documents
)
SELECT word, count(*) AS n FROM words
WHERE NOT list_contains({_SW_SQL}, word)
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/quality statistics (junk-filter semantics of
    text_splitter.py:17-52 re-expressed as a deterministic score)."""
    docs = load_table(spark, sf_dir, "documents")
    return text_stats(docs, "doc_id", "text")


SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id, text, {_TOK3} AS tk,
         length(list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0)) AS n_ws_tokens,
         length(regexp_replace(text, '[a-z0-9A-Z ]', '', 'g'))::DOUBLE / length(text) AS pr
  FROM documents
), feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         n_ws_tokens AS n_tokens,
         length(list_distinct(tk)) AS n_distinct_tokens,
         CASE WHEN length(tk) > 0
              THEN list_sum(list_transform(tk, t -> length(t)))::DOUBLE / length(tk)
              ELSE 0.0 END AS avg_token_len,
         pr,
         CASE WHEN length(tk) > 0
              THEN length(list_filter(tk, t -> list_contains({_SW_SQL}, t)))::DOUBLE / length(tk)
              ELSE 0.0 END AS sr,
         length(tk) AS n_tok
  FROM base
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
       round(avg_token_len, 6) AS avg_token_len,
       round(pr, 6) AS punct_ratio,
       round(sr, 6) AS stopword_ratio,
       round(least(n_tok / 20.0, 1.0) * 0.4
             + (1.0 - least(pr * 5.0, 1.0)) * 0.3
             + least(sr * 4.0, 1.0) * 0.3, 6) AS quality_score
FROM feat
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language heuristic per document."""
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs, "doc_id", "text")


SQL_LANGUAGE_ID = f"""
WITH toks AS (
  SELECT doc_id, {_TOK2} AS tk FROM documents
), hits AS (
  SELECT doc_id, 'de' AS lang,
         length(list_filter(tk, t -> list_contains(['der','die','und','das','ein'], t))) AS h FROM toks
  UNION ALL
  SELECT doc_id, 'en', length(list_filter(tk, t -> list_contains(['the','and','for','with','that'], t))) FROM toks
  UNION ALL
  SELECT doc_id, 'es', length(list_filter(tk, t -> list_contains(['los','las','que','una','por'], t))) FROM toks
  UNION ALL
  SELECT doc_id, 'fr', length(list_filter(tk, t -> list_contains(['les','des','une','est','pour'], t))) FROM toks
), ranked AS (
  SELECT doc_id, lang, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
  FROM hits
)
SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'unknown' END AS lang_pred, CAST(h AS BIGINT) AS lang_hits
FROM ranked WHERE rn = 1
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable content fingerprint of the normalized token stream."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs, "doc_id", "text")


SQL_FINGERPRINT = f"""
SELECT doc_id,
       (('0x' || substr(md5(array_to_string({_TOK3}, ' ')), 1, 15))::BIGINT) AS fp
FROM documents
"""


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over a normalized key — here the first-10-token
    prefix (boilerplate-prefix duplicates), so the operator is exercised on
    a corpus whose full texts are unique."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: F.length(t) >= 3)
    keyed = docs.withColumn("_prefix", F.concat_ws(" ", F.slice(toks, 1, 10)))
    return exact_duplicates(keyed, "doc_id", "_prefix")


SQL_EXACT_DUP_GROUPS = f"""
WITH keyed AS (
  SELECT doc_id,
         (('0x' || substr(md5(array_to_string(({_TOK3})[1:10], ' ')), 1, 15))::BIGINT) AS content_hash
  FROM documents
)
SELECT content_hash, count(*) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
FROM keyed GROUP BY 1 HAVING count(*) > 1
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 universal-family permutations of one portable
    base hash, over 3-shingles), long form. Hash family:
    h_i = (a_i*h + b_i) mod 2^61-1 (functions/hashing.minhash_perm_family)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_n=3)


def _minhash_perm_values(n: int) -> str:
    from vectordb_bioinsight_spark.functions.hashing import MINHASH_PERMS

    return ", ".join(
        f"({i}, {a}::HUGEINT, {b}::HUGEINT)" for i, (a, b) in enumerate(MINHASH_PERMS[:n])
    )


SQL_MINHASH_SIGNATURES = f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM toks, unnest({_SHINGLE3}) AS u(s)
), based AS (
  SELECT doc_id, (('0x' || substr(md5(s), 1, 15))::BIGINT) AS h FROM sh
), salted AS (
  SELECT doc_id, perm.h_idx::BIGINT AS h_idx,
         ((perm.a * h + perm.b) % 2305843009213693951)::BIGINT AS hv
  FROM based, (VALUES {_minhash_perm_values(8)}) AS perm(h_idx, a, b)
)
SELECT doc_id, h_idx, min(hv) AS min_hash FROM salted GROUP BY 1, 2
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (distinct-token votes)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text", bits=16)


SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK3})) AS tok FROM documents
), hashed AS (
  SELECT doc_id, (('0x' || substr(md5(tok), 1, 15))::BIGINT) AS hv FROM toks
), votes AS (
  SELECT doc_id, r.range AS bit,
         CASE WHEN (hv & (1::BIGINT << r.range)) != 0 THEN 1 ELSE -1 END AS vote,
         (1::BIGINT << r.range) AS weight
  FROM hashed, range(16) r
), bitvals AS (
  SELECT doc_id, bit, CASE WHEN sum(vote) > 0 THEN max(weight) ELSE 0 END AS bitval
  FROM votes GROUP BY 1, 2
)
SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash FROM bitvals GROUP BY 1
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (jaccard >= 0.1), generated via the
    shared-shingle join (no cross product)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, min_jaccard=0.1)


SQL_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM toks, unnest({_SHINGLE3}) AS u(s)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_size
  FROM sh a JOIN sh b USING (s)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, CAST(inter_size AS BIGINT) AS inter_size,
       CAST(s1.n_sh + s2.n_sh - inter_size AS BIGINT) AS union_size,
       round(inter_size::DOUBLE / (s1.n_sh + s2.n_sh - inter_size), 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE round(inter_size::DOUBLE / (s1.n_sh + s2.n_sh - inter_size), 6) >= 0.1
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: the ngram_jaccard near-dup pairs
    resolved into transitive clusters by hash-min connected components
    (operators/dedup.dedup_clusters); cluster_rep = min doc id reachable.
    The survivor of each cluster is the row with doc_id == cluster_rep."""
    from vectordb_bioinsight_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, min_jaccard=0.1)
    return dedup_clusters(pairs, "doc1", "doc2")


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM toks, unnest({_SHINGLE3}) AS u(s)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_size
  FROM sh a JOIN sh b USING (s)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pr AS (
  SELECT doc1, doc2 FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE round(inter_size::DOUBLE / (s1.n_sh + s2.n_sh - inter_size), 6) >= 0.1
), e AS (
  SELECT doc1 AS src, doc2 AS dst FROM pr
  UNION SELECT doc2, doc1 FROM pr
), reach(n, r) AS (
  SELECT DISTINCT src, src FROM e
  UNION
  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.n
)
SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY n
"""


def q_word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: word co-occurrence edges — pairs of length>=4 tokens sharing a
    document, weight = number of shared docs (graph.py:352-368 semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: F.length(t) >= 4
        ))).alias("word")
    )
    return cooccurrence_edges(pairs, "word", "doc_id", min_weight=50)


SQL_WORD_COOCCURRENCE = """
WITH dw AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                          t -> length(t) >= 4)) AS word
    FROM documents
  )
)
SELECT a.word AS item1, b.word AS item2, count(*) AS weight
FROM dw a JOIN dw b USING (doc_id)
WHERE a.word < b.word
GROUP BY 1, 2 HAVING count(*) >= 50
"""


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: per-source corpus stats (chunk counts by section semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


SQL_SOURCE_STATS = """
SELECT source, count(*) AS n_docs, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY source
"""


def q_doc_chunks(spark, sf_dir):
    """S11 ingest chunking: fixed-size overlapping character chunks
    (CHUNK_SIZE=1000 / OVERLAP=200, config.py:99-100) as a pure JVM
    projection; md5 per chunk makes the content hash-checkable."""
    from vectordb_bioinsight_spark.operators.chunking import chunk_text
    from vectordb_bioinsight_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "doc_id", "text", chunk_size=200, overlap=40)
    return chunks.select("doc_id", "chunk_idx", "chunk_len", F.md5("chunk").alias("chunk_md5"))


SQL_DOC_CHUNKS = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(1, ceil((length(text) - 40) / 160.0)::INT) AS n_chunks
  FROM documents
), c AS (
  SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx, text
  FROM d
)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       length(substr(text, chunk_idx * 160 + 1, 200))::BIGINT AS chunk_len,
       md5(substr(text, chunk_idx * 160 + 1, 200)) AS chunk_md5
FROM c WHERE length(substr(text, chunk_idx * 160 + 1, 200)) > 0
"""


def q_embed_documents(spark, sf_dir):
    """V1 batch embedding, oracle-backed since r03: iterator pandas UDF,
    per-worker model singleton, Arrow batches — and the deterministic fake
    model (seeded md5 feature-hash projection, operators/inference.py) IS
    SQL-replayable: per-token md5 → unsigned-64 bucket/sign, integer ±1
    accumulation (exact in doubles), exactly-rounded sqrt/divide for the
    L2 normalize. Output is the EXPLODED embedding (doc_id, pos, val) so
    the driver hash covers every coordinate, not just a norm projection."""
    from vectordb_bioinsight_spark.operators.inference import embed_column
    from vectordb_bioinsight_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = embed_column(docs, "text", dim=16)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("pos", F.col("pos").cast("int"))


SQL_EMBED_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5('42:' || tok), 1, 16))::UBIGINT AS h
  FROM toks
), contrib AS (
  SELECT doc_id, (h % 16)::INT AS pos,
         CASE WHEN (h >> 8) % 2 = 0 THEN 1.0 ELSE -1.0 END AS c
  FROM hashed
), vec AS (
  SELECT doc_id, pos, sum(c) AS v FROM contrib GROUP BY 1, 2
), dense AS (
  SELECT d.doc_id, p.pos, coalesce(vec.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, 16))::INT AS pos) p
  LEFT JOIN vec ON vec.doc_id = d.doc_id AND vec.pos = p.pos
), norms AS (
  SELECT doc_id, CASE WHEN sum(v * v) = 0 THEN 1.0 ELSE sqrt(sum(v * v)) END AS nrm
  FROM dense GROUP BY 1
)
SELECT dense.doc_id, pos, round(v / nrm, 6) AS val
FROM dense JOIN norms USING (doc_id)
"""


def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-pipeline composition end-to-end, oracle-backed
    since r03: quality gate → exact dedup → MinHash-LSH candidates →
    candidate-restricted Jaccard → transitive-component survivors →
    leak-free hash split, replayed as ONE generated SQL twin
    (every stage's twin already existed — _sql_training_corpus composes
    them, including the exact banding rule, so LSH false negatives match
    too). Deterministic: same input ⇒ same rows."""
    from vectordb_bioinsight_spark.pipelines.training_data import prepare_training_data

    docs = load_table(spark, sf_dir, "documents")
    out = prepare_training_data(docs, min_quality=0.3, near_dup_jaccard=0.6)
    return out.select("doc_id", "split", F.round("quality_score", 6).alias("quality_score"))


def _sql_training_corpus(
    min_quality: float = 0.3,
    min_jaccard: float = 0.6,
    num_hashes: int = 16,
    bands: int = 4,
    split_salt: int = 1,
) -> str:
    """Composed twin of prepare_training_data: stitches the text_stats,
    exact-dedup, minhash/banding, restricted-Jaccard, component, and
    hash-split twins into one WITH RECURSIVE chain. Every constant
    (quality weights, 16 perms / 4 bands, 0.9/0.05/0.05 split at salt 1)
    mirrors the pipeline defaults used by q_training_corpus."""
    from vectordb_bioinsight_spark.functions.hashing import (
        PORTABLE_HASH64_DUCKDB,
        minhash_perm_duckdb,
    )
    from vectordb_bioinsight_spark.operators.chunking import JUNK_REGEXES

    junk = " OR ".join(f"regexp_matches(text, '{rx}')" for rx in JUNK_REGEXES)
    sh_hash = PORTABLE_HASH64_DUCKDB.format(expr="s")
    sig_aggs = ", ".join(
        f"min({minhash_perm_duckdb('h', i)}) AS mh_{i}" for i in range(num_hashes)
    )
    rows_per_band = num_hashes // bands
    band_arms = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {h} AS bucket FROM sigs".format(
            b=b,
            h=PORTABLE_HASH64_DUCKDB.format(
                expr="concat_ws(',', "
                + ", ".join(
                    f"CAST(mh_{i} AS VARCHAR)"
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                )
                + ")"
            ),
        )
        for b in range(bands)
    )
    text_hash = PORTABLE_HASH64_DUCKDB.format(expr="text")
    split_hash = PORTABLE_HASH64_DUCKDB.format(
        expr=f"'{split_salt}|' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
WITH RECURSIVE quality AS (
  SELECT doc_id,
         round(least(length({_TOK3}) / 20.0, 1.0) * 0.4
               + (1.0 - least((length(regexp_replace(text, '[a-z0-9A-Z ]', '', 'g'))::DOUBLE
                               / length(text)) * 5.0, 1.0)) * 0.3
               + least((CASE WHEN length({_TOK3}) > 0
                        THEN length(list_filter({_TOK3}, t -> list_contains({_SW_SQL}, t)))::DOUBLE
                             / length({_TOK3})
                        ELSE 0.0 END) * 4.0, 1.0) * 0.3, 6) AS quality_score
  FROM documents
), gated AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN quality q USING (doc_id)
  WHERE d.lang IN ('en') AND q.quality_score >= {min_quality}
    AND NOT ({junk})
), reps AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY {text_hash}) AS _rep
    FROM gated
  ) WHERE doc_id = _rep
), toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM reps
), sh_all AS (
  SELECT doc_id, unnest({_SHINGLE3}) AS s FROM toks
), shd AS (
  SELECT DISTINCT doc_id, s FROM sh_all
), shh AS (
  SELECT doc_id, {sh_hash} AS h FROM sh_all
), sigs AS (
  SELECT doc_id, {sig_aggs} FROM shh GROUP BY 1
), banded AS (
  {band_arms}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1
), inter AS (
  SELECT c.doc1, c.doc2, count(*) AS i
  FROM cand c
  JOIN shd a ON a.doc_id = c.doc1
  JOIN shd b ON b.doc_id = c.doc2 AND b.s = a.s
  GROUP BY 1, 2
), pairs AS (
  SELECT doc1, doc2 FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE round(i::DOUBLE / (s1.n_sh + s2.n_sh - i), 6) >= {min_jaccard}
), e AS (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION SELECT doc2, doc1 FROM pairs
), reach(n, r) AS (
  SELECT DISTINCT src, src FROM e
  UNION
  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.n
), clusters AS (
  SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY 1
), losers AS (
  SELECT doc_id FROM clusters WHERE doc_id <> cluster_rep
), deduped AS (
  SELECT r.doc_id FROM reps r
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = r.doc_id)
)
SELECT d.doc_id,
       CASE WHEN (({split_hash}) % 10000 + 10000) % 10000 < 9000 THEN 'train'
            WHEN (({split_hash}) % 10000 + 10000) % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split,
       q.quality_score
FROM deduped d JOIN quality q USING (doc_id)
"""


SQL_TRAINING_CORPUS = _sql_training_corpus()


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS): min hash per sliding
    window of 4 consecutive 3-gram hashes, distinct per doc."""
    from vectordb_bioinsight_spark.operators.text_analysis import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "doc_id", "text", k=3, window=4)


SQL_WINNOW_FINGERPRINTS = f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), grams AS (
  SELECT doc_id, {_SHINGLE3} AS g FROM toks
), hashed AS (
  SELECT doc_id,
         list_transform(g, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
  FROM grams
), mins AS (
  SELECT doc_id,
         CASE WHEN length(h) >= 4
              THEN list_transform(range(1, length(h) - 2), i -> list_min(h[i:i+3]))
              WHEN length(h) > 0 THEN [list_min(h)]
              ELSE []::BIGINT[] END AS fps
  FROM hashed
)
SELECT DISTINCT doc_id, unnest(fps) AS fp FROM mins
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V11: TF-IDF keyword extraction — top-5 terms per doc by
    tf * (ln((1+N)/(1+df)) + 1), the sklearn smooth-idf default the
    reference declares (trend_analyzer.py:21). Ranked on the rounded
    weight with term tiebreak for cross-engine hash stability."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=5)


SQL_TFIDF_TOPK = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK3}) AS term FROM documents
), filtered AS (
  SELECT doc_id, term FROM toks WHERE NOT list_contains({_SW_SQL}, term)
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM filtered GROUP BY 1, 2
), n AS (
  SELECT count(*)::DOUBLE AS n_docs FROM documents
), dfreq AS (
  SELECT term, count(*)::DOUBLE AS dfq FROM tf GROUP BY 1
), scored AS (
  SELECT doc_id, tf.term, tf,
         round(tf * (ln((1.0 + n_docs) / (1.0 + dfq)) + 1.0), 6) AS tfidf
  FROM tf, n JOIN dfreq ON tf.term = dfreq.term
), ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rk::INT AS rk FROM ranked WHERE rk <= 5
"""


def q_keyword_and_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: AND-logic keyword gate (precision_search.py:540-545) — docs
    containing every one of three query keywords as substrings.

    Keywords are drawn from the synthetic corpus vocabulary ("batch",
    "join", "scan" co-occur in ~270/500 docs at sf0.01) so the driver
    check exercises the gate on a non-empty result — the r02 keyword set
    matched zero docs, a vacuous pass.
    """
    from vectordb_bioinsight_spark.operators.text_analysis import keyword_and_match

    docs = load_table(spark, sf_dir, "documents")
    return keyword_and_match(docs, "doc_id", "text", ["batch", "join", "scan"])


SQL_KEYWORD_AND_MATCH = """
WITH m AS (
  SELECT doc_id,
         list_filter(['batch', 'join', 'scan'],
                     kw -> contains(lower(text), kw)) AS mk
  FROM documents
)
SELECT doc_id, len(mk) AS n_matched, array_to_string(mk, ',') AS matched_keywords
FROM m WHERE len(mk) = 3
"""


_SHINGLE2 = (
    "CASE WHEN length(tk) < 2 THEN []::VARCHAR[] "
    "ELSE list_transform(range(1, length(tk)), i -> tk[i] || ' ' || tk[i+1]) END"
)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition signals (dup n-gram ratios, top
    token ratio) + the BPE-ish pretokenizer budget."""
    from vectordb_bioinsight_spark.operators.text_analysis import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


SQL_REPETITION_STATS = f"""
WITH base AS (
  SELECT doc_id, text, {_TOK3} AS tk FROM documents
), grams AS (
  SELECT doc_id,
         length(tk) AS n_tok,
         {_SHINGLE2} AS g2,
         {_SHINGLE3} AS g3,
         len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS bpe
  FROM base
), cnt AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(tk) AS term FROM base) GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS mx FROM cnt GROUP BY 1
)
SELECT g.doc_id,
       g.n_tok::BIGINT AS n_tokens,
       g.bpe::BIGINT AS bpe_tokens,
       round(CASE WHEN len(g2) > 0 THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2) ELSE 0.0 END, 6) AS dup_2gram_ratio,
       round(CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3) ELSE 0.0 END, 6) AS dup_3gram_ratio,
       round(CASE WHEN g.n_tok > 0 THEN coalesce(t.mx, 0)::DOUBLE / g.n_tok ELSE 0.0 END, 6) AS top_token_ratio
FROM grams g LEFT JOIN top t ON g.doc_id = t.doc_id
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shape LM quality scoring: mean token log-prob under the
    corpus-fitted unigram model, plus perplexity."""
    from vectordb_bioinsight_spark.operators.text_analysis import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, "doc_id", "text")


SQL_UNIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK3}) AS term FROM documents
), postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT term, sum(tf)::DOUBLE AS cnt FROM postings GROUP BY 1
), tot AS (
  SELECT sum(cnt) AS t FROM vocab
), per_doc AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         round(sum(tf * ln(cnt / t)) / sum(tf), 6) AS avg_logprob
  FROM postings JOIN vocab USING (term), tot GROUP BY 1
)
SELECT doc_id, n_tokens, avg_logprob, round(exp(-avg_logprob), 6) AS perplexity
FROM per_doc
"""


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-decontamination: corpus docs sharing winnowed token runs with
    a planted benchmark set, >= 2 shared fingerprints.

    The benchmark is built from the corpus itself — every doc with
    doc_id % 97 == 0 re-ID'd to doc_id + 1_000_000 (a "leaked eval item"
    verbatim in the corpus) — so fingerprint overlap is guaranteed at any
    SF and the driver check is never vacuous: each planted item must at
    minimum flag its own source doc. The r02 variant (benchmark = a raw
    doc subset, self-pairs dropped) found 0 cross-doc overlaps at sf0.01
    and hash-matched the oracle on emptiness, proving nothing.
    """
    from vectordb_bioinsight_spark.operators.text_analysis import contamination_check

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    return contamination_check(docs, bench, "doc_id", "text", min_shared=2)


_WINNOW_FPS = f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), grams AS (
  SELECT doc_id, {_SHINGLE3} AS g FROM toks
), hashed AS (
  SELECT doc_id,
         list_transform(g, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
  FROM grams
), mins AS (
  SELECT doc_id,
         CASE WHEN length(h) >= 4
              THEN list_transform(range(1, length(h) - 2), i -> list_min(h[i:i+3]))
              WHEN length(h) > 0 THEN [list_min(h)]
              ELSE []::BIGINT[] END AS fps
  FROM hashed
)
SELECT DISTINCT doc_id, unnest(fps) AS fp FROM mins
"""


SQL_CONTAMINATION_CHECK = f"""
WITH fps AS MATERIALIZED ({_WINNOW_FPS})
SELECT c.doc_id, b.doc_id + 1000000 AS bench_id, count(*)::BIGINT AS n_shared
FROM fps c JOIN fps b ON c.fp = b.fp AND b.doc_id % 97 = 0
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_bloom_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: odd-doc_id docs form the arriving batch,
    even-doc_id docs the existing corpus; keep batch docs whose text is NOT
    already in the corpus. Executed via the broadcast-Bloom prefilter +
    exact confirm (operators/bloom.dedup_against_corpus) — semantically an
    anti-join on the content hash, physically corpus-shuffle-free."""
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64
    from vectordb_bioinsight_spark.operators.bloom import dedup_against_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    surv = dedup_against_corpus(batch, corpus, "doc_id", "text", num_bits=1 << 22)
    return surv.select(
        "doc_id", portable_hash64("text").alias("content_hash")
    )


SQL_BLOOM_DEDUP_BATCH = """
SELECT d.doc_id, ('0x' || substr(md5(d.text), 1, 15))::BIGINT AS content_hash
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents c WHERE c.doc_id % 2 = 0 AND c.text = d.text
  )
"""


SPAN_N = 8


def _shingle_n_duckdb(toks: str, n: int) -> str:
    from vectordb_bioinsight_spark.functions.text import shingles_duckdb

    return shingles_duckdb(toks, n)


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style repeated-substring spans (Lee et al. 2022 analog):
    maximal per-doc spans of word 8-grams that occur in >= 2 distinct docs."""
    from vectordb_bioinsight_spark.operators.dedup import repeated_ngram_spans

    docs = load_table(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, "doc_id", "text", n=SPAN_N, min_docs=2)


def _sql_repeated_spans() -> str:
    from vectordb_bioinsight_spark.functions.hashing import PORTABLE_HASH64_DUCKDB

    h = PORTABLE_HASH64_DUCKDB.format(expr="shingle")
    return f"""
WITH toks AS (SELECT doc_id, {_TOK3} AS tk FROM documents),
s AS (SELECT doc_id, {_shingle_n_duckdb('tk', SPAN_N)} AS sh FROM toks),
sh AS (
  SELECT doc_id, unnest(range(0, len(sh)))::BIGINT AS pos, unnest(sh) AS shingle
  FROM s
), hashed AS (
  SELECT doc_id, pos, {h} AS h FROM sh
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT doc_id, pos FROM hashed JOIN dup USING (h)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {SPAN_N}
              THEN 1 ELSE 0 END AS is_new
  FROM hits
), islands AS (
  SELECT doc_id, pos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS span_id
  FROM flagged
)
SELECT doc_id, span_id, min(pos)::BIGINT AS span_start,
       (max(pos) + {SPAN_N} - 1)::BIGINT AS span_end,
       count(*)::BIGINT AS n_dup_ngrams
FROM islands GROUP BY doc_id, span_id
"""


SQL_REPEATED_SPANS = _sql_repeated_spans()


def q_dup_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplication measure (Lee et al. §4): per-doc fraction of tokens
    inside cross-doc repeated spans."""
    from vectordb_bioinsight_spark.operators.dedup import duplicated_token_fraction

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_token_fraction(docs, "doc_id", "text", n=SPAN_N, min_docs=2)


def _sql_dup_token_fraction() -> str:
    return f"""
WITH spans AS ({SQL_REPEATED_SPANS}),
per_doc AS (
  SELECT doc_id, sum(span_end - span_start + 1)::BIGINT AS dup_tokens
  FROM spans GROUP BY doc_id
),
toks AS (SELECT doc_id, length({_TOK3})::BIGINT AS n_tokens FROM documents)
SELECT t.doc_id, t.n_tokens, coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       round(CASE WHEN t.n_tokens > 0
                  THEN coalesce(p.dup_tokens, 0) / t.n_tokens ELSE 0.0 END, 4) AS dup_frac
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


SQL_DUP_TOKEN_FRACTION = _sql_dup_token_fraction()


# ---------------------------------------------------------------------------
# DSIR importance scoring — hashed-ngram log-likelihood ratio vs target
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_TARGET_LANG = "en"


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance scores: how target-like (lang='en')
    each doc's hashed unigram+bigram distribution is, as a smoothed
    log-likelihood ratio per feature."""
    from vectordb_bioinsight_spark.operators.text_analysis import dsir_logratio_scores

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logratio_scores(
        docs, "doc_id", "text",
        is_target=F.col("lang") == _DSIR_TARGET_LANG,
        n_buckets=_DSIR_BUCKETS,
    )


def _sql_dsir_scores() -> str:
    from vectordb_bioinsight_spark.functions.hashing import PORTABLE_HASH64_DUCKDB
    from vectordb_bioinsight_spark.functions.text import shingles_duckdb

    h = PORTABLE_HASH64_DUCKDB.format(expr="feat")
    nb = _DSIR_BUCKETS
    return f"""
WITH toks AS (
  SELECT doc_id, (lang = '{_DSIR_TARGET_LANG}') AS tgt, {_TOK3} AS tk FROM documents
), feats AS (
  SELECT doc_id, tgt, unnest(list_concat(tk, {shingles_duckdb('tk', 2)})) AS feat
  FROM toks
), bkt AS (
  SELECT doc_id, tgt, ((({h}) % {nb}) + {nb}) % {nb} AS b FROM feats
), dc AS (
  SELECT doc_id, b, count(*)::BIGINT AS tf, bool_or(tgt) AS tgt
  FROM bkt GROUP BY 1, 2
), bc AS (
  SELECT b, sum(CASE WHEN tgt THEN tf ELSE 0 END)::BIGINT AS ct,
         sum(tf)::BIGINT AS cr
  FROM dc GROUP BY 1
), tot AS (
  SELECT sum(ct)::DOUBLE AS tt, sum(cr)::DOUBLE AS tr FROM bc
)
SELECT dc.doc_id, sum(dc.tf)::BIGINT AS n_feats,
       round(sum(dc.tf * (ln((bc.ct + 1) / (tot.tt + {nb}))
                        - ln((bc.cr + 1) / (tot.tr + {nb})))) / sum(dc.tf), 6)
         AS dsir_score
FROM dc JOIN bc USING (b), tot
GROUP BY 1
"""


SQL_DSIR_SCORES = _sql_dsir_scores()


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (rows-only: no zlib in DuckDB;
    semantics pinned by unit tests vs Python zlib)."""
    from vectordb_bioinsight_spark.operators.text_analysis import (
        compression_ratio_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return compression_ratio_scores(docs, "doc_id", "text")


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring (add-0.1 smoothing): mean conditional token
    log-prob under the corpus-fitted transition model."""
    from vectordb_bioinsight_spark.operators.text_analysis import bigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(docs, "doc_id", "text", alpha=0.1)


def _sql_bigram_logprob() -> str:
    from vectordb_bioinsight_spark.functions.text import shingles_duckdb

    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), big AS (
  SELECT doc_id, unnest({shingles_duckdb('tk', 2)}) AS bg FROM toks
), uni AS (
  SELECT doc_id, unnest(tk) AS w FROM toks
), doc_bg AS (
  SELECT doc_id, bg, count(*)::BIGINT AS tf FROM big GROUP BY 1, 2
), model_bg AS (
  SELECT bg, sum(tf)::DOUBLE AS cbg FROM doc_bg GROUP BY 1
), model_ctx AS (
  SELECT w AS ctx, count(*)::DOUBLE AS cctx FROM uni GROUP BY 1
), vocab AS (
  SELECT count(*)::DOUBLE AS v FROM model_ctx
), scored AS (
  SELECT d.doc_id, d.tf,
         ln((m.cbg + 0.1) / (c.cctx + 0.1 * vocab.v)) AS lp
  FROM doc_bg d
  JOIN model_bg m USING (bg)
  JOIN model_ctx c ON split_part(d.bg, ' ', 1) = c.ctx, vocab
), per_doc AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
         round(sum(tf * lp) / sum(tf), 6) AS avg_logprob
  FROM scored GROUP BY 1
)
SELECT doc_id, n_bigrams, avg_logprob, round(exp(-avg_logprob), 6) AS perplexity
FROM per_doc
"""


SQL_BIGRAM_LOGPROB = _sql_bigram_logprob()


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail selection: per-LANGUAGE perplexity
    tiers under the corpus bigram LM; keep head+middle. One ntile window
    per language — see operators/sampling.py:perplexity_bucket_select."""
    from vectordb_bioinsight_spark.operators.sampling import perplexity_bucket_select
    from vectordb_bioinsight_spark.operators.text_analysis import bigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_logprob_scores(docs, "doc_id", "text", alpha=0.1).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    tiers = perplexity_bucket_select(
        scored, "lang", "perplexity", "doc_id", n_buckets=3, keep_buckets=2
    )
    return tiers.select("doc_id", "lang", "perplexity", "ppl_bucket", "kept")


SQL_PERPLEXITY_BUCKETS = f"""
WITH ppl AS ({SQL_BIGRAM_LOGPROB}),
tiers AS (
  SELECT p.doc_id, d.lang, p.perplexity,
         ntile(3) OVER (
           PARTITION BY d.lang ORDER BY p.perplexity ASC, p.doc_id ASC
         ) AS ppl_bucket
  FROM ppl p JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, perplexity, ppl_bucket, ppl_bucket <= 2 AS kept
FROM tiers
"""


def q_quality_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted per-source selection: each source's top-5 docs by the
    deterministic quality score (ties by doc_id)."""
    from vectordb_bioinsight_spark.operators.sampling import quality_quota

    docs = load_table(spark, sf_dir, "documents")
    scored = text_stats(docs, "doc_id", "text").select("doc_id", "quality_score")
    joined = docs.select("doc_id", "source").join(scored, "doc_id")
    return quality_quota(joined, "source", "quality_score", "doc_id", 5)


def _sql_quality_quota() -> str:
    return f"""
WITH stats AS ({SQL_TEXT_STATS}),
joined AS (
  SELECT d.doc_id, d.source, s.quality_score
  FROM documents d JOIN stats s USING (doc_id)
)
SELECT doc_id, source, quality_score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY quality_score DESC, doc_id ASC) AS qr
  FROM joined
) WHERE qr <= 5
"""


SQL_QUALITY_QUOTA = _sql_quality_quota()


def q_neardup_ingest_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup at ingest: odd-doc_id docs form the arriving
    batch, even-doc_id docs the existing corpus; batch docs within
    Jaccard 0.6 of ANY corpus doc are dropped (operators/dedup.
    near_dedup_against_corpus — the fuzzy companion of
    `bloom_dedup_batch`'s exact check). The asymmetric LSH band join
    restricts candidates to (batch, corpus) pairs only."""
    from vectordb_bioinsight_spark.operators.dedup import near_dedup_against_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    surv = near_dedup_against_corpus(
        batch, corpus, "doc_id", "text", min_jaccard=0.6
    )
    return surv.select("doc_id")


def _sql_neardup_ingest(
    num_hashes: int = 16, bands: int = 4, min_jaccard: float = 0.6
) -> str:
    """Twin of q_neardup_ingest_batch: same minhash/banding replay as
    _sql_training_corpus, asymmetric (batch % 2 = 1 vs corpus % 2 = 0)."""
    from vectordb_bioinsight_spark.functions.hashing import (
        PORTABLE_HASH64_DUCKDB,
        minhash_perm_duckdb,
    )

    sh_hash = PORTABLE_HASH64_DUCKDB.format(expr="s")
    sig_aggs = ", ".join(
        f"min({minhash_perm_duckdb('h', i)}) AS mh_{i}" for i in range(num_hashes)
    )
    rpb = num_hashes // bands
    band_arms = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {h} AS bucket FROM sigs".format(
            b=b,
            h=PORTABLE_HASH64_DUCKDB.format(
                expr="concat_ws(',', "
                + ", ".join(f"CAST(mh_{i} AS VARCHAR)" for i in range(b * rpb, (b + 1) * rpb))
                + ")"
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), sh_all AS (
  SELECT doc_id, unnest({_SHINGLE3}) AS s FROM toks
), shd AS (
  SELECT DISTINCT doc_id, s FROM sh_all
), shh AS (
  SELECT doc_id, {sh_hash} AS h FROM sh_all
), sigs AS (
  SELECT doc_id, {sig_aggs} FROM shh GROUP BY 1
), banded AS (
  {band_arms}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1
), inter AS (
  SELECT c.doc1, c.doc2, count(*) AS i
  FROM cand c
  JOIN shd a ON a.doc_id = c.doc1
  JOIN shd b ON b.doc_id = c.doc2 AND b.s = a.s
  GROUP BY 1, 2
), dup AS (
  SELECT DISTINCT doc1 FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE round(i::DOUBLE / (s1.n_sh + s2.n_sh - i), 6) >= {min_jaccard}
)
SELECT doc_id FROM documents
WHERE doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc1 = doc_id)
"""


SQL_NEARDUP_INGEST_BATCH = _sql_neardup_ingest()


def q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram eval-decontamination (GPT-3 appendix C): every corpus
    doc flagged by distinct 5-gram overlap with a planted benchmark set
    (docs with doc_id % 89 == 0 act as "leaked eval items"), clean docs
    kept with n_matched = 0. Non-vacuous at any SF: each planted item
    flags at least itself."""
    from vectordb_bioinsight_spark.operators.text_analysis import ngram_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 89 == 0).select("doc_id", "text")
    return ngram_decontaminate(docs, bench, "doc_id", "text", n=5, min_matches=1)


def _sql_ngram_decontaminate() -> str:
    from vectordb_bioinsight_spark.functions.text import shingles_duckdb

    g5 = shingles_duckdb("tk", 5)
    return f"""
WITH ctoks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), cg AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
  FROM (SELECT doc_id, unnest({g5}) AS g FROM ctoks)
), bg AS (
  SELECT DISTINCT gh FROM cg WHERE doc_id % 89 = 0
), m AS (
  SELECT c.doc_id, count(*)::BIGINT AS n_matched
  FROM cg c JOIN bg USING (gh) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(m.n_matched, 0)::BIGINT AS n_matched,
       coalesce(m.n_matched, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
"""


SQL_NGRAM_DECONTAMINATE = _sql_ngram_decontaminate()


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-analog hashed linear quality classifier over every doc —
    the CCNet/LLaMA quality-gate scoring plan (scan-local, zero shuffle)."""
    from vectordb_bioinsight_spark.operators.text_analysis import hashed_linear_quality

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_quality(docs, "doc_id", "text", n_buckets=4096, seed=7)


def _sql_quality_classifier() -> str:
    from vectordb_bioinsight_spark.functions.hashing import PORTABLE_HASH64_DUCKDB

    bucket = PORTABLE_HASH64_DUCKDB.format(expr="t.w") + " % 4096"
    wt = (
        "((" + PORTABLE_HASH64_DUCKDB.format(expr=f"'7|' || ({bucket})::VARCHAR")
        + " % 2001) - 1000) / 1024.0"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents
), t AS (
  SELECT doc_id, unnest(tk) AS w FROM toks
), s AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_tokens, sum({wt}) AS ws
  FROM t GROUP BY t.doc_id
), scored AS (
  SELECT k.doc_id,
         coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
         round(CASE WHEN coalesce(s.n_tokens, 0) > 0 THEN s.ws / s.n_tokens ELSE 0.0 END, 6) AS quality_logit
  FROM toks k LEFT JOIN s ON k.doc_id = s.doc_id
)
SELECT doc_id, n_tokens, quality_logit,
       round(1.0 / (1.0 + exp(-quality_logit)), 6) AS quality_score,
       round(1.0 / (1.0 + exp(-quality_logit)), 6) >= 0.5 AS keep
FROM scored
"""


SQL_QUALITY_CLASSIFIER = _sql_quality_classifier()


_CMS_W, _CMS_D = 1024, 4
_CMS_WATCH = ("batch", "join", "scan", "data", "query", "table", "index", "merge")


def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for a watchlist of terms,
    alongside exact counts — the bounded-state (depth*width rows, never
    vocabulary-sized) frequency table, probed without rescanning."""
    from vectordb_bioinsight_spark.operators.sketches import cms_build, cms_estimate
    from vectordb_bioinsight_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("term"))
    sketch = cms_build(toks, "term", width=_CMS_W, depth=_CMS_D)
    watch = spark.createDataFrame([(t,) for t in _CMS_WATCH], ["term"])
    est = cms_estimate(sketch, watch, "term", width=_CMS_W, depth=_CMS_D)
    exact = (
        toks.filter(F.col("term").isin(*_CMS_WATCH))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("exact_n"))
    )
    return est.join(exact, "term", "left").select(
        "term", "cms_est", F.coalesce("exact_n", F.lit(0).cast("long")).alias("exact_n")
    )


def _sql_cms_term_counts() -> str:
    watch = ", ".join(f"'{t}'" for t in _CMS_WATCH)
    bucket = "(('0x' || substr(md5(j::VARCHAR || '|' || term), 1, 15))::BIGINT % {w})".format(
        w=_CMS_W
    )
    return f"""
WITH toks AS (
  SELECT unnest({_TOK3}) AS term FROM documents
), ds AS (
  SELECT unnest(range(0, {_CMS_D})) AS j
), sk AS (
  SELECT j, {bucket} AS bucket, count(*)::BIGINT AS cnt
  FROM toks CROSS JOIN ds GROUP BY 1, 2
), watch AS (
  SELECT unnest([{watch}]) AS term
), probes AS (
  SELECT term, j, {bucket} AS bucket FROM watch CROSS JOIN ds
), est AS (
  SELECT term, min(coalesce(sk.cnt, 0))::BIGINT AS cms_est
  FROM probes LEFT JOIN sk USING (j, bucket) GROUP BY term
), ex AS (
  SELECT term, count(*)::BIGINT AS exact_n FROM toks
  WHERE term IN ({watch}) GROUP BY term
)
SELECT e.term, e.cms_est, coalesce(x.exact_n, 0)::BIGINT AS exact_n
FROM est e LEFT JOIN ex x USING (term)
"""


SQL_CMS_TERM_COUNTS = _sql_cms_term_counts()


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted doc sample (Efraimidis-Spirakis with hash-derived
    uniforms): top-50 priority keys, inclusion ~ n_chars, fully
    deterministic."""
    from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_hash_sample(docs, "doc_id", "n_chars", k=50, salt=11)
    return out.select("doc_id", "n_chars", "es_key")


SQL_WEIGHTED_SAMPLE_DOCS = """
SELECT doc_id, n_chars, es_key FROM (
  SELECT doc_id, n_chars,
         round(ln((('0x' || substr(md5('11|' || doc_id::VARCHAR), 1, 15))::BIGINT + 1)
                  / 1152921504606846976.0) / n_chars, 6) AS es_key
  FROM documents WHERE n_chars > 0
)
ORDER BY es_key DESC, doc_id ASC LIMIT 50
"""


def q_cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF topic terms per embedding label (BERTopic formulation):
    top-5 most characteristic terms of each label's documents."""
    from vectordb_bioinsight_spark.operators.text_analysis import class_tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    labeled = docs.join(emb, "doc_id").select("label", "text")
    return class_tfidf_top_terms(labeled, "label", "text", top_n=5)


SQL_CLUSTER_TOP_TERMS = f"""
WITH labeled AS (
  SELECT e.label, d.text FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), toks AS (
  SELECT label, unnest({_TOK3}) AS term FROM labeled
), tf AS (
  SELECT label, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), ctot AS (
  SELECT label, sum(tf)::DOUBLE AS ct FROM tf GROUP BY 1
), a AS (
  SELECT avg(ct) AS A FROM ctot
), fterm AS (
  SELECT term, sum(tf)::DOUBLE AS f FROM tf GROUP BY 1
), scored AS (
  SELECT tf.label, tf.term, tf.tf,
         round((tf.tf / c.ct) * ln(1.0 + a.A / ft.f), 6) AS ctfidf
  FROM tf JOIN ctot c ON tf.label = c.label
  JOIN fterm ft ON tf.term = ft.term
  CROSS JOIN a
)
SELECT label, term, tf, ctfidf, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY label ORDER BY ctfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting per source: docs, chars, whitespace tokens, and
    the BPE-ish pretokenizer budget with each source's share — the
    numbers every training-mixture decision starts from. One scan-local
    projection + one source-keyed groupBy."""
    from vectordb_bioinsight_spark.functions.text import bpe_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(token_count("text")).cast("long").alias("ws_tokens"),
        F.sum(bpe_token_count(F.col("text"))).cast("long").alias("bpe_tokens"),
    )
    total = agg.agg(F.sum("bpe_tokens").alias("_total_bpe"))
    return agg.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_chars",
        "ws_tokens",
        "bpe_tokens",
        F.round(F.col("bpe_tokens") / F.col("_total_bpe"), 6).alias("token_share"),
    )


def _sql_corpus_token_budget() -> str:
    from vectordb_bioinsight_spark.functions.text import bpe_token_count_duckdb

    bpe = bpe_token_count_duckdb("text")
    return f"""
WITH a AS (
  SELECT source,
         count(*)::BIGINT AS n_docs,
         sum(length(text))::BIGINT AS n_chars,
         sum(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0)))::BIGINT AS ws_tokens,
         sum({bpe})::BIGINT AS bpe_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_chars, ws_tokens, bpe_tokens,
       round(bpe_tokens / sum(bpe_tokens) OVER (), 6) AS token_share
FROM a
"""


SQL_CORPUS_TOKEN_BUDGET = _sql_corpus_token_budget()


# --- BPE tokenizer tier (operators/bpe.py) ---------------------------------

#: A FIXED merge table — the shippable tokenizer artifact (learned once with
#: bpe_train on this corpus, then frozen, exactly how a production tokenizer
#: is a frozen file). Literal merges keep the encode entry hash-oracle-able.
BPE_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"),
]


def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE subword encoding (Sennrich 2016) of 5% of the corpus under the
    frozen 16-merge model — the anchored-replace chain is pure scan-local
    JVM expression work, zero shuffle, and exactly replayable in SQL.
    Output one row per subword token: (doc_id, pos, token)."""
    from vectordb_bioinsight_spark.operators.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    enc = bpe_encode(docs, "text", BPE_MERGES)
    return enc.select(
        "doc_id", F.posexplode("bpe_tokens").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


def _sql_bpe_encode() -> str:
    # per-symbol anchor wrapping (␟s␟␟s␟) — see operators/bpe.py's
    # greedy-leftmost note: a shared anchor would merge only alternate
    # occurrences of a repeated pair per pass
    sep = "\x1f"
    expr = "s"
    for left, right in BPE_MERGES:
        expr = f"replace({expr}, '{sep}{left}{sep}{sep}{right}{sep}', '{sep}{left}{right}{sep}')"
    return f"""
WITH d AS (
  SELECT doc_id, {_TOK3} AS tk FROM documents WHERE doc_id % 20 = 0
), w AS (
  SELECT doc_id, unnest(tk) AS word, generate_subscripts(tk, 1) AS wpos FROM d
), sp AS (
  SELECT doc_id, wpos,
         '{sep}' || list_aggregate(string_split(word, '') || ['</w>'], 'string_agg', '{sep}{sep}') || '{sep}' AS s
  FROM w
), m AS (
  SELECT doc_id, wpos, {expr} AS s FROM sp
), toks AS (
  SELECT doc_id, wpos,
         unnest(string_split(trim(s, '{sep}'), '{sep}{sep}')) AS tok,
         generate_subscripts(string_split(trim(s, '{sep}'), '{sep}{sep}'), 1) AS tpos
  FROM m
), cleaned AS (
  SELECT doc_id, wpos, tpos, regexp_replace(tok, '</w>$', '') AS token FROM toks
)
SELECT doc_id,
       (row_number() OVER (PARTITION BY doc_id ORDER BY wpos, tpos) - 1)::BIGINT AS pos,
       token
FROM cleaned WHERE length(token) > 0
"""


SQL_BPE_ENCODE_DOCS = _sql_bpe_encode()


_BPE_TRAIN_N = 8
_BPE_MIN_PAIR = 2


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning on the live corpus: 8 merges, corpus scanned ONCE
    into the frequency-weighted word vocab, every iteration bounded by
    vocab size. Output the ordered merge table (rank, left, right).

    Hash-oracled since r08 via the kcore_peel precedent
    (catalog_network.py::_sql_kcore_parts): the driver-iterative argmax
    loop is a FIXED 8 rounds here, so the DuckDB twin unrolls it as 8
    CTE rounds — each round re-derives the pair counts, picks the same
    deterministic argmax (count desc, left asc, right asc), and applies
    the same anchored replace via a 1-row cross join."""
    from vectordb_bioinsight_spark.operators.bpe import bpe_train, merges_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=_BPE_TRAIN_N, min_pair_count=_BPE_MIN_PAIR)
    return merges_table(spark, merges)


def _sql_bpe_train() -> str:
    """Unrolled-CTE twin of bpe_train (operators/bpe.py:82): v0 is the
    spaced frequency-weighted vocab; round i computes weighted adjacent-
    pair counts over v{i}, m{i} is the 1-row argmax (ties broken count
    desc / left asc / right asc, binary collation on both engines), and
    v{i+1} applies the anchored replace parameterized by m{i} through a
    cross join. An early Spark-side stop (argmax count < min_pair_count)
    maps to m{i} empty -> every later v/m empty: row counts agree."""
    sep = "\x1f"
    ss = sep + sep
    rounds = []
    for i in range(_BPE_TRAIN_N):
        rounds.append(f"""
s{i} AS (SELECT row_number() OVER () AS wid, w, n FROM v{i}),
x{i} AS (
  SELECT wid, n,
         unnest(string_split(trim(w, '{sep}'), '{ss}')) AS sym,
         generate_subscripts(string_split(trim(w, '{sep}'), '{ss}'), 1) AS pos
  FROM s{i}
),
p{i} AS (
  SELECT n, sym AS l, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS r
  FROM x{i}
),
m{i} AS (
  SELECT {i}::INTEGER AS "rank", l, r
  FROM p{i} WHERE r IS NOT NULL
  GROUP BY l, r HAVING sum(n) >= {_BPE_MIN_PAIR}
  ORDER BY sum(n) DESC, l ASC, r ASC LIMIT 1
),
v{i + 1} AS (
  SELECT replace(v.w, '{sep}' || m.l || '{ss}' || m.r || '{sep}',
                 '{sep}' || m.l || m.r || '{sep}') AS w, v.n
  FROM v{i} v CROSS JOIN m{i} m
)""")
    union = " UNION ALL ".join(f"SELECT * FROM m{i}" for i in range(_BPE_TRAIN_N))
    return f"""
WITH d AS (SELECT {_TOK3} AS tk FROM documents),
w0 AS (SELECT unnest(tk) AS word FROM d),
wc AS (SELECT word, count(*)::BIGINT AS n FROM w0 GROUP BY word),
v0 AS (
  SELECT '{sep}' || list_aggregate(string_split(word, '') || ['</w>'], 'string_agg', '{ss}') || '{sep}' AS w,
         n
  FROM wc
),{",".join(rounds)}
SELECT "rank", l AS "left", r AS "right" FROM ({union}) ORDER BY "rank"
"""


SQL_BPE_TRAIN_MERGES = _sql_bpe_train()


# --- positional retrieval (operators/phrase.py) -----------------------------


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("merge join") via the anchor trick: positions
    of term_i shifted by -i agree at a match — one tokenize scan, a
    scan-local term filter, ONE groupBy; no positional self-join. Output
    every occurrence (doc_id, start_pos)."""
    from vectordb_bioinsight_spark.operators.phrase import phrase_match

    docs = load_table(spark, sf_dir, "documents")
    return phrase_match(docs, "doc_id", "text", ["merge", "join"])


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, unnest(tk) AS token, generate_subscripts(tk, 1) - 1 AS pos
  FROM (SELECT doc_id, {_TOK3} AS tk FROM documents)
), cand AS (
  SELECT doc_id, pos - m.i AS start_pos, m.i
  FROM toks JOIN (VALUES (0, 'merge'), (1, 'join')) m(i, t) ON m.t = toks.token
)
SELECT doc_id, start_pos::BIGINT AS start_pos
FROM cand WHERE start_pos >= 0
GROUP BY 1, 2 HAVING count(DISTINCT i) = 2
"""


def q_term_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-proximity scores: per-doc minimum token distance between
    'vector' and 'spark' (1 = adjacent) — the lexical closeness signal
    BM25's bag-of-words scoring cannot express. Join input is two posting
    lists, never the token stream."""
    from vectordb_bioinsight_spark.operators.phrase import min_term_distance

    docs = load_table(spark, sf_dir, "documents")
    return min_term_distance(docs, "doc_id", "text", "vector", "spark")


SQL_TERM_PROXIMITY = f"""
WITH toks AS (
  SELECT doc_id, unnest(tk) AS token, generate_subscripts(tk, 1) - 1 AS pos
  FROM (SELECT doc_id, {_TOK3} AS tk FROM documents)
)
SELECT a.doc_id, min(abs(a.pos - b.pos))::BIGINT AS min_dist
FROM (SELECT doc_id, pos FROM toks WHERE token = 'vector') a
JOIN (SELECT doc_id, pos FROM toks WHERE token = 'spark') b USING (doc_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# corpus_data_card — the per-source release summary
# ---------------------------------------------------------------------------


def q_corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source "data card" table a corpus release ships: volume
    (docs/chars/tokens), mean quality, exact-duplicate rate, declared-
    English share. One groupBy over one corpus scan; quality averages in
    DECIMAL so the cross-engine sum is exact (float partial-sum order
    would flake the hash)."""
    from vectordb_bioinsight_spark.functions.text import bpe_token_count
    from vectordb_bioinsight_spark.operators.text_analysis import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score_expr("text").cast("decimal(18,6)")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.sum(bpe_token_count(F.col("text"))).cast("long").alias("n_tokens"),
            F.round((F.sum(q) / F.count("*")).cast("double"), 6).alias("mean_quality"),
            F.round(
                1.0 - F.countDistinct(F.md5("text")).cast("double") / F.count("*"), 6
            ).alias("exact_dup_rate"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("share_en"),
        )
        .orderBy("source")
    )


def _sql_corpus_data_card() -> str:
    from vectordb_bioinsight_spark.functions.text import bpe_token_count_duckdb

    quality = (
        "round(least(length(tk) / 20.0, 1.0) * 0.4"
        " + (1.0 - least(pr * 5.0, 1.0)) * 0.3"
        " + least(sr * 4.0, 1.0) * 0.3, 6)"
    )
    return f"""
WITH base AS (
  SELECT source, lang, text, {_TOK3} AS tk,
         length(regexp_replace(text, '[a-z0-9A-Z ]', '', 'g'))::DOUBLE / length(text) AS pr
  FROM documents
), perdoc AS (
  SELECT source, lang, text,
         {bpe_token_count_duckdb('text')}::BIGINT AS n_bpe,
         {quality.replace('sr', '(CASE WHEN length(tk) > 0 THEN length(list_filter(tk, t -> list_contains(' + _SW_SQL + ', t)))::DOUBLE / length(tk) ELSE 0.0 END)')}::DECIMAL(18,6) AS q
  FROM base
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS n_chars,
       sum(n_bpe)::BIGINT AS n_tokens,
       round((sum(q) / count(*))::DOUBLE, 6) AS mean_quality,
       round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(*), 6) AS exact_dup_rate,
       round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS share_en
FROM perdoc GROUP BY source ORDER BY source
"""


SQL_CORPUS_DATA_CARD = _sql_corpus_data_card()


def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases per document (operators/text_analysis.py::
    rake_keyphrases): stopword-free token runs scored by the sum of
    their words' deg/freq — the phrase-level upgrade of the word-level
    keyword tier; every shuffle doc-keyed, top-3 per doc."""
    from vectordb_bioinsight_spark.operators.text_analysis import (
        rake_keyphrases,
    )

    docs = load_table(spark, sf_dir, "documents")
    return rake_keyphrases(docs, "doc_id", "text", max_phrase_len=4, top_n=3)


def _sql_stoplist() -> str:
    from vectordb_bioinsight_spark.functions.text import STOPWORDS

    return ", ".join(f"'{w}'" for w in STOPWORDS)


SQL_RAKE_KEYPHRASES = f"""
WITH tok0 AS (
  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS a
        FROM documents)
), tok AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ({_sql_stoplist()}) OR length(tok) < 3
              THEN 1 ELSE 0 END AS st
  FROM tok0 WHERE length(tok) > 0
), marked AS (
  SELECT doc_id, pos, tok, st,
         sum(st) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
  FROM tok
), phrases AS (
  SELECT doc_id, phrase_id, list(tok ORDER BY pos) AS words
  FROM marked WHERE st = 0
  GROUP BY 1, 2
  HAVING len(list(tok ORDER BY pos)) BETWEEN 1 AND 4
), pw AS (
  SELECT doc_id, phrase_id, len(words) AS plen, unnest(words) AS word
  FROM phrases
), wstats AS (
  SELECT doc_id, word, sum(plen)::DOUBLE / count(*) AS wscore
  FROM pw GROUP BY 1, 2
), ps AS (
  SELECT pw.doc_id, pw.phrase_id, round(sum(w.wscore), 4) AS score
  FROM pw JOIN wstats w ON w.doc_id = pw.doc_id AND w.word = pw.word
  GROUP BY 1, 2
), named AS (
  SELECT p.doc_id, array_to_string(p.words, ' ') AS phrase,
         len(p.words)::INT AS n_words, max(s.score) AS score
  FROM phrases p JOIN ps s ON s.doc_id = p.doc_id AND s.phrase_id = p.phrase_id
  GROUP BY 1, 2, 3
)
SELECT doc_id, phrase, n_words, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, phrase ASC) AS rank
  FROM named
) WHERE rank <= 3
"""


def q_neyman_review_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated human-review sample (operators/sampling.py::
    neyman_allocation + sample_by_allocation): a 200-doc budget split
    across language strata proportional to N_h * S_h of document length
    (the survey-sampling optimum), drawn with the deterministic
    bottom-k-hash reservoir — the whole pipeline, allocation arithmetic
    AND draw, replays on the oracle."""
    from vectordb_bioinsight_spark.operators.sampling import (
        neyman_allocation,
        sample_by_allocation,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_chars", F.length("text").cast("double")
    )
    alloc = neyman_allocation(docs, ["lang"], "n_chars", n_total=200)
    sampled = sample_by_allocation(docs, alloc, ["lang"], "doc_id", salt=5)
    return sampled.select("lang", "doc_id")


SQL_NEYMAN_REVIEW_SAMPLE = """
WITH d AS (
  SELECT lang, doc_id, length(text)::DOUBLE AS n_chars FROM documents
), per AS (
  SELECT lang, count(*)::BIGINT AS n_rows,
         coalesce(stddev_samp(n_chars), 0.0) AS s
  FROM d GROUP BY 1
), tot AS (
  SELECT sum(n_rows * s) AS t FROM per
), alloc AS (
  SELECT lang,
         least(greatest(round(200.0 * n_rows * s / nullif(t, 0.0), 0)::BIGINT,
                        1), n_rows) AS n_alloc
  FROM per, tot
), ranked AS (
  SELECT d.lang, d.doc_id, a.n_alloc,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY ('0x' || substr(md5('5|' || d.doc_id::VARCHAR), 1, 15))::BIGINT ASC,
                    d.doc_id ASC) AS rn
  FROM d JOIN alloc a USING (lang)
)
SELECT lang, doc_id FROM ranked WHERE rn <= n_alloc
"""
