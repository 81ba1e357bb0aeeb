"""Catalog entries for the training-batch tier (operators/packing.py):
sequence packing and data-mixture sampling over the synthetic `documents`
table, each hash-checked against a DuckDB twin.

Token counts use the BPE-ish pretokenizer estimate
(functions/text.bpe_token_count) whose DuckDB twin is exact, so both
engines pack identical token streams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import (
    PORTABLE_HASH64_DUCKDB,
    salted_hash64_duckdb,
)
from vectordb_bioinsight_spark.functions.text import bpe_token_count_duckdb
from vectordb_bioinsight_spark.operators.packing import (
    DENOM,
    mixture_weight_sample,
    pack_concat_chunk,
    pack_next_fit,
    packing_stats,
)
from vectordb_bioinsight_spark.sources.readers import load_table

_SEQ_LEN = 256
_SHARDS = 8

_SHARD_SQL = (
    "((" + PORTABLE_HASH64_DUCKDB.format(expr="doc_id::VARCHAR")
    + f") % {_SHARDS} + {_SHARDS}) % {_SHARDS}"
)

_COUNTS_CTE = f"""
c AS (
  SELECT doc_id,
         {_SHARD_SQL} AS shard,
         {bpe_token_count_duckdb('text')}::BIGINT AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS tok_start
  FROM c
)"""


# ---------------------------------------------------------------------------
# sequence_pack — concat-and-chunk doc → sequence-span mapping
# ---------------------------------------------------------------------------


def q_sequence_pack(spark, sf_dir):
    """GPT-style concat-and-chunk packing: each doc's sequence span in the
    fixed-length training stream (seq_len=256, 8 hash shards). One shuffle;
    per-shard cumsum windows. See operators/packing.py:pack_concat_chunk."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_concat_chunk(docs, "doc_id", "text", seq_len=_SEQ_LEN, n_shards=_SHARDS)


SQL_SEQUENCE_PACK = f"""
WITH {_COUNTS_CTE}
SELECT doc_id, shard, n_tokens, tok_start,
       (tok_start // {_SEQ_LEN})::BIGINT AS seq_first,
       (tok_start % {_SEQ_LEN})::BIGINT AS seq_offset,
       ((tok_start + greatest(n_tokens - 1, 0)) // {_SEQ_LEN})::BIGINT AS seq_last
FROM p
"""


# ---------------------------------------------------------------------------
# sequence_pack_stats — shard-level fill report
# ---------------------------------------------------------------------------


def q_sequence_pack_stats(spark, sf_dir):
    """Shard-level packing report: sequences produced, fill ratio, docs
    straddling a boundary. See operators/packing.py:packing_stats."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_concat_chunk(docs, "doc_id", "text", seq_len=_SEQ_LEN, n_shards=_SHARDS)
    return packing_stats(packed, _SEQ_LEN)


SQL_SEQUENCE_PACK_STATS = f"""
WITH {_COUNTS_CTE},
s AS (
  SELECT doc_id, shard, n_tokens,
         (tok_start // {_SEQ_LEN})::BIGINT AS seq_first,
         ((tok_start + greatest(n_tokens - 1, 0)) // {_SEQ_LEN})::BIGINT AS seq_last
  FROM p
)
SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
       (max(seq_last) + 1)::BIGINT AS n_seqs,
       round(sum(n_tokens)::DOUBLE / ((max(seq_last) + 1) * {_SEQ_LEN}.0), 6) AS fill_ratio,
       sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END)::BIGINT AS n_split_docs
FROM s GROUP BY shard
"""


# ---------------------------------------------------------------------------
# sequence_pack_nextfit — no-split packing (applyInPandas per shard)
# ---------------------------------------------------------------------------


def q_sequence_pack_nextfit(spark, sf_dir):
    """No-split next-fit packing: new sequence when the next doc would
    overflow seq_len; oversized docs flagged. Sequential per shard →
    applyInPandas; DuckDB twin is a recursive CTE walking each shard in
    doc order. See operators/packing.py:pack_next_fit."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_next_fit(docs, "doc_id", "text", seq_len=_SEQ_LEN, n_shards=_SHARDS)


SQL_SEQUENCE_PACK_NEXTFIT = f"""
WITH RECURSIVE {_COUNTS_CTE},
o AS (
  SELECT doc_id, shard, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM c
),
walk(shard, rn, doc_id, n_tokens, seq_id, acc) AS (
  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, n_tokens
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN w.acc + o.n_tokens > {_SEQ_LEN} THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.acc + o.n_tokens > {_SEQ_LEN} THEN o.n_tokens ELSE w.acc + o.n_tokens END
  FROM walk w JOIN o ON o.shard = w.shard AND o.rn = w.rn + 1
)
SELECT doc_id, shard, n_tokens, seq_id, n_tokens > {_SEQ_LEN} AS truncated
FROM walk
"""


# ---------------------------------------------------------------------------
# mixture_sample — epoch-weighted domain replication
# ---------------------------------------------------------------------------

_WEIGHTS = {"src0": 2.4, "src1": 0.5, "src2": 1.0}
_DEFAULT_W = 1.5
_SALT = 7


def q_mixture_sample(spark, sf_dir):
    """Deterministic data-mixture sampling: src0 ×2.4, src1 ×0.5, src2 ×1.0,
    everything else ×1.5 — integer repeats + hash-gated fractional extra
    copy. See operators/packing.py:mixture_weight_sample."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = mixture_weight_sample(
        docs, "doc_id", "source", _WEIGHTS, default_weight=_DEFAULT_W, salt=_SALT
    )
    return out.select("doc_id", "source", "copy_id")


_BUCKET_SQL = (
    "((" + salted_hash64_duckdb("doc_id::VARCHAR", _SALT)
    + f") % {DENOM} + {DENOM}) % {DENOM}"
)


def _w_case() -> tuple[str, str]:
    whole = "CASE source "
    frac = "CASE source "
    for d, w in _WEIGHTS.items():
        whole += f"WHEN '{d}' THEN {int(w)} "
        frac += f"WHEN '{d}' THEN {int(round((w - int(w)) * DENOM))} "
    whole += f"ELSE {int(_DEFAULT_W)} END"
    frac += f"ELSE {int(round((_DEFAULT_W - int(_DEFAULT_W)) * DENOM))} END"
    return whole, frac


_WHOLE_SQL, _FRAC_SQL = _w_case()

SQL_MIXTURE_SAMPLE = f"""
WITH n AS (
  SELECT doc_id, source,
         ({_WHOLE_SQL}) + (CASE WHEN ({_BUCKET_SQL}) < ({_FRAC_SQL}) THEN 1 ELSE 0 END)
           AS n_copies
  FROM documents
)
SELECT doc_id, source, t.i::INT AS copy_id
FROM n, unnest(generate_series(0, n_copies - 1)) AS t(i)
WHERE n_copies > 0
"""


# ---------------------------------------------------------------------------
# temperature mixture — q_d ∝ p_d^(1/T) domain rebalancing (1/T = 0.5)
# ---------------------------------------------------------------------------

_INV_TEMP = 0.5
_T_SALT = 11


def q_temperature_weights(spark, sf_dir):
    """Per-language temperature sampling weights over the skewed `lang`
    column: q ∝ p^0.5 flattens the en-heavy natural mix."""
    from vectordb_bioinsight_spark.operators.packing import temperature_mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_weights(docs, "lang", inv_temp=_INV_TEMP)


SQL_TEMPERATURE_WEIGHTS = """
WITH counts AS (
  SELECT lang AS domain, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
), tot AS (SELECT sum(n_docs)::DOUBLE AS t FROM counts),
pw AS (
  SELECT domain, n_docs, n_docs / t AS p, sqrt(n_docs / t) AS pwv
  FROM counts, tot
), z AS (SELECT sum(pwv) AS zz FROM pw)
SELECT domain, n_docs, round(p, 6) AS p, round(pwv / zz, 6) AS q,
       round((pwv / zz) / p, 6) AS weight
FROM pw, z
"""


def q_temperature_sample(spark, sf_dir):
    """Realized temperature mixture: deterministic hash-gated replication of
    each doc by its language's q/p multiplier (4-dp)."""
    from vectordb_bioinsight_spark.operators.packing import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = temperature_mixture_sample(docs, "doc_id", "lang", inv_temp=_INV_TEMP, salt=_T_SALT)
    return out.select("doc_id", "lang", "copy_id")


_T_BUCKET_SQL = (
    "((" + salted_hash64_duckdb("doc_id::VARCHAR", _T_SALT)
    + f") % {DENOM} + {DENOM}) % {DENOM}"
)

SQL_TEMPERATURE_SAMPLE = f"""
WITH counts AS (
  SELECT lang AS domain, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
), tot AS (SELECT sum(n_docs)::DOUBLE AS t FROM counts),
pw AS (
  SELECT domain, n_docs / t AS p, sqrt(n_docs / t) AS pwv FROM counts, tot
), z AS (SELECT sum(pwv) AS zz FROM pw),
w AS (
  SELECT domain,
         floor(round((pwv / zz) / p, 6) * 10000 + 0.5) / 10000 AS weight
  FROM pw, z
), n AS (
  -- LEFT JOIN + coalesce(weight, 1.0): NULL-lang docs never equi-match the
  -- weight table, and the Spark twin (mixture_weight_sample's left join +
  -- fillna default_weight=1.0) keeps them with one copy — an inner join
  -- here would silently drop them, an oracle-parity break on NULL lang
  SELECT d.doc_id, d.lang,
         CAST(floor(coalesce(w.weight, 1.0)) AS INT)
           + (CASE WHEN ({_T_BUCKET_SQL})
                   < CAST(round((coalesce(w.weight, 1.0) - floor(coalesce(w.weight, 1.0))) * {DENOM}) AS INT)
              THEN 1 ELSE 0 END) AS n_copies
  FROM documents d LEFT JOIN w ON d.lang = w.domain
)
SELECT doc_id, lang, t.i::INT AS copy_id
FROM n, unnest(generate_series(0, n_copies - 1)) AS t(i)
WHERE n_copies > 0
"""


# ---------------------------------------------------------------------------
# shuffle_shards — deterministic global training shuffle
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 16
_SHUF_SALT = 5


def q_shuffle_shards(spark, sf_dir):
    """Reproducible epoch shuffle: every doc addressed by (shard, shard_pos)
    from a salted hash — identical order under any partitioning."""
    from vectordb_bioinsight_spark.operators.packing import shuffle_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=_SHUF_SHARDS, salt=_SHUF_SALT)


SQL_SHUFFLE_SHARDS = f"""
WITH h AS (
  SELECT doc_id, ({salted_hash64_duckdb("doc_id::VARCHAR", _SHUF_SALT)}) AS hv
  FROM documents
)
SELECT doc_id,
       (((hv % {_SHUF_SHARDS}) + {_SHUF_SHARDS}) % {_SHUF_SHARDS})::INT AS shard,
       (row_number() OVER (
          PARTITION BY ((hv % {_SHUF_SHARDS}) + {_SHUF_SHARDS}) % {_SHUF_SHARDS}
          ORDER BY hv ASC, doc_id ASC) - 1)::BIGINT AS shard_pos
FROM h
"""


# ---------------------------------------------------------------------------
# shard_manifest_docs — per-shard manifest with order-independent checksums
# ---------------------------------------------------------------------------


def q_shard_manifest_docs(spark, sf_dir):
    """Training-shard manifest (operators/packing.py:shard_manifest) over
    the epoch-shuffle assignment: doc/token/byte totals + bit_xor content
    fingerprints per shard — identical under ANY partitioning/arrival
    order, different on any changed doc."""
    from vectordb_bioinsight_spark.operators.packing import shard_manifest, shuffle_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = shuffle_shards(docs, "doc_id", n_shards=_SHARDS, salt=0)
    return shard_manifest(sharded, "shard", "doc_id", "text")


_SALTED_SHARD_SQL = (
    "((" + salted_hash64_duckdb("doc_id::VARCHAR", 0)
    + f") % {_SHARDS} + {_SHARDS}) % {_SHARDS}"
)

SQL_SHARD_MANIFEST_DOCS = f"""
WITH s AS (
  SELECT doc_id, text, {_SALTED_SHARD_SQL} AS shard FROM documents
)
SELECT shard::INT AS shard,
       count(*)::BIGINT AS n_docs,
       sum({bpe_token_count_duckdb('text')}::BIGINT)::BIGINT AS n_tokens,
       sum(strlen(text))::BIGINT AS n_bytes,
       bit_xor({PORTABLE_HASH64_DUCKDB.format(expr='text')})::BIGINT AS content_xor,
       bit_xor({PORTABLE_HASH64_DUCKDB.format(expr='doc_id::VARCHAR')})::BIGINT AS id_xor
FROM s GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# curriculum_shards_docs — quality-ordered positions inside hash shards
# ---------------------------------------------------------------------------


def q_curriculum_shards_docs(spark, sf_dir):
    """Curriculum export (operators/packing.py:curriculum_shards): balanced
    hash-shard assignment, easy-first positions by ascending BPE token
    count (the cheap difficulty proxy), doc_id tiebreak."""
    from vectordb_bioinsight_spark.operators.packing import curriculum_shards, with_token_counts

    docs = with_token_counts(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id", "text",
    ).select("doc_id", "n_tokens")
    return curriculum_shards(docs, "doc_id", "n_tokens", n_shards=_SHARDS, salt=0)


SQL_CURRICULUM_SHARDS_DOCS = f"""
WITH c AS (
  SELECT doc_id,
         {bpe_token_count_duckdb('text')}::BIGINT AS n_tokens,
         ({salted_hash64_duckdb("doc_id::VARCHAR", 0)}) AS hv
  FROM documents
)
SELECT doc_id, n_tokens,
       (((hv % {_SHARDS}) + {_SHARDS}) % {_SHARDS})::INT AS shard,
       (row_number() OVER (
          PARTITION BY ((hv % {_SHARDS}) + {_SHARDS}) % {_SHARDS}
          ORDER BY n_tokens ASC, doc_id ASC) - 1)::BIGINT AS shard_pos
FROM c
"""


# ---------------------------------------------------------------------------
# mixture_budget_plan — token-budget mixture accounting
# ---------------------------------------------------------------------------

_MB_BUDGET = 1_000_000
_MB_EPOCHS = 3.0


def q_mixture_budget_plan(spark, sf_dir):
    """Token-budget plan (operators/packing.py:mixture_budget_plan):
    deterministic nonuniform target shares (∝ source index + 1) against a
    1M-token budget, 3-epoch cap; starved sources surfaced."""
    from vectordb_bioinsight_spark.operators.packing import mixture_budget_plan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    shares = (
        docs.select("source").distinct()
        .select(
            "source",
            (F.substring("source", 4, 10).cast("int") + 1).cast("double").alias("share"),
        )
    )
    return mixture_budget_plan(
        docs, "source", "text", _MB_BUDGET, shares, max_epochs=_MB_EPOCHS
    )


SQL_MIXTURE_BUDGET_PLAN = f"""
WITH avail AS (
  SELECT source, sum({bpe_token_count_duckdb('text')}::BIGINT)::BIGINT AS avail_tokens
  FROM documents GROUP BY source
), sh AS (
  SELECT source, (substr(source, 4)::INT + 1)::DOUBLE AS share
  FROM (SELECT DISTINCT source FROM documents)
), z AS (SELECT sum(share) AS z FROM sh),
plan AS (
  SELECT a.source, a.avail_tokens, sh.share / z.z AS s
  FROM avail a JOIN sh USING (source) CROSS JOIN z
)
SELECT source, avail_tokens,
       round(s, 6) AS target_share,
       round(s * {_MB_BUDGET}, 0)::BIGINT AS want_tokens,
       round((CASE WHEN avail_tokens = 0 THEN 0.0 ELSE least(s * {_MB_BUDGET} / nullif(avail_tokens, 0), {_MB_EPOCHS}) END), 6) AS rate,
       floor((CASE WHEN avail_tokens = 0 THEN 0.0 ELSE least(s * {_MB_BUDGET} / nullif(avail_tokens, 0), {_MB_EPOCHS}) END))::INT AS n_epochs,
       round((CASE WHEN avail_tokens = 0 THEN 0.0 ELSE least(s * {_MB_BUDGET} / nullif(avail_tokens, 0), {_MB_EPOCHS}) END)
             - floor((CASE WHEN avail_tokens = 0 THEN 0.0 ELSE least(s * {_MB_BUDGET} / nullif(avail_tokens, 0), {_MB_EPOCHS}) END)), 6) AS sample_frac,
       round((CASE WHEN avail_tokens = 0 THEN 0.0 ELSE least(s * {_MB_BUDGET} / nullif(avail_tokens, 0), {_MB_EPOCHS}) END) * avail_tokens, 0)::BIGINT AS realized_tokens,
       coalesce((s * {_MB_BUDGET} / nullif(avail_tokens, 0)) > {_MB_EPOCHS},
                s * {_MB_BUDGET} > 0 AND avail_tokens = 0) AS starved
FROM plan ORDER BY source
"""


def q_chat_render_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT formatting tier (operators/sft.py::render_chat): documents cut
    into 10-word turns with alternating user/assistant roles, rendered to
    one ChatML-ish string per conversation with the assistant-only
    trained-character count. The span arithmetic itself is pinned by unit
    tests; the entry hashes the rendered strings and mask totals."""
    from vectordb_bioinsight_spark.operators.sft import render_chat

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # hoist split() into its own projection: inside the transform lambda
    # it would re-tokenize the doc once PER TURN (probe: 13.1 -> ~6 s/1M)
    turns = docs.withColumn("_w", F.split("text", " ")).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, int(ceil(size(_w) / 10.0)) - 1),"
                " i -> array_join(slice(_w, i * 10 + 1, 10), ' '))"
            )
        ).alias("turn", "ttext"),
    ).withColumn(
        "role",
        F.when(F.col("turn") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")),
    )
    out = render_chat(turns, "doc_id", "turn", "role", "ttext")
    return out.select("conv", "rendered", "n_turns", "mask_chars")


SQL_CHAT_RENDER_DOCS = """
WITH w AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS wi,
         unnest(string_split(text, ' ')) AS word
  FROM documents
), t AS (
  SELECT doc_id, (wi // 10) AS turn, string_agg(word, ' ' ORDER BY wi) AS ttext
  FROM w GROUP BY 1, 2
), r AS (
  SELECT doc_id, turn, ttext,
         CASE WHEN turn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM t
)
SELECT doc_id AS conv,
       string_agg('<|' || role || '|>' || ttext || '<|end|>', '' ORDER BY turn) AS rendered,
       count(*)::BIGINT AS n_turns,
       coalesce(sum(CASE WHEN role = 'assistant' THEN length(ttext) END), 0)::BIGINT AS mask_chars
FROM r GROUP BY 1
"""


def q_preference_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair mining (operators/sft.py::preference_pairs):
    within each (source, lang) candidate cluster the best-scoring doc is
    chosen and the top remaining members (hardest first, capped at 4)
    become rejected partners. Score = n_chars here; production callers
    pass a quality-classifier score and near-dup clusters."""
    from vectordb_bioinsight_spark.operators.sft import preference_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("|", "source", "lang").alias("cluster"),
        F.col("n_chars").cast("double").alias("score"),
    )
    return preference_pairs(docs, "cluster", "doc_id", "score")


SQL_PREFERENCE_PAIRS_DOCS = """
WITH d AS (
  SELECT doc_id, source || '|' || lang AS cluster, n_chars::DOUBLE AS score
  FROM documents
), r AS (
  SELECT *,
         row_number()        OVER w AS rn,
         first_value(doc_id) OVER w AS chosen_id,
         first_value(score)  OVER w AS chosen_score,
         count(*) OVER (PARTITION BY cluster) AS sz
  FROM d
  WINDOW w AS (PARTITION BY cluster ORDER BY score DESC, doc_id ASC)
)
SELECT cluster, chosen_id, doc_id AS rejected_id, chosen_score,
       score AS rejected_score,
       round(chosen_score - score, 6) AS margin
FROM r WHERE sz > 1 AND rn > 1 AND rn <= 5
"""


def q_compaction_plan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan (operators/packing.py::next_fit_bins):
    the per-(type, day) event 'files' pack next-fit into ~1500-row
    output bins per type — the OPTIMIZE planner as a per-key fold, then
    a per-bin rollup (n_files, total_rows, day span)."""
    from vectordb_bioinsight_spark.operators.packing import next_fit_bins

    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_rows"))
    plan = next_fit_bins(files, ["event_type"], "day", "n_rows", target=1500.0)
    return plan.groupBy("event_type", "bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.col("n_rows").cast("long")).cast("long").alias("total_rows"),
        F.min("day").cast("timestamp").alias("first_day"),
        F.max("day").cast("timestamp").alias("last_day"),
    )


SQL_COMPACTION_PLAN_EVENTS = """
WITH files AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n_rows
  FROM events GROUP BY 1, 2
), per AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(n_rows::DOUBLE ORDER BY day) AS sizes
  FROM files GROUP BY 1
), folded AS (
  SELECT event_type, days, sizes,
         list_reduce(
           list_prepend([0.0, 0.0],
                        list_transform(sizes, s -> [s, 0.0])),
           (acc, x) -> list_concat(
             [
               CASE WHEN acc[1] + x[1] > 1500.0 AND acc[1] > 0.0
                    THEN x[1] ELSE acc[1] + x[1] END,
               CASE WHEN acc[1] + x[1] > 1500.0 AND acc[1] > 0.0
                    THEN acc[2] + 1.0 ELSE acc[2] END
             ],
             list_concat(acc[3:],
               [CASE WHEN acc[1] + x[1] > 1500.0 AND acc[1] > 0.0
                     THEN acc[2] + 1.0 ELSE acc[2] END])
           )
         ) AS st
  FROM per
), items AS (
  SELECT event_type,
         unnest(days) AS day,
         unnest(list_transform(sizes, s -> s::BIGINT)) AS n_rows,
         unnest(list_transform(st[3:], b -> b::INT)) AS bin
  FROM folded
)
SELECT event_type, bin,
       count(*)::BIGINT AS n_files,
       sum(n_rows)::BIGINT AS total_rows,
       min(day)::TIMESTAMP AS first_day,
       max(day)::TIMESTAMP AS last_day
FROM items GROUP BY 1, 2
"""
