"""Property-based cross-engine fuzzer: random tables + random
filter/groupBy/aggregate specs executed by BOTH Spark and DuckDB, compared
row-for-row. This extends the fixed catalog's oracle discipline to the
operator *space* — nulls, empty groups, negative values, duplicate keys and
float edge cases that handwritten queries never cover.

Exactness rules mirror the catalog: integer aggs compare exactly; float sums
are computed over 2-decimal-exact inputs in DECIMAL on both engines.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),                     # key k
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),  # nullable int v
        st.integers(min_value=-10_000, max_value=10_000).map(lambda c: c / 100.0),  # 2-dec m
        st.sampled_from(["a", "b", "c", None]),                     # nullable tag
    ),
    min_size=0,
    max_size=60,
)

AGG_SPECS = [
    ("count_star", lambda: F.count("*").cast("long"), "count(*)::BIGINT"),
    ("count_v", lambda: F.count("v").cast("long"), "count(v)::BIGINT"),
    ("sum_v", lambda: F.sum("v").cast("long"), "sum(v)::BIGINT"),
    ("min_v", lambda: F.min("v").cast("long"), "min(v)::BIGINT"),
    ("max_v", lambda: F.max("v").cast("long"), "max(v)::BIGINT"),
    (
        "sum_m",
        lambda: F.round(F.sum(F.col("m").cast("decimal(18,2)")), 2).cast("double"),
        "round(sum(m::DECIMAL(18,2)), 2)::DOUBLE",
    ),
    ("n_tags", lambda: F.count_distinct(F.col("tag")).cast("long"), "count(DISTINCT tag)::BIGINT"),
]

FILTER_SPECS = [
    (None, None),
    (lambda: F.col("v").isNotNull(), "v IS NOT NULL"),
    (lambda: F.col("v") > 0, "v > 0"),
    (lambda: F.col("tag") == "a", "tag = 'a'"),
    (lambda: F.col("m") < 0, "m < 0"),
    (lambda: F.col("v").isNull() | (F.col("k") % 2 == 0), "(v IS NULL OR k % 2 = 0)"),
]


def _run_both(spark, rows, filt_idx, agg_idxs, group):
    pdf = pd.DataFrame(rows, columns=["k", "v", "m", "tag"]).astype(
        {"k": "int64", "v": "Int64", "m": "float64", "tag": "object"}
    )
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notna(pdf), None).values.tolist() if len(pdf) else [],
        "k long, v long, m double, tag string",
    )
    filt_col, filt_sql = FILTER_SPECS[filt_idx]
    if filt_col is not None:
        sdf = sdf.filter(filt_col())
    aggs = [AGG_SPECS[i][1]().alias(AGG_SPECS[i][0]) for i in agg_idxs]
    if group:
        out = sdf.groupBy("k").agg(*aggs)
    else:
        out = sdf.agg(*aggs)

    con = duckdb.connect()
    con.register("t", pdf)
    sel = ", ".join(f"{AGG_SPECS[i][2]} AS {AGG_SPECS[i][0]}" for i in agg_idxs)
    where = f"WHERE {filt_sql}" if filt_sql else ""
    if group:
        sql = f"SELECT k, {sel} FROM t {where} GROUP BY k"
    else:
        sql = f"SELECT {sel} FROM t {where}"
    want = con.execute(sql).df()

    got = out.toPandas()
    return got, want


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    if len(got) == 0:
        return
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)

    def _key(df: pd.DataFrame) -> list[str]:
        # normalize NULL spelling first: an all-NULL column comes back as
        # object None from Spark but float NaN from DuckDB's .df(), which
        # stringify differently ('None' vs 'nan') — found by seed fuzzing
        cells = df.astype(object).where(pd.notna(df), "<NULL>")
        return cells.astype(str).agg("|".join, axis=1).sort_values().tolist()

    key_g, key_w = _key(g), _key(w)
    assert key_g == key_w, f"\nspark={key_g}\nduckdb={key_w}"


@given(
    rows=rows_strategy,
    filt_idx=st.integers(min_value=0, max_value=len(FILTER_SPECS) - 1),
    agg_idxs=st.sets(
        st.integers(min_value=0, max_value=len(AGG_SPECS) - 1), min_size=1, max_size=4
    ).map(sorted),
    group=st.booleans(),
)
@settings(**SETTINGS)
def test_random_filter_group_agg_matches_duckdb(spark, rows, filt_idx, agg_idxs, group):
    got, want = _run_both(spark, rows, filt_idx, agg_idxs, group)
    compare_frames(got, want)


right_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # nullable join key
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=20,
)

left_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.sampled_from(["x", "y"]),
    ),
    min_size=0,
    max_size=20,
)

JOIN_TYPES = [
    ("inner", "JOIN"),
    ("left", "LEFT JOIN"),
    ("left_semi", None),
    ("left_anti", None),
]


@given(
    lrows=left_rows,
    rrows=right_rows,
    jt=st.integers(min_value=0, max_value=len(JOIN_TYPES) - 1),
)
@settings(**SETTINGS)
def test_random_joins_match_duckdb_null_keys(spark, lrows, rrows, jt):
    """Join fuzz across types with NULLABLE keys — null never matches null,
    in every engine, for every join type (the classic divergence trap)."""
    lp = pd.DataFrame(lrows, columns=["k", "s"]).astype({"k": "Int64", "s": "object"})
    rp = pd.DataFrame(rrows, columns=["k", "w"]).astype({"k": "Int64", "w": "int64"})
    left = spark.createDataFrame(
        lp.astype(object).where(pd.notna(lp), None).values.tolist() if len(lp) else [],
        "k long, s string",
    )
    right = spark.createDataFrame(
        rp.astype(object).where(pd.notna(rp), None).values.tolist() if len(rp) else [],
        "k long, w long",
    )
    spark_type, sql_join = JOIN_TYPES[jt]
    # aggregate after the join so duplicate-key fan-out is also compared
    if spark_type in ("left_semi", "left_anti"):
        out = left.join(right, left.k == right.k, spark_type).groupBy("s").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        neg = "NOT" if spark_type == "left_anti" else ""
        sql = f"""
          SELECT s, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k FROM l
          WHERE {neg} EXISTS (SELECT 1 FROM r WHERE r.k = l.k) GROUP BY s
        """
    else:
        out = left.join(right, left.k == right.k, spark_type).groupBy("s").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("w").cast("long").alias("sum_w"),
        )
        sql = f"""
          SELECT s, count(*)::BIGINT AS n, sum(r.w)::BIGINT AS sum_w
          FROM l {sql_join} r ON l.k = r.k GROUP BY s
        """
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    want = con.execute(sql).df()
    compare_frames(out.toPandas(), want)


WINDOW_SPECS = [
    (
        "rn",
        lambda w: F.row_number().over(w),
        "row_number() OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST, s ASC)",
    ),
    (
        "rk",
        lambda w: F.rank().over(w),
        "rank() OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST, s ASC)",
    ),
    (
        "lag_v",
        lambda w: F.lag("v").over(w),
        "lag(v) OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST, s ASC)",
    ),
    (
        "run_cnt",
        lambda w: F.count("*").over(w.rowsBetween(-(1 << 31) + 1, 0)),
        "count(*) OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST, s ASC"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    ),
]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=0,
        max_size=40,
    ),
    spec_idxs=st.sets(
        st.integers(min_value=0, max_value=len(WINDOW_SPECS) - 1), min_size=1, max_size=3
    ).map(sorted),
)
@settings(**SETTINGS)
def test_random_windows_match_duckdb(spark, rows, spec_idxs):
    """Window fuzz: ranking/lag/running frames over nullable order keys.
    The (v, s) order is total per partition, so results are deterministic;
    Spark orders NULLS FIRST ascending by default, pinned explicitly in the
    DuckDB twin."""
    from pyspark.sql import Window

    pdf = pd.DataFrame(rows, columns=["k", "v", "s"]).astype(
        {"k": "int64", "v": "Int64", "s": "object"}
    )
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notna(pdf), None).values.tolist() if len(pdf) else [],
        "k long, v long, s string",
    )
    w = Window.partitionBy("k").orderBy(F.asc_nulls_first("v"), F.asc("s"))
    out = sdf.select(
        "k", "v", "s",
        *[WINDOW_SPECS[i][1](w).cast("long").alias(WINDOW_SPECS[i][0]) for i in spec_idxs],
    )
    sel = ", ".join(f"({WINDOW_SPECS[i][2]})::BIGINT AS {WINDOW_SPECS[i][0]}" for i in spec_idxs)
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT k, v, s, {sel} FROM t").df()
    compare_frames(out.toPandas(), want)


SETOP_SPECS = [
    ("union_all", lambda a, b: a.unionByName(b), "SELECT * FROM a UNION ALL SELECT * FROM b"),
    ("union_distinct", lambda a, b: a.unionByName(b).distinct(), "SELECT * FROM a UNION SELECT * FROM b"),
    ("intersect", lambda a, b: a.intersect(b), "SELECT * FROM a INTERSECT SELECT * FROM b"),
    ("except", lambda a, b: a.subtract(b), "SELECT * FROM a EXCEPT SELECT * FROM b"),
    ("intersect_all", lambda a, b: a.intersectAll(b), "SELECT * FROM a INTERSECT ALL SELECT * FROM b"),
    ("except_all", lambda a, b: a.exceptAll(b), "SELECT * FROM a EXCEPT ALL SELECT * FROM b"),
]

setop_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["x", "y", None]),
    ),
    min_size=0,
    max_size=15,
)


@given(
    arows=setop_rows,
    brows=setop_rows,
    op=st.integers(min_value=0, max_value=len(SETOP_SPECS) - 1),
)
@settings(**SETTINGS)
def test_random_setops_match_duckdb(spark, arows, brows, op):
    """Set-op fuzz incl. ALL variants and NULL rows — set semantics treat
    NULL = NULL (unlike join keys), another classic divergence spot."""
    ap = pd.DataFrame(arows, columns=["k", "s"]).astype({"k": "int64", "s": "object"})
    bp = pd.DataFrame(brows, columns=["k", "s"]).astype({"k": "int64", "s": "object"})
    a = spark.createDataFrame(
        ap.astype(object).where(pd.notna(ap), None).values.tolist() if len(ap) else [],
        "k long, s string",
    )
    b = spark.createDataFrame(
        bp.astype(object).where(pd.notna(bp), None).values.tolist() if len(bp) else [],
        "k long, s string",
    )
    name, fn, sql = SETOP_SPECS[op]
    con = duckdb.connect()
    con.register("a", ap)
    con.register("b", bp)
    want = con.execute(sql).df()
    compare_frames(fn(a, b).toPandas(), want)


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
                + list(" .,;:!?-_()[]'\"/\\\n\t")
                + list("àéèïîøüçñöß")
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fuzz_tokenizer_cross_engine(spark, texts):
    """tokenize == tokenize_duckdb over the portable ASCII+Latin-1 domain —
    the contract every text-op oracle in the catalog rests on. (Known
    out-of-domain divergence: U+0130, documented on tokenize.)"""
    from vectordb_bioinsight_spark.functions.text import tokenize, tokenize_duckdb

    con = duckdb.connect()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    sp = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        dk = con.execute(f"SELECT {tokenize_duckdb('$1::VARCHAR')}", [t]).fetchone()[0]
        assert sp[i] == dk, (t, sp[i], dk)


range_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=20),    # integer "time" (dup-heavy)
        st.integers(min_value=-50, max_value=50),  # value
    ),
    min_size=0,
    max_size=40,
)


@given(rows=range_rows, n=st.sampled_from([0, 2, 5]))
@settings(**SETTINGS)
def test_random_range_frames_match_duckdb(spark, rows, n):
    """RANGE-frame fuzz (the rolling_time_sum shape): value-distance frames
    with duplicate order keys — peer rows at the same time must ALL join
    the frame on both engines, which a ROWS frame would get wrong."""
    from pyspark.sql import Window

    pdf = pd.DataFrame(rows, columns=["k", "t", "v"]).astype("int64")
    sdf = spark.createDataFrame(rows if rows else [], "k long, t long, v long")
    w = Window.partitionBy("k").orderBy("t").rangeBetween(-n, 0)
    out = sdf.select(
        "k", "t", "v",
        F.sum("v").over(w).cast("long").alias("rsum"),
        F.count("*").over(w).cast("long").alias("rcnt"),
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"""SELECT k, t, v,
               (sum(v) OVER w)::BIGINT AS rsum,
               (count(*) OVER w)::BIGINT AS rcnt
        FROM t
        WINDOW w AS (PARTITION BY k ORDER BY t
                     RANGE BETWEEN {n} PRECEDING AND CURRENT ROW)"""
    ).df()
    compare_frames(out.toPandas(), want)


bpe_texts = st.lists(
    st.lists(
        st.sampled_from(["aaa", "aab", "aba", "banana", "abcabc", "aaaa", "cab"]),
        min_size=0, max_size=6,
    ).map(" ".join),
    min_size=1, max_size=4,
)
bpe_merges = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
    min_size=1, max_size=4, unique=True,
)


@given(texts=bpe_texts, merges=bpe_merges)
@settings(**SETTINGS)
def test_fuzz_bpe_replace_chain_cross_engine(spark, texts, merges):
    """The wrapped-anchor replace chain: Spark bpe_encode == the DuckDB
    REPLACE twin == the greedy-leftmost python reference, for arbitrary
    merge lists over run-heavy words (the chained-pair shapes that broke
    the single-anchor form, review r04)."""
    from vectordb_bioinsight_spark.operators.bpe import SEP, bpe_encode

    # cumulative merges apply in order, incl. merges of already-merged
    # symbols being absent — the chain must be a no-op for those
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    sp = {
        r["i"]: r["bpe_tokens"]
        for r in bpe_encode(df, "text", merges, eow=False).collect()
    }

    # python greedy-leftmost reference (applied merge-by-merge)
    def ref(t):
        out = []
        for w in t.split():
            if len(w) < 3:
                continue
            syms = list(w)
            for l, r in merges:
                i, m = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        m.append(l + r)
                        i += 2
                    else:
                        m.append(syms[i])
                        i += 1
                syms = m
            out.extend(syms)
        return out

    # DuckDB twin of the same chain
    con = duckdb.connect()
    expr = "s"
    for l, r in merges:
        expr = f"replace({expr}, '{SEP}{l}{SEP}{SEP}{r}{SEP}', '{SEP}{l}{r}{SEP}')"
    sql = f"""
    WITH w AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower($1::VARCHAR), '[^a-z0-9]+'),
                    t -> length(t) >= 3)) AS word
    ), sp AS (
      SELECT '{SEP}' || list_aggregate(string_split(word, ''), 'string_agg', '{SEP}{SEP}') || '{SEP}' AS s
      FROM w
    )
    SELECT coalesce(flatten(list(string_split(trim({expr}, '{SEP}'), '{SEP}{SEP}'))), []) FROM sp
    """
    for i, t in enumerate(texts):
        want = ref(t)
        assert sp[i] == want, (t, merges, sp[i], want)
        dk = con.execute(sql, [t]).fetchone()[0]
        assert dk == want, (t, merges, dk, want)


# ------------------------------------------------------------------ cusum
cusum_rows = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),                                 # event_type
        st.integers(min_value=0, max_value=20),                      # day offset
        st.one_of(st.none(),
                  st.integers(min_value=-10_000, max_value=10_000)
                  .map(lambda c: c / 100.0)),                        # nullable value
    ),
    min_size=0,
    max_size=60,
)


@given(rows=cusum_rows)
@settings(**SETTINGS)
def test_cusum_fold_twin_matches_on_random_series(spark, rows):
    """The growing-accumulator list_reduce twin (SQL_CUSUM_VALUE_SHIFTS)
    must replay the Spark fold on arbitrary series: NULL values, constant
    series (std=0 -> z NULL -> coalesce 0), single-day keys, duplicates."""
    import datetime

    from vectordb_bioinsight_spark.operators.stats import cusum_changepoints
    from vectordb_bioinsight_spark.plans.catalog_stats import SQL_CUSUM_VALUE_SHIFTS
    from vectordb_bioinsight_spark.plans.verify import compare

    base = datetime.datetime(2024, 1, 1)
    data = [(t, base + datetime.timedelta(days=d), v) for t, d, v in rows]
    sdf = spark.createDataFrame(
        data or [("z", base, 1.0)],
        "event_type string, ts timestamp, value double",
    )
    got = cusum_changepoints(sdf, "event_type", "ts", "value").withColumn(
        "day", F.col("day").cast("timestamp")
    )
    pdf = pd.DataFrame(
        data or [("z", base, 1.0)], columns=["event_type", "ts", "value"]
    )
    con = duckdb.connect()
    con.register("events", pdf)
    oracle = con.execute(SQL_CUSUM_VALUE_SHIFTS).fetchdf()
    problems = compare(got, oracle)
    assert not problems, (rows, problems)
