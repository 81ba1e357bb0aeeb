"""Dataset-type detector (operators/dataset_type.py) vs a pure-python port
of the reference rule ladder (data_type_detector.py:58-331)."""

import random

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.dataset_type import (
    BULK_HINTS,
    PIPELINE_BULK,
    PIPELINE_BULK_SMALL,
    PIPELINE_SINGLECELL,
    PIPELINE_UNKNOWN,
    SINGLECELL_HINTS,
    detect_dataset_type,
)


def _port(n_genes, n_samples, nnz, meta_cols, file_names):
    """Reference scoring, ported: _check_file_formats (:145-174),
    _check_matrix_shape (:176-236), _check_metadata (:238-271),
    _check_matrix_characteristics (:273-310), final verdict (:113-134)."""
    sc = bulk = 0
    names = [f.lower() for f in file_names]
    has_h5ad = any(n.endswith(".h5ad") for n in names)
    if has_h5ad:
        sc += 3
    if any(n in ("matrix.mtx", "matrix.mtx.gz") for n in names):
        sc += 3
    if any(n in ("barcodes.tsv", "barcodes.tsv.gz") for n in names):
        sc += 2
    import fnmatch

    has_csv = any(
        fnmatch.fnmatch(n, "count*.csv") or fnmatch.fnmatch(n, "*counts*.csv")
        for n in names
    )
    if has_csv and not has_h5ad:
        bulk += 1
    if n_samples >= 500:
        sc += 4
    elif n_samples <= 200:
        bulk += 4
    cols = {c.lower() for c in meta_cols}
    sc += len([h for h in SINGLECELL_HINTS if h in cols])
    bulk += len([h for h in BULK_HINTS if h in cols])
    total_cells = n_genes * n_samples
    sparsity = (total_cells - nnz) / total_cells * 100 if total_cells else None
    if sparsity is not None and sparsity > 80:
        sc += 2
    elif sparsity is not None and sparsity < 30:
        bulk += 2
    total = sc + bulk
    if total == 0:
        dtype, conf = "unknown", 0.0
    elif sc > bulk:
        dtype, conf = "singlecell", round(sc / total, 4)
    else:
        dtype, conf = "bulk", round(bulk / total, 4)
    if dtype == "singlecell":
        pipe = PIPELINE_SINGLECELL
    elif dtype == "bulk":
        pipe = PIPELINE_BULK if n_samples >= 6 else PIPELINE_BULK_SMALL
    else:
        pipe = PIPELINE_UNKNOWN
    return dtype, conf, bulk, sc, pipe


_FILE_POOL = [
    "data.h5ad", "matrix.mtx", "matrix.mtx.gz", "barcodes.tsv",
    "barcodes.tsv.gz", "count_matrix.csv", "counts.csv", "raw_counts.csv",
    "readme.txt", "metadata.csv",
]
_COL_POOL = SINGLECELL_HINTS + BULK_HINTS + ["foo", "bar", "notes"]


def test_fuzz_vs_reference_port(spark):
    """60 random datasets in ONE Spark job (the rule-port convention):
    random shapes straddling both thresholds, random sparsity, random
    hint/file subsets — every field must equal the python port."""
    rng = random.Random(42)
    counts_rows, meta_rows, file_rows, want = [], [], [], {}
    for d in range(60):
        ds = f"d{d}"
        n_genes = rng.choice([3, 10, 25])
        n_samples = rng.choice([1, 4, 24, 199, 200, 201, 350, 499, 500, 800])
        density = rng.choice([0.05, 0.15, 0.5, 0.75, 0.95])
        cells = [
            (g, s)
            for g in range(n_genes)
            for s in range(n_samples)
            if rng.random() < density
        ]
        # guarantee the full shape is observed: pin one row per gene and
        # per sample (value may be zero for some to exercise v == 0)
        cells += [(g, 0) for g in range(n_genes)] + [(0, s) for s in range(n_samples)]
        cells = sorted(set(cells))
        vals = [(ds, g, s, 0.0 if rng.random() < 0.1 else rng.uniform(1, 9)) for g, s in cells]
        counts_rows += vals
        nnz = sum(1 for _, _, _, v in vals if v != 0)
        mcols = rng.sample(_COL_POOL, rng.randrange(0, 6))
        fnames = rng.sample(_FILE_POOL, rng.randrange(0, 5))
        meta_rows += [(ds, c) for c in mcols]
        file_rows += [(ds, f) for f in fnames]
        want[ds] = (n_genes, n_samples, nnz, mcols, fnames)

    counts = spark.createDataFrame(
        counts_rows, "ds string, gene long, sample long, v double"
    )
    meta = (
        spark.createDataFrame(meta_rows, "ds string, col_name string")
        if meta_rows
        else None
    )
    files = (
        spark.createDataFrame(file_rows, "ds string, file_name string")
        if file_rows
        else None
    )
    got = {
        r["dataset"]: r
        for r in detect_dataset_type(
            counts, "ds", "gene", "sample", "v", meta_cols=meta, files=files
        ).collect()
    }
    assert set(got) == set(want)
    for ds, (n_genes, n_samples, nnz, mcols, fnames) in want.items():
        r = got[ds]
        assert (r["n_genes"], r["n_samples"]) == (n_genes, n_samples), ds
        dtype, conf, b, s, pipe = _port(n_genes, n_samples, nnz, mcols, fnames)
        assert r["data_type"] == dtype, (ds, r, (dtype, conf, b, s))
        assert r["confidence"] == pytest.approx(conf, abs=1e-9), ds
        assert (r["score_bulk"], r["score_singlecell"]) == (b, s), ds
        assert r["recommended_pipeline"] == pipe, ds


def test_unknown_and_small_bulk_branches(spark):
    """A hintless mid-size dataset with moderate sparsity scores 0 on
    every channel -> unknown; a tiny dense bulk (< 6 samples) routes to
    the fold-change-only pipeline (:130-132)."""
    rows = (
        # 250 samples (ambiguous shape), ~50% sparse (moderate): unknown
        [("amb", g, s, float(1 if (g + s) % 2 else 0)) for g in range(4) for s in range(250)]
        # 3 samples, fully dense: bulk, small-sample pipeline
        + [("tiny", g, s, 5.0) for g in range(10) for s in range(3)]
    )
    df = spark.createDataFrame(rows, "ds string, gene long, sample long, v double")
    got = {r["dataset"]: r for r in detect_dataset_type(df, "ds", "gene", "sample", "v").collect()}
    assert got["amb"]["data_type"] == "unknown"
    assert got["amb"]["confidence"] == 0.0
    assert got["amb"]["recommended_pipeline"] == PIPELINE_UNKNOWN
    assert got["tiny"]["data_type"] == "bulk"
    assert got["tiny"]["recommended_pipeline"] == PIPELINE_BULK_SMALL


# --- upload-preprocessing siblings (routes/rnaseq.py:127-438) --------------

def test_infer_condition_matches_port(spark):
    """Port of generate_metadata_from_count_matrix's ladder
    (rnaseq.py:159-199), including the case-split regex fallthrough."""
    import re

    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.dataset_type import (
        NORMAL_NAME_KEYWORDS,
        TUMOR_NAME_KEYWORDS,
        infer_condition_from_name,
    )

    def port(sid):
        su = sid.upper()
        if su.endswith("T") or "_T" in su or "-T" in su:
            if re.search(r"[A-Za-z]T$", sid) or re.search(r"_T\d*$", su):
                return "tumor"
        if su.endswith("N") or "_N" in su or "-N" in su:
            if re.search(r"[A-Za-z]N$", sid) or re.search(r"_N\d*$", su):
                return "normal"
        if any(kw in su for kw in TUMOR_NAME_KEYWORDS):
            return "tumor"
        if any(kw in su for kw in NORMAL_NAME_KEYWORDS):
            return "normal"
        if sid.endswith(("T", "t")):
            return "tumor"
        if sid.endswith(("N", "n")):
            return "normal"
        return "unknown"

    names = [
        "L400T", "L511N", "GSM2142443", "l400t", "l511n", "x_T3", "y-N",
        "TUMOR_A", "myCTRL", "AAN", "99T", "zzn", "plain", "_Tx", "12T3",
        "sample_1T", "TCGA-XX-01T", "healthy9", "ADJACENT_2",
    ]
    df = spark.createDataFrame([(s,) for s in names], "sid string")
    got = {
        r["sid"]: r["c"]
        for r in df.select(
            "sid", infer_condition_from_name(F.col("sid")).alias("c")
        ).collect()
    }
    for s in names:
        assert got[s] == port(s), (s, got[s], port(s))


def test_fix_split_header_matches_port(spark):
    """Port of fix_split_header (rnaseq.py:383-438): continuation join,
    blank-line drop in the fixed branch only, intact passthrough."""
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.dataset_type import fix_split_header

    def port(text):
        lines = text.split("\n")
        if len(lines) < 2:
            return text, False
        if lines[1].startswith(","):
            header_parts = [lines[0].strip()]
            data_start = 1
            for i in range(1, min(10, len(lines))):
                if lines[i].startswith(","):
                    header_parts.append(lines[i].strip())
                    data_start = i + 1
                else:
                    break
            combined = "".join(header_parts)
            return (
                "\n".join([combined] + [l for l in lines[data_start:] if l.strip()]),
                True,
            )
        return text, False

    texts = [
        "gene_id,s1,s2\n,s3,s4\n,s5\nG1,1,2,3,4,5\n\nG2,9,8",
        "gene_id,a\n,b\n,c\n,d\nG,1,2,3,4",
        "gene_id,s1,s2\nG1,1,2",
        "one-line",
        "h\n" + "\n".join("," + str(i) for i in range(12)) + "\nD,1",  # run caps at 9
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", fix_split_header(F.col("t")).alias("f")).collect()
    }
    for i, t in enumerate(texts):
        wt, wf = port(t)
        assert (got[i]["text"], bool(got[i]["was_fixed"])) == (wt, wf), (i, got[i])
