"""Bulk-vs-single-cell dataset-type detection — the reference's upload
router re-expressed as one aggregation-driven classifier.

Reference: ``rnaseq_pipeline/utils/data_type_detector.py:58-331``
(DataTypeDetector) — deterministic scoring over four evidence channels:

1. file formats (``_check_file_formats``, :145-174): .h5ad +3 singlecell,
   10X matrix.mtx(.gz) +3, barcodes.tsv(.gz) +2; a count*.csv /
   *counts*.csv with NO h5ad present +1 bulk;
2. matrix shape (``_check_matrix_shape``, :176-236): >= 500 samples +4
   singlecell, <= 200 samples +4 bulk, ambiguous in between;
3. metadata column names (``_check_metadata``, :238-271): +1 per matched
   hint column (lowercased exact match) from each side's hint list;
4. sparsity (``_check_matrix_characteristics``, :273-310): > 80% zeros
   +2 singlecell, < 30% +2 bulk.

Final verdict (:113-134): unknown when the total score is 0; otherwise
the larger side (ties -> bulk, the reference's else-branch), confidence =
winner / total, and the recommended-pipeline ladder (single-cell Scanpy;
bulk DESeq2 when n_samples >= 6, fold-change-only below).

Spark-first differences (documented, not accidental):

* The input is the engine's canonical LONG-form matrix
  ``(dataset, gene_id, sample_id, value)`` with one row per PRESENT cell
  (SURVEY §1.1 — wide CSVs melt on ingest); absent cells are implicit
  zeros, so sparsity = 1 - nnz / (n_genes * n_samples) over the dense
  grid. The reference samples the first 1000 CSV rows; we aggregate the
  whole matrix in the same single pass that measures its shape — exact,
  and one scan regardless of size.
* Evidence is emitted as stable categorical labels (the reference's
  prose strings are presentation-layer formatting).
* Everything is per-DATASET: one call classifies every pending upload in
  a directory tree at once (groupBy dataset), not one directory per
  process.

Scale: one map-side-combinable aggregation over the counts table + two
broadcast-sized hint aggregations; no window, no shuffle beyond the
groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: data_type_detector.py:36-41
SINGLECELL_HINTS = [
    "cell_type", "celltype", "cell_id", "barcode", "cluster",
    "leiden", "louvain", "umap_1", "umap_2", "tsne_1", "tsne_2",
    "n_genes_by_counts", "total_counts", "pct_counts_mt",
]

#: data_type_detector.py:44-47
BULK_HINTS = [
    "condition", "treatment", "control", "tumor", "normal",
    "patient_id", "sample_id", "replicate", "batch", "tissue",
]

SINGLECELL_MIN_SAMPLES = 500  # :33
BULK_MAX_SAMPLES = 200  # :34

PIPELINE_SINGLECELL = "SingleCellAgent (Scanpy 1-Step)"
PIPELINE_BULK = "Bulk 6-Agent Pipeline (DESeq2 2-Step)"
PIPELINE_BULK_SMALL = "Bulk Pre-computed (Fold Change only, samples < 6)"
PIPELINE_UNKNOWN = "Unknown - Manual selection required"


def _file_scores(files: DataFrame, dataset_col: str) -> DataFrame:
    """Per-dataset file-format score flags from a (dataset, file_name)
    listing (data_type_detector.py:145-174). Presence flags via max()."""
    name = F.lower(F.col("file_name"))
    return files.groupBy(F.col(dataset_col).alias("_ds")).agg(
        F.max(name.endswith(".h5ad").cast("int")).alias("_f_h5ad"),
        F.max(name.isin("matrix.mtx", "matrix.mtx.gz").cast("int")).alias("_f_mtx"),
        F.max(name.isin("barcodes.tsv", "barcodes.tsv.gz").cast("int")).alias(
            "_f_barcodes"
        ),
        F.max(
            (name.like("count%.csv") | name.like("%counts%.csv")).cast("int")
        ).alias("_f_csv"),
    )


def _meta_scores(meta_cols: DataFrame, dataset_col: str) -> DataFrame:
    """Per-dataset metadata-hint counts from a (dataset, col_name) frame
    (data_type_detector.py:238-271): +1 per DISTINCT matched hint (the
    reference matches against a CSV header, where names are unique)."""
    low = F.lower(F.col("col_name"))
    return meta_cols.select(F.col(dataset_col).alias("_ds"), low.alias("_c")).distinct().groupBy(
        "_ds"
    ).agg(
        F.sum(F.col("_c").isin(SINGLECELL_HINTS).cast("int")).alias("_m_sc"),
        F.sum(F.col("_c").isin(BULK_HINTS).cast("int")).alias("_m_bulk"),
    )


def detect_dataset_type(
    counts: DataFrame,
    dataset_col: str,
    gene_col: str,
    sample_col: str,
    value_col: str,
    meta_cols: DataFrame | None = None,
    files: DataFrame | None = None,
) -> DataFrame:
    """Classify each dataset as bulk / singlecell / unknown.

    ``counts``: long-form matrix, one row per present (gene, sample) cell.
    ``meta_cols``: optional (dataset, col_name) metadata header listing.
    ``files``: optional (dataset, file_name) directory listing.

    Output: (dataset, n_genes, n_samples, sparsity_pct, score_bulk,
    score_singlecell, data_type, confidence, recommended_pipeline,
    shape_evidence, sparsity_evidence) — confidence/sparsity rounded 4 dp.
    """
    shape = counts.groupBy(F.col(dataset_col).alias("_ds")).agg(
        F.count_distinct(F.col(gene_col)).cast("long").alias("n_genes"),
        F.count_distinct(F.col(sample_col)).cast("long").alias("n_samples"),
        F.sum((F.col(value_col) != 0).cast("long")).cast("long").alias("_nnz"),
    )
    out = shape
    if meta_cols is not None:
        out = out.join(_meta_scores(meta_cols, dataset_col), "_ds", "left")
    else:
        out = out.withColumn("_m_sc", F.lit(None)).withColumn("_m_bulk", F.lit(None))
    if files is not None:
        out = out.join(_file_scores(files, dataset_col), "_ds", "left")
    else:
        for c in ("_f_h5ad", "_f_mtx", "_f_barcodes", "_f_csv"):
            out = out.withColumn(c, F.lit(None))

    f_h5ad = F.coalesce(F.col("_f_h5ad"), F.lit(0))
    f_mtx = F.coalesce(F.col("_f_mtx"), F.lit(0))
    f_barcodes = F.coalesce(F.col("_f_barcodes"), F.lit(0))
    f_csv = F.coalesce(F.col("_f_csv"), F.lit(0))
    m_sc = F.coalesce(F.col("_m_sc"), F.lit(0))
    m_bulk = F.coalesce(F.col("_m_bulk"), F.lit(0))

    total_cells = F.col("n_genes") * F.col("n_samples")
    # exact dense-grid zero fraction in percent (kept as an un-rounded
    # expression for the thresholds; rounded only for display)
    sparsity = (
        (total_cells - F.col("_nnz")).cast("double")
        / F.nullif(total_cells.cast("double"), F.lit(0.0))
        * 100.0
    )

    shape_sc = F.when(F.col("n_samples") >= SINGLECELL_MIN_SAMPLES, 4).otherwise(0)
    shape_bulk = F.when(
        (F.col("n_samples") <= BULK_MAX_SAMPLES)
        & (F.col("n_samples") < SINGLECELL_MIN_SAMPLES),
        4,
    ).otherwise(0)
    spars_sc = F.when(sparsity > 80.0, 2).otherwise(0)
    spars_bulk = F.when(sparsity < 30.0, 2).otherwise(0)

    score_sc = (
        f_h5ad * 3 + f_mtx * 3 + f_barcodes * 2 + m_sc + shape_sc + spars_sc
    )
    # the bulk CSV point only fires with no h5ad present (:169-172)
    score_bulk = (
        F.when((f_csv == 1) & (f_h5ad == 0), 1).otherwise(0)
        + m_bulk
        + shape_bulk
        + spars_bulk
    )
    total = score_sc + score_bulk
    dtype = (
        F.when(total == 0, "unknown")
        .when(score_sc > score_bulk, "singlecell")
        .otherwise("bulk")  # ties -> bulk (:119-123 else-branch)
    )
    confidence = F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(
            F.greatest(score_sc, score_bulk).cast("double") / total.cast("double"), 4
        )
    )
    pipeline = (
        F.when(dtype == "singlecell", PIPELINE_SINGLECELL)
        .when((dtype == "bulk") & (F.col("n_samples") >= 6), PIPELINE_BULK)
        .when(dtype == "bulk", PIPELINE_BULK_SMALL)
        .otherwise(PIPELINE_UNKNOWN)
    )
    shape_ev = (
        F.when(F.col("n_samples") >= SINGLECELL_MIN_SAMPLES, "ge_500_singlecell")
        .when(F.col("n_samples") <= BULK_MAX_SAMPLES, "le_200_bulk")
        .otherwise("ambiguous")
    )
    spars_ev = (
        F.when(sparsity > 80.0, "high_sparsity_singlecell")
        .when(sparsity < 30.0, "low_sparsity_bulk")
        .otherwise("moderate_sparsity")
    )
    return out.select(
        F.col("_ds").alias("dataset"),
        "n_genes",
        "n_samples",
        F.round(sparsity, 4).alias("sparsity_pct"),
        score_bulk.cast("int").alias("score_bulk"),
        score_sc.cast("int").alias("score_singlecell"),
        dtype.alias("data_type"),
        confidence.alias("confidence"),
        pipeline.alias("recommended_pipeline"),
        shape_ev.alias("shape_evidence"),
        spars_ev.alias("sparsity_evidence"),
    )


# --- upload preprocessing siblings (backend/app/api/routes/rnaseq.py) ------

#: rnaseq.py:183-186 — tumor keyword wall for sample-name inference.
TUMOR_NAME_KEYWORDS = ["TUMOR", "CANCER", "CARCINOMA", "MALIGNANT"]

#: rnaseq.py:188-191 — normal keyword wall.
NORMAL_NAME_KEYWORDS = ["NORMAL", "CTRL", "CONTROL", "HEALTHY", "ADJACENT"]

#: rnaseq.py:355-362 — the GEO normalize ladder's (wider) keyword sets.
TUMOR_COND_KEYWORDS = ["tumor", "cancer", "tumour", "malignant", "carcinoma", "primary", "nsclc"]
NORMAL_COND_KEYWORDS = ["normal", "healthy", "control", "adjacent", "matched", "non-malignant"]


def infer_condition_from_name(sid: Column) -> Column:
    """Sample-name -> condition ladder
    (``backend/app/api/routes/rnaseq.py:159-199``,
    ``generate_metadata_from_count_matrix``): the T/N suffix regexes
    (``[A-Za-z]T$`` on the ORIGINAL case, ``_T\\d*$`` on the uppercased
    id — the reference's exact case split, so lowercase ``l400t`` falls
    through the regex branch to the last-character fallback), the
    tumor/normal keyword walls, and the bare last-character T/N/t/n
    fallback, else 'unknown'."""
    up = F.upper(sid)
    t_outer = up.endswith("T") | up.contains("_T") | up.contains("-T")
    t_hit = t_outer & (sid.rlike(r"[A-Za-z]T$") | up.rlike(r"_T\d*$"))
    n_outer = up.endswith("N") | up.contains("_N") | up.contains("-N")
    n_hit = n_outer & (sid.rlike(r"[A-Za-z]N$") | up.rlike(r"_N\d*$"))
    from vectordb_bioinsight_spark.functions.text import contains_any

    kw_tumor = contains_any(up, TUMOR_NAME_KEYWORDS)
    kw_normal = contains_any(up, NORMAL_NAME_KEYWORDS)
    return (
        F.when(t_hit, F.lit("tumor"))
        .when(n_hit, F.lit("normal"))
        .when(kw_tumor, F.lit("tumor"))
        .when(kw_normal, F.lit("normal"))
        .when(sid.endswith("T") | sid.endswith("t"), F.lit("tumor"))
        .when(sid.endswith("N") | sid.endswith("n"), F.lit("normal"))
        .otherwise(F.lit("unknown"))
    )


def normalize_condition(cond: Column) -> Column:
    """GEO condition normalizer (``rnaseq.py:353-368``): NULL/'unknown'
    -> unknown; the (wider) tumor/normal keyword walls on the lowercased
    value; anything else lowercased with spaces -> underscores."""
    from vectordb_bioinsight_spark.functions.text import contains_any

    low = F.lower(cond)
    kw_tumor = contains_any(low, TUMOR_COND_KEYWORDS)
    kw_normal = contains_any(low, NORMAL_COND_KEYWORDS)
    return (
        F.when(cond.isNull() | (cond == "unknown"), F.lit("unknown"))
        .when(kw_tumor, F.lit("tumor"))
        .when(kw_normal, F.lit("normal"))
        .otherwise(F.replace(low, F.lit(" "), F.lit("_")))
    )


def fix_split_header(text: Column, max_continuations: int = 9) -> Column:
    """Split-header repair (``rnaseq.py:383-438``, ``fix_split_header``)
    as one expression returning ``struct<text, was_fixed int>``: when
    line 2 starts with a comma, the maximal comma-prefixed run of up to
    ``max_continuations`` continuation lines (the reference scans lines
    1..9) is joined onto the header, blank data lines are dropped, and
    ``was_fixed`` is set; otherwise the text passes through untouched.
    The continuation-run length is a chained-AND unroll (line i joins
    only if every line before it joined), matching the loop's break."""
    lines = F.split(text, "\n")

    def _line(i: int) -> Column:  # 0-based, null-safe
        return F.coalesce(F.get(lines, i), F.lit(""))

    inc = []
    prev = F.lit(True)
    for i in range(1, max_continuations + 1):
        prev = prev & _line(i).startswith(",")
        inc.append(prev)
    n_cont = sum((c.cast("int") for c in inc), F.lit(0))
    header = F.trim(_line(0))
    for i, c in enumerate(inc, start=1):
        header = F.concat(header, F.when(c, F.trim(_line(i))).otherwise(F.lit("")))
    data = F.filter(
        F.slice(lines, n_cont + 2, F.size(lines)),
        lambda l: F.trim(l) != "",
    )
    fixed = F.concat_ws("\n", F.array(header), data)
    broken = (F.size(lines) >= 2) & _line(1).startswith(",")
    return F.struct(
        F.when(broken, fixed).otherwise(text).alias("text"),
        F.when(broken, 1).otherwise(0).alias("was_fixed"),
    )
