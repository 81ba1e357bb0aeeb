"""vectordb_bioinsight_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``jjyun78912/VectorDB_BioInsight`` (a biomedical vector-database +
RNA-seq statistics platform), re-expressed Spark-first:

* everything is a DataFrame with a declared schema (long-format facts,
  broadcastable dimensions);
* operators are composable functions ``DataFrame -> DataFrame`` that keep the
  plan declarative so Catalyst handles pushdown / pruning / join selection;
* Python only enters via Arrow-batched pandas UDFs where closed-form column
  expressions genuinely cannot express the semantics.

Subpackages
-----------
``sources``    readers/writers (parquet, CSV with delimiter sniff, VCF/MAF-style
               text parses) — SURVEY.md §2.1.
``functions``  scalar kernel library (vector math, portable hashing, text
               tokenization, closed-form statistics) — SURVEY.md §2.8/§4.3(5).
``operators``  relational + domain operators (filters, joins, aggregations,
               windows, top-k, dedup, BM25, RRF fusion, kNN, DEG pipeline,
               correlation networks, trends) — SURVEY.md §2.2-§2.10.
``plans``      the query catalog exposed to the driver via __spark_entry__.
``streaming``  Structured Streaming re-expression of the trend/briefing path —
               SURVEY.md §2.11.
"""

__version__ = "0.1.0"
