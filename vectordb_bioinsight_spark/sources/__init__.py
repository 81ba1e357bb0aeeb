"""Sources & sinks — SURVEY.md §2.1 (S1-S14)."""

from vectordb_bioinsight_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_csv_sniffed,
    TESTDATA_TABLES,
)
