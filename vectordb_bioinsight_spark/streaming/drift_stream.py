"""Streaming drift monitor — per-batch PSI against a frozen reference
(operators/drift.psi_drift inside foreachBatch).

The production-monitoring loop the drift tier exists for: a reference
window (the distribution the model/pipeline was validated on) freezes
once; every arriving micro-batch scores its PSI against it, and the
monitor log accumulates one row per batch — the table an alerting rule
tails (`psi_total > 0.2` is the conventional action threshold). The
reference side's decile cuts are computed once per run and reused for
every batch, so the per-batch cost is ONE aggregation over the batch.

Same ingest conventions as ingest_stream: availableNow drains the
landing dir and stops (the batch-refresh mode); the monitor log is an
append-only parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: conventional PSI action levels (Siddiqi 2006): < 0.1 stable,
#: 0.1-0.2 drifting, > 0.2 act
PSI_ALERT = 0.2
PSI_WATCH = 0.1


def run_psi_monitor(
    stream_df: DataFrame,
    reference: DataFrame,
    value_col: str,
    checkpoint_dir: str,
    log_path: str,
    n_bins: int = 10,
    await_termination: bool = True,
):
    """Start the monitor: for each micro-batch, PSI(batch vs reference)
    over the frozen reference deciles, appending one log row
    (batch_id, n_rows, psi_total, status) per batch. Empty batches are
    skipped. The reference is materialized once (localCheckpoint) so its
    lineage never re-executes per batch."""
    from vectordb_bioinsight_spark.operators.drift import psi_drift

    ref = reference.localCheckpoint(eager=True)

    def _score(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        psi = (
            psi_drift(ref, batch, value_col, n_bins=n_bins)
            .agg(
                F.max("psi_total").alias("psi_total"),
                F.sum("cur_n").cast("long").alias("n_rows"),
            )
            .first()
        )
        status = (
            "alert"
            if psi["psi_total"] > PSI_ALERT
            else "watch"
            if psi["psi_total"] > PSI_WATCH
            else "stable"
        )
        batch.sparkSession.createDataFrame(
            [(int(batch_id), psi["n_rows"], float(psi["psi_total"]), status)],
            "batch_id long, n_rows long, psi_total double, status string",
        ).write.mode("append").parquet(log_path)

    q = (
        stream_df.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
