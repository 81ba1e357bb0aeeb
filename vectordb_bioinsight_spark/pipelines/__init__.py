"""End-to-end dataflow pipelines composed from the operator library."""
