"""Query catalog exposed to the driver via __spark_entry__."""
