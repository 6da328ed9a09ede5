"""Sources: synthetic transcript corpus generation + parquet readers."""
