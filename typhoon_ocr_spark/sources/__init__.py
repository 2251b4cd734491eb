"""Sources: fixture corpus generation + Iceberg-style table layout
(partitioned parquet + JSON snapshot manifests; see manifest.py)."""
