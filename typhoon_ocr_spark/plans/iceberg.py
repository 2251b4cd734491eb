"""Iceberg catalog wiring — the config-only swap the north rule names.

No Iceberg runtime jar ships in this sandbox (no network, no pip), so
the engine's table layer runs on plain parquet through the same
DataFrameWriter API, with the Iceberg properties the north rule
actually relies on (atomic commit, snapshot-validated resume,
partition pruning, per-partition lineage) implemented and
SIGKILL-tested by the manifest runner (streaming/runner.py;
COVERAGE.md design note). On a deployment that has the jar, THIS
module is the entire difference: pass its confs to build_session and
read/write ``format("iceberg")`` — no operator changes.

Usage:

    from typhoon_ocr_spark.plans.iceberg import iceberg_confs
    spark = build_session(extra_conf=iceberg_confs(
        warehouse="s3://bucket/warehouse",
        catalog="lake",
        catalog_impl="glue",     # or "hadoop" / "hive" / "rest"
    ))
    spark.read.table("lake.web.pages")  # Iceberg snapshot reads
"""

from __future__ import annotations

ICEBERG_EXTENSION = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)
_CATALOG_IMPLS = {
    "hadoop": {"type": "hadoop"},
    "hive": {"type": "hive"},
    "glue": {
        "catalog-impl": "org.apache.iceberg.aws.glue.GlueCatalog",
        "io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
    },
    "rest": {"type": "rest"},
}


def iceberg_confs(
    warehouse: str,
    catalog: str = "lake",
    catalog_impl: str = "hadoop",
    uri: str | None = None,
) -> dict:
    """Spark confs that turn a session into an Iceberg client:
    the SQL extensions (MERGE/UPDATE/snapshot DDL), a named catalog
    with its warehouse root, and the catalog backend. ``uri`` is the
    metastore / REST endpoint for hive/rest backends."""
    if catalog_impl not in _CATALOG_IMPLS:
        raise ValueError(
            f"catalog_impl must be one of {sorted(_CATALOG_IMPLS)}"
        )
    base = f"spark.sql.catalog.{catalog}"
    confs = {
        "spark.sql.extensions": ICEBERG_EXTENSION,
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.warehouse": warehouse,
    }
    for key, value in _CATALOG_IMPLS[catalog_impl].items():
        confs[f"{base}.{key}"] = value
    if uri:
        confs[f"{base}.uri"] = uri
    return confs
