"""Driver-contract invariants (ADVICE r4): the _DRIVER_TAIL ordering
game must never silently orphan a query — every queries() key needs a
DuckDB twin so tools/check_correctness.py (which iterates the FULL
dict) still verifies the queries the driver's ~50-row recording cap
drops."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402


def test_every_query_has_an_oracle_twin():
    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert q == o, (
        f"queries without oracle: {sorted(q - o)}; "
        f"oracles without query: {sorted(o - q)}"
    )


def test_driver_tail_names_are_real_queries():
    q = set(entry.queries().keys())
    stale = [name for name in entry._DRIVER_TAIL if name not in q]
    assert not stale, f"_DRIVER_TAIL names no longer in queries(): {stale}"


def test_head_fits_driver_recording_window():
    # the driver records ~50 rows in dict order; everything before the
    # tail must fit or some un-tailed query silently loses its row
    q = list(entry.queries().keys())
    head = [k for k in q if k not in entry._DRIVER_TAIL]
    assert len(head) <= 50, f"driver head too large: {len(head)} > 50"


def test_iceberg_confs_shape():
    """The config-only Iceberg swap (north rule): confs name the SQL
    extensions, a SparkCatalog with its warehouse, and the chosen
    backend; unknown backends reject."""
    import pytest

    from typhoon_ocr_spark.plans.iceberg import ICEBERG_EXTENSION, iceberg_confs

    c = iceberg_confs("s3://wh/root", catalog="lake", catalog_impl="glue")
    assert c["spark.sql.extensions"] == ICEBERG_EXTENSION
    assert c["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.lake.warehouse"] == "s3://wh/root"
    assert c["spark.sql.catalog.lake.catalog-impl"].endswith("GlueCatalog")

    h = iceberg_confs("/tmp/wh", catalog_impl="hive", uri="thrift://ms:9083")
    assert h["spark.sql.catalog.lake.type"] == "hive"
    assert h["spark.sql.catalog.lake.uri"] == "thrift://ms:9083"

    with pytest.raises(ValueError):
        iceberg_confs("/tmp/wh", catalog_impl="bogus")
