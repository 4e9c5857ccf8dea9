"""Input-source dispatch for the pages corpus (north rule: "Iceberg
table of Common-Crawl-style web pages", BASELINE.json:14-15).

Iceberg inputs are table-identifier reads: `spark.read.table("cat.db
.pages")` — the Iceberg DataSourceV2 catalog handles format, snapshot
selection, partition pruning and column pruning; nothing in this
engine is parquet-specific. This sandbox has no Iceberg runtime jar
(no installs allowed), so tests exercise the parquet path plus the
table-identifier path via temp views (same `read.table` code path a
catalog table takes; only the catalog differs).

A production deployment sets
    spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog
and passes `table:cc.db.pages` to the jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, source: str, fmt: str | None = None) -> DataFrame:
    """Load the pages corpus from `source`.

    * ``table:<identifier>`` — catalog table read (Iceberg / any V2
      catalog / temp view): `spark.read.table(identifier)`.
    * path with ``fmt`` given — `spark.read.format(fmt).load(path)`.
    * bare path — parquet directory (the sandbox test layout).

    Column pruning stays with Catalyst either way: callers select the
    columns they need and the V2 scan (or parquet reader) prunes.
    """
    if source.startswith("table:"):
        return spark.read.table(source[len("table:"):])
    if fmt:
        return spark.read.format(fmt).load(source)
    return spark.read.parquet(source)
