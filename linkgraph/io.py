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


def write_table(df: DataFrame, dest: str, fmt: str | None = None) -> None:
    """Output dispatch — the write-side mirror of `read_pages`:

    * ``table:<identifier>`` — catalog table write. Takes the
      DataSourceV2 path first: `df.writeTo(id).createOrReplace()`,
      which on an Iceberg (or any V2) catalog atomically replaces the
      table through the catalog's commit protocol — snapshot isolation,
      format/partition-spec owned by the catalog. The session catalog
      without a V2 provider rejects REPLACE TABLE; we fall back to the
      V1 `saveAsTable(mode=overwrite)` so the same `table:` scheme is
      testable in this sandbox (no Iceberg jar) — exactly the
      degradation the read side has (read.table over a temp view).
    * path with ``fmt`` — `df.write.format(fmt).save(path)`.
    * bare path — parquet (the sandbox layout).

    Task-level ordering (repartition/sortWithinPartitions applied by
    the caller) is preserved into the written files on every branch.
    """
    if dest.startswith("table:"):
        from pyspark.errors import AnalysisException

        ident = dest[len("table:"):]
        try:
            df.writeTo(ident).createOrReplace()
        except AnalysisException as e:
            # fall back ONLY on the session catalog's V1 limitation,
            # identified by the STRUCTURED error condition (stable
            # across Spark versions/locales, unlike message text); any
            # other analysis error (schema mismatch, missing
            # namespace, ...) must surface, not be retried differently
            cond = e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
            if cond != "UNSUPPORTED_FEATURE.TABLE_OPERATION":
                raise
            df.write.mode("overwrite").saveAsTable(ident)
        return
    if fmt:
        df.write.mode("overwrite").format(fmt).save(dest)
        return
    df.write.mode("overwrite").parquet(dest)
