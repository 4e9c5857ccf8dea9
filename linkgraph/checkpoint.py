"""Per-iteration checkpoint/resume + metrics (SURVEY §2.6 row 4).

Every iterative kernel can persist `(iteration, state[, frontier])`
plus a `_metrics.json` sidecar (iteration wall time, frontier size,
edges processed, convergence scalar, per-partition row counts) under
``<root>/<job>/iter=<k>/``. A restarted run resumes at the maximum
complete iteration and produces output identical to an uninterrupted
run (pinned by tests/test_resume.py).

A `_SUCCESS`-gated layout makes partially-written iterations invisible
to resume: the state parquet's own _SUCCESS marker plus our
`_metrics.json` (written after the parquet commit) must both exist.

All sidecar/marker I/O goes through the Hadoop FileSystem API (py4j),
NOT driver-local open()/os.listdir — so the checkpoint root may be any
filesystem the parquet writer accepts (file://, hdfs://, s3a://) and
state + completion marker always live on the SAME filesystem.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path_str: str):
    """Resolve (FileSystem, Path) for a string path via the session's
    Hadoop configuration — the same resolution the parquet writer uses."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, path = _fs_and_path(spark, path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path_str: str) -> str:
    jvm = spark._jvm
    fs, path = _fs_and_path(spark, path_str)
    stream = fs.open(path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def _fs_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_and_path(spark, path_str)
    return bool(fs.exists(path))


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "CheckpointManager needs an active SparkSession (filesystem "
            "access is resolved through the session's Hadoop config)"
        )
    return spark


@dataclass
class CheckpointManager:
    root: str
    job: str
    metrics: list[dict] = field(default_factory=list)

    def _iter_dir(self, iteration: int) -> str:
        return f"{self.root.rstrip('/')}/{self.job}/iter={iteration:05d}"

    lineage: dict | None = None  # input-snapshot provenance (set once per job)

    def save(
        self,
        iteration: int,
        state: DataFrame,
        frontier: DataFrame | None = None,
        metrics: dict | None = None,
        partition_counts: bool = False,
    ) -> None:
        """partition_counts defaults OFF: it runs one extra Spark job
        (a groupBy over the state) per save, which matters for kernels
        that save EVERY round (cc/labelprop/bfs). Sparse-saving callers
        (pagerank, ckpt_every=5) opt in for the richer sidecar."""
        d = self._iter_dir(iteration)
        spark = state.sparkSession
        state.write.mode("overwrite").parquet(f"{d}/state")
        if frontier is not None:
            frontier.write.mode("overwrite").parquet(f"{d}/frontier")
        extra: dict = {}
        if partition_counts:
            from pyspark.sql import functions as F

            extra["partition_rows"] = {
                str(r["pid"]): r["rows"]
                for r in state.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("rows"))
                .collect()
            }
        if self.lineage:
            extra["lineage"] = self.lineage
        record = {"iteration": iteration, "ts": time.time(), **extra, **(metrics or {})}
        self.metrics.append(record)
        # metrics sidecar last => presence marks the iteration complete
        _fs_write_text(spark, f"{d}/_metrics.json", json.dumps(record))

    def complete_iters(self) -> list[int]:
        """Sorted list of fully-committed iterations (_SUCCESS-gated).
        Delta-layout kernels (BFS) reconstruct state by unioning all of
        these; full-state kernels only need the max."""
        spark = _active_spark()
        base = f"{self.root.rstrip('/')}/{self.job}"
        fs, base_path = _fs_and_path(spark, base)
        if not fs.exists(base_path):
            return []
        done = []
        for status in fs.listStatus(base_path):
            name = status.getPath().getName()
            if not name.startswith("iter="):
                continue
            d = f"{base}/{name}"
            if _fs_exists(spark, f"{d}/_metrics.json") and _fs_exists(
                spark, f"{d}/state/_SUCCESS"
            ):
                done.append(int(name.split("=")[1]))
        return sorted(done)

    def last_complete(self) -> int | None:
        done = self.complete_iters()
        return done[-1] if done else None

    def load(
        self, spark: SparkSession, iteration: int, with_frontier: bool = False
    ) -> tuple[DataFrame, DataFrame | None, dict]:
        d = self._iter_dir(iteration)
        state = spark.read.parquet(f"{d}/state")
        frontier = None
        if with_frontier and _fs_exists(spark, f"{d}/frontier"):
            frontier = spark.read.parquet(f"{d}/frontier")
        record = json.loads(_fs_read_text(spark, f"{d}/_metrics.json"))
        return state, frontier, record

    def clear(self) -> None:
        spark = _active_spark()
        fs, path = _fs_and_path(spark, f"{self.root.rstrip('/')}/{self.job}")
        fs.delete(path, True)


def sever(df: DataFrame) -> DataFrame:
    """Cut lineage after each iteration (SURVEY hard-part #1: the
    iterative-join plan otherwise doubles per round). localCheckpoint
    materializes to executor-local storage — cheap, no HDFS round trip;
    durable resume is the CheckpointManager's job, not this one's.

    NARROW-DIAMOND CAVEAT (measured, Spark 4.1): a loop of the form
    `state = sever(state ⋈ f(state))` stays flat across rounds ONLY
    when, at every JOIN in the round's plan, at most ONE input path
    from the checkpointed state is un-aggregated. Two state-derived
    paths meeting in a join with no intervening aggregation (e.g. a
    pure projection of the state joined back against another
    projection of it) make the localCheckpoint call itself compound
    ~2.6× per round: 0.14 s → 168 s by round 25 on a 64-row state,
    with the analyzed/optimized/physical plans ALL constant-size —
    the blowup is inside the checkpoint's RDD machinery, not
    Catalyst. An Exchange alone (repartition) does NOT reset the
    path; a groupBy aggregation does — when a branch must re-read
    per-row state, wrap it in an identity groupBy on its key.
    pagerank's loop is naturally immune because its only derived
    branch passes the gather aggregation; louvain needed an explicit
    identity-aggregate (kernels/louvain.py `vstate`). Pinned by
    tests/test_plans.py::test_sever_loop_stays_flat."""
    return df.localCheckpoint(eager=True)


def release(df: DataFrame) -> None:
    """Free the block-manager storage behind a localCheckpoint'ed
    DataFrame NOW instead of waiting for GC + ContextCleaner.

    Why this exists: an iterative kernel produces one checkpointed
    state per round; the JVM only reclaims those blocks after the
    Python wrapper is GC'd AND the ContextCleaner notices — which lags
    many iterations behind. The stale states then evict the edge-table
    cache and iteration time climbs monotonically (measured on the
    800M-edge graph: 36s -> 194s per iteration within 8 rounds).
    Reaches the RDD inside the LogicalRDD that localCheckpoint built;
    silently a no-op for any other plan shape."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        pass
