"""Driver contract for the spark-graft builder (PySpark target).

Graph kernels from SURVEY.md §2 registered over graphs derived
in-query from the driver's testdata tables (FIXTURES.md §3), each with
a DuckDB-runnable oracle. Natural int64 keys are used as vertex ids
here (dense-id assignment is exercised in tests/ and jobs/, but for
oracle comparability the queries operate on the raw keys; supplier
keys are offset by 1_000_000 to keep the two vertex namespaces
disjoint).

Float-valued results are rounded to 9 decimals on BOTH sides so the
driver's value-hash comparison is insensitive to summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPP_OFFSET = 1_000_000


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _part_supp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges = distinct (l_partkey -> offset + l_suppkey)."""
    li = _lineitem(spark, sf_dir)
    return li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
    ).distinct()


def _cust_supp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges = distinct (o_custkey -> offset + l_suppkey) via orders ⋈ lineitem."""
    li = _lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def _copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence graph: parts appearing in the same order,
    oriented src < dst, deduped (triangle-rich)."""
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "src")
    b = li.withColumnRenamed("l_partkey", "dst")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _graph(edges: DataFrame):
    from linkgraph.build import build_graph_from_edges

    return build_graph_from_edges(edges)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out/in-degree table of the part→supplier graph (engine degree
    derivation, SURVEY §2.1/S2)."""
    g = _graph(_part_supp_edges(spark, sf_dir))
    return g.degrees.select("id", "out_deg", "in_deg")


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the symmetrized co-part graph (SURVEY §2.6)."""
    from linkgraph.kernels import triangle_count

    g = _graph(_copart_edges(spark, sf_dir))
    res = triangle_count(g)
    return spark.createDataFrame([(res.count,)], "n_triangles long")


def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (hash-min, symmetrized) of the
    customer→supplier graph; returns per-component sizes keyed by the
    min-id label (SURVEY §2.4/A1)."""
    from linkgraph.kernels import connected_components

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = connected_components(g)
    return (
        res.df.groupBy("comp")
        .agg(F.count("*").alias("csize"))
        .select("comp", "csize")
    )


def q_pagerank_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 power-iteration rounds with dangling-mass
    redistribution on the customer→supplier graph (SURVEY §2.4/A3a);
    ranks rounded to 9 decimals for order-insensitive comparison."""
    from linkgraph.kernels import pagerank

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = pagerank(g, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_event_sessions_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition graph: consecutive (event_type →
    event_type) edges per user ordered by (ts, event_id), with counts
    (FIXTURES.md §3)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).where(F.col("src_type").isNotNull())
    return trans.groupBy("src_type", "dst_type").agg(F.count("*").alias("cnt"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank over the sf0.001 customer→supplier
    graph; top-100 (id, rank)."""
    from linkgraph.kernels import pagerank

    g = _graph(_cust_supp_edges(spark, "/root/testdata/sf0.001"))
    res = pagerank(g, tol=1e-6, max_iter=100)
    return res.df.orderBy(F.desc("rank"), F.asc("id")).limit(100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree_counts": q_degree_counts,
        "triangle_count": q_triangle_count,
        "cc_components": q_cc_components,
        "pagerank_k": q_pagerank_k,
        "event_sessions_graph": q_event_sessions_graph,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (ANSI SQL over the same parquet views)
# ---------------------------------------------------------------------------

_PART_SUPP_E = f"""
  SELECT DISTINCT l_partkey AS src, {SUPP_OFFSET} + l_suppkey AS dst
  FROM lineitem
"""

_CUST_SUPP_E = f"""
  SELECT DISTINCT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""

_COPART_E = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _pagerank_k_sql(k: int = 3) -> str:
    """Unrolled k-iteration PageRank with dangling redistribution —
    plain ANSI SQL (no recursive aggregation needed)."""
    sql = f"""
WITH e AS ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
od AS (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg
  FROM v LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d
    ON v.id = d.src
),
r0 AS (SELECT id, out_deg, 1.0 / (SELECT n FROM nn) AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
r{i} AS (
  SELECT r.id, r.out_deg,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    sql += f"\nSELECT id, ROUND(rank, 9) AS rank FROM {prev}"
    return sql


def oracle_sql() -> dict[str, str]:
    return {
        "degree_counts": f"""
WITH e AS ({_PART_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)
SELECT v.id,
       COALESCE(o.c, 0) AS out_deg,
       COALESCE(i.c, 0) AS in_deg
FROM v
LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) o ON v.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst) i ON v.id = i.dst
""",
        "triangle_count": f"""
WITH e0 AS ({_COPART_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS vtx, COUNT(*) AS d FROM sym GROUP BY src),
o AS (
  SELECT s.src, s.dst FROM sym s
  JOIN deg d1 ON s.src = d1.vtx
  JOIN deg d2 ON s.dst = d2.vtx
  WHERE d1.d < d2.d OR (d1.d = d2.d AND s.src < s.dst)
)
SELECT COUNT(*) AS n_triangles
FROM o e1
JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
""",
        "cc_components": f"""
WITH RECURSIVE e0 AS ({_CUST_SUPP_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
reach(id, anc) AS (
  SELECT id, id FROM v
  UNION
  SELECT s.dst AS id, r.anc
  FROM reach r JOIN sym s ON r.id = s.src
)
SELECT comp, COUNT(*) AS csize FROM (
  SELECT id, MIN(anc) AS comp FROM reach GROUP BY id
) GROUP BY comp
""",
        "pagerank_k": _pagerank_k_sql(3),
        "event_sessions_graph": """
WITH t AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src_type,
         event_type AS dst_type
  FROM events
)
SELECT src_type, dst_type, COUNT(*) AS cnt
FROM t WHERE src_type IS NOT NULL
GROUP BY src_type, dst_type
""",
    }
