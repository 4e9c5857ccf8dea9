"""K-means clustering over an embeddings(vec_id, embedding) table —
the workhorse of embedding-space corpus curation: SemDeDup-style
semantic dedup picks per-cluster representatives (Abbas et al. 2023),
density/diversity sampling stratifies by cluster, and IVF-style ANN
partitions by nearest centroid. Lloyd's algorithm (1957/1982) with a
DETERMINISTIC init so the DuckDB oracle and a NumPy replay reproduce
the run exactly.

Determinism contract:
  * init: the k embeddings with the smallest vec_id, cluster id =
    their rank (ties impossible — vec_id is a key);
  * fixed round count (no convergence test in the oracle-checked
    path; `tol` is available for library use);
  * assignment: argmin of RAW double squared-L2 distance, ties broken
    by the smaller cluster id. Engines disagree on a distance only at
    ~1e-13 relative (unordered float sums), so an argmin flip needs a
    true gap below that — vanishingly rare and validated green at
    sf0.01. The OUTPUT is integers only (vec_id, cluster): hash-exact.

Scale shape (none of this collects the data):
  * centroids are k*dim doubles on the DRIVER (like pagerank's
    Observation scalars) — broadcast into the assignment expression as
    array literals each round;
  * assignment is ONE whole-stage-codegen projection: per centroid a
    zip_with/aggregate fold (JVM, no Python), argmin via array_min
    over (dist, cluster) structs;
  * the update is posexplode(embedding) -> partial+final AVG keyed on
    (cluster, dim): map-side combine means the shuffle carries
    ~partitions * k * dim rows, NOT n * dim;
  * empty clusters keep their previous centroid (mirrored in the
    oracle via a NOT IN union).
At 100 TB: one linear scan + one tiny-key agg per round, k*dim driver
state, no n^2, no Python rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class KMeansResult:
    assignments: DataFrame  # (vec_id long, cluster long)
    centroids: list[list[float]]  # final k x dim
    rounds: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _dist2(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<double> column and a
    centroid literal — a sequential zip_with/aggregate fold, all JVM."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Lloyd's k-means with deterministic smallest-k-ids init.

    `rounds` assignment steps run with a centroid update between
    consecutive ones (so the returned assignment reflects the final
    centroids). Returns integer assignments + the final centroids.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kmeans needs k >= 1 and rounds >= 1")
    t0 = time.time()
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    init_rows = e.orderBy("vec_id").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"kmeans: need at least k={k} rows, got {len(init_rows)}")
    centroids: list[list[float]] = [list(r["vec"]) for r in init_rows]
    dim = len(centroids[0])
    metrics: list[dict] = []
    assign = None
    for rnd in range(1, rounds + 1):
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _dist2(F.col("vec"), c).alias("d"),
                        F.lit(j).cast("long").alias("c"),
                    )
                    for j, c in enumerate(centroids)
                ]
            )
        )
        assign = e.select("vec_id", "vec", best["c"].alias("cluster"))
        if rnd < rounds:
            # centroid update: posexplode + partial+final AVG on (cluster, d)
            upd = (
                assign.select(
                    "cluster", F.posexplode("vec").alias("d", "x")
                )
                .groupBy("cluster", "d")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
            new_c: dict[int, list[float]] = {}
            for row in upd:
                new_c.setdefault(int(row["cluster"]), [0.0] * dim)[
                    int(row["d"])
                ] = float(row["m"])
            # empty clusters keep their previous centroid
            centroids = [new_c.get(j, centroids[j]) for j in range(k)]
            metrics.append(
                {"round": rnd, "nonempty": len(new_c), "wall_s": time.time() - t0}
            )
    out = assign.select("vec_id", "cluster")
    return KMeansResult(
        assignments=out,
        centroids=centroids,
        rounds=rounds,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )


def _cosine_cols(a, b) -> F.Column:
    """Cosine similarity between two array<double> Columns — the same
    sequential aggregate(zip_with(...)) fold order as simsearch._cosine
    and DuckDB's list_cosine_similarity, so doubles are bit-identical
    across engines."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return dot / (na * nb)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — k-means partitions the
    space, and WITHIN each cluster an item is removed when a
    better-ranked cluster-mate is more similar than `threshold`.

    Rank follows the paper (its implementations sweep items ordered by
    similarity to the cluster centroid and drop an item whose max
    cosine to any earlier-ranked item exceeds the threshold): rank =
    (centroid_sim ASC, vec_id ASC), i.e. the example FARTHEST from the
    centroid is kept preferentially — "we keep the example with the
    lowest cosine similarity to the centroid".

    Output: (vec_id, cluster, centroid_sim, keep) — one row per input,
    centroid_sim rounded to 9 decimals, keep = survived dedup. Fully
    deterministic: the index inherits kmeans' contract, the rank order
    and the pair test use 9-decimal-rounded cosines, so a DuckDB
    oracle re-derives the identical result.

    Scale shape: everything after the kmeans index is keyed on
    `cluster` — the rank window, the pair self-join, the dup
    anti-join. SemDeDup's own contract bounds the quadratic term: k
    scales with n so cluster sizes stay bounded (the paper uses
    k=50,000 on LAION-440M, ~9k per cluster), making the per-cluster
    pair work Σ|cluster|² with small factors; `max_cluster` (opt-in)
    makes that bound loud by refusing degenerate clusterings instead
    of silently going quadratic."""
    km = kmeans(embeddings, k=n_clusters, rounds=rounds, id_col=id_col, vec_col=vec_col)
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    a = emb.join(km.assignments, "vec_id")
    if max_cluster is not None:
        worst = (
            a.groupBy("cluster").count().agg(F.max("count").alias("mx")).collect()
        )[0]["mx"]
        if worst and worst > max_cluster:
            raise ValueError(
                f"semantic_dedup: largest cluster has {worst} rows > "
                f"max_cluster={max_cluster}; raise n_clusters (SemDeDup scales "
                f"k with n to bound per-cluster pair work)"
            )
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in km.centroids])
    scored = a.select(
        "vec_id",
        "cluster",
        "vec",
        F.round(
            _cosine_cols(
                F.col("vec"), F.element_at(cent, (F.col("cluster") + 1).cast("int"))
            ),
            9,
        ).alias("centroid_sim"),
    )
    w = Window.partitionBy("cluster").orderBy(F.asc("centroid_sim"), F.asc("vec_id"))
    # sever: the ranked index feeds THREE consumers (both pair-join
    # sides and the final keep join); without it each branch re-runs
    # the kmeans assignment + centroid-sim fold from the scan
    from linkgraph.checkpoint import sever

    ranked = sever(scored.withColumn("rn", F.row_number().over(w)))
    x = ranked.select(
        "cluster",
        F.col("vec_id").alias("x_id"),
        F.col("vec").alias("x_vec"),
        F.col("rn").alias("x_rn"),
    )
    y = ranked.select(
        "cluster",
        F.col("vec_id").alias("y_id"),
        F.col("vec").alias("y_vec"),
        F.col("rn").alias("y_rn"),
    )
    dups = (
        x.join(y, "cluster")
        .where(F.col("y_rn") < F.col("x_rn"))
        .where(F.round(_cosine_cols(F.col("x_vec"), F.col("y_vec")), 9) >= threshold)
        .select(F.col("x_id").alias("vec_id"))
        .distinct()
    )
    return (
        ranked.join(dups.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "centroid_sim",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int,
    n_clusters: int = 8,
    rounds: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Cluster-balanced (diversity-preserving) downsampling: k-means
    the corpus, then keep `per_cluster` items from EVERY cluster,
    selected by the seeded md5-prefix id hash (ties by vec_id) — the
    standard embedding-space curation move for keeping topic coverage
    while shrinking a corpus (the stratified counterpart of
    hash_sample, with strata learned from the data instead of a
    label column; cf. SemDeDup-style cluster curation pipelines).

    Deterministic end-to-end: the same kmeans index as semantic_dedup/
    ivf_ann_topk plus an engine-portable hash rank, so an external
    oracle reproduces the EXACT kept set. Returns (vec_id, cluster).

    Scale shape: one rank window keyed on `cluster`. Per-cluster
    cardinality is bounded by the kmeans contract (k scales with n —
    the same rationale that bounds semantic_dedup's pair stage); the
    hash rank costs one shuffle on the cluster key.
    """
    if per_cluster < 1:
        raise ValueError(f"per_cluster must be >= 1, got {per_cluster}")
    from linkgraph.pipeline.sampling import HASH_SPACE  # noqa: F401  (shared contract)

    assigned = kmeans(emb, k=n_clusters, rounds=rounds).assignments
    key = F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast("long")
    w = Window.partitionBy("cluster").orderBy(F.asc("h"), F.asc("vec_id"))
    return (
        assigned.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_cluster)
        .select("vec_id", "cluster")
    )


def pq_codes(
    embeddings: DataFrame,
    n_subspaces: int = 4,
    k: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes (Jégou, Douze & Schmid TPAMI'11 —
    the memory side of IVF-PQ ANN: a D-dim vector compresses to
    n_subspaces small codes; asymmetric distances then need only
    codebook lookups). The embedding splits into n_subspaces equal
    slices; each slice gets its OWN deterministic Lloyd codebook (the
    same smallest-k-ids init / argmin-with-tie-break machinery as
    `kmeans`, so codes inherit its engine-reproducibility contract).

      (vec_id, sub, code) — all int64, one row per (vector, subspace).

    Scale shape: n_subspaces independent kmeans runs over sliced
    projections (each a pure column slice of the same scan — no extra
    I/O); codes union at the end. Codebook training on a sample and
    code assignment over the full corpus is the production split —
    assignment alone is one codegen projection per subspace."""
    dim_row = embeddings.select(
        F.size(F.col(vec_col).cast("array<double>")).alias("d")
    ).first()
    if dim_row is None:
        raise ValueError("pq_codes: empty embeddings")
    dim = int(dim_row["d"])
    if n_subspaces < 1 or dim % n_subspaces != 0:
        raise ValueError(f"n_subspaces must divide dim={dim}")
    sub_dim = dim // n_subspaces
    outs = []
    for s in range(n_subspaces):
        sliced = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(
                F.col(vec_col).cast("array<double>"), s * sub_dim + 1, sub_dim
            ).alias("embedding"),
        )
        res = kmeans(sliced, k=k, rounds=rounds)
        outs.append(
            res.assignments.select(
                "vec_id",
                F.lit(s).cast("long").alias("sub"),
                F.col("cluster").cast("long").alias("code"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
