"""Similarity search over an embeddings(vec_id, embedding array<float>,
label) table.

cosine_topk   — brute-force cosine top-k: the exactness baseline.
                Dot products via zip_with + aggregate (JVM-side,
                whole-stage codegen; no Python).
lsh_ann_topk  — random-hyperplane LSH bucketed variant: the scale
                path. Signature = sign bits against `n_planes`
                deterministic hyperplanes (seeded NumPy, broadcast as
                a literal array); candidates = bucket collisions in
                any of `n_tables` tables; exact cosine re-ranking
                within candidates. Recall measured against
                cosine_topk in tests (no SQL oracle — the driver
                records a rows-only check for this one).
ivf_ann_topk  — IVF (inverted-file) variant: the second classic ANN
                scale path (FAISS IVF-Flat, Jégou et al. TPAMI'11).
                Index = deterministic k-means (pipeline/embedcluster)
                partitions the corpus into `n_clusters` inverted
                lists; search probes the `nprobe` nearest lists per
                query and re-ranks exactly inside them. Cost ~
                q * nprobe * (n / n_clusters) dot products instead of
                q * n; at 100 TB the lists are written partitioned by
                cluster so probing is partition pruning on the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a: str, b: str) -> F.Column:
    """Cosine similarity between two array<double> columns, sequential
    fold order (matches DuckDB's list_cosine_similarity on DOUBLE[])."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = F.expr(
        f"sqrt(aggregate(transform({a}, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    nb = F.expr(
        f"sqrt(aggregate(transform({b}, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    max_queries: int = 10,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): top-k cosine neighbors per
    query vector (self excluded). Similarities are computed in double,
    rounded to 9 decimals, and ranked by (sim desc, neighbor_id asc) so
    results are order-insensitive-comparable across engines.

    CONTRACT: this is the exact brute-force BASELINE — every query is
    scored against every corpus row — but the PLAN is scan-parallel,
    not a materialized cartesian: the bounded query batch (≤
    max_queries by construction) is shipped to every task, each input
    partition computes its own partial top-k with Arrow-batched NumPy
    (sequential-fold dot products, bit-identical to the JVM
    `aggregate` fold and to DuckDB's list fold), and only ~P·q·k
    candidate rows reach the final exact merge window. One corpus
    scan, no n·q-row exchange, no single-key skew. Work is still
    O(n·q) dot products, so the `max_rows` guard stays ON BY DEFAULT
    as a cost ceiling: corpora larger than `max_rows` (default 100k)
    are refused with a ValueError pointing at lsh_ann_topk; an
    explicit larger bound (or None) is the escape hatch.

    Partition-stage pruning is exact-safe: a candidate is kept if its
    raw sim is within 2e-9 of the partition's k-th best (wider than
    the 1e-9 rounding bucket, so no row that could tie at 9 decimals
    is dropped), capped at k+64 rows per (query, partition) ordered by
    (rounded sim desc, neighbor_id asc) so degenerate all-tied corpora
    stay bounded."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if max_rows is not None:
        n_rows = emb.count()
        if n_rows > max_rows:
            raise ValueError(
                f"cosine_topk is the brute-force baseline (corpus × queries "
                f"dot products); corpus has {n_rows} rows > max_rows={max_rows}. "
                f"Use lsh_ann_topk (op 'ann_lsh') for large corpora, or raise "
                f"max_rows explicitly."
            )
    if query_ids is not None:
        queries = emb.where(F.col("vec_id").isin(query_ids))
    else:
        queries = emb.where(F.col("vec_id") < max_queries)
    qrows = sorted(queries.collect(), key=lambda r: r["vec_id"])
    spark = embeddings.sparkSession
    out_schema = "query_id long, neighbor_id long, sim double"
    if not qrows:
        return spark.createDataFrame(
            [], out_schema + ", rnk long"
        )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["vec"] for r in qrows], dtype=np.float64)

    def _seq_fold_dot(X: np.ndarray, q: np.ndarray) -> np.ndarray:
        # left fold acc = (acc + x_d*y_d) in dimension order: the exact
        # fp addition order of aggregate(zip_with(...)) on the JVM and
        # of the DuckDB oracle's list fold — bit-identical doubles.
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for d in range(X.shape[1]):
            acc = acc + X[:, d] * q[d]
        return acc

    q_norms = np.array(
        [np.sqrt(_seq_fold_dot(q_mat[i : i + 1], q_mat[i])[0]) for i in range(len(qrows))]
    )

    def partial_topk(batches):
        import pandas as pd

        cand_sims = {int(qid): np.empty(0) for qid in q_ids}
        cand_ids = {int(qid): np.empty(0, dtype=np.int64) for qid in q_ids}
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["vec"].to_list(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            row_norms = np.sqrt(_seq_fold_dot(X * X, np.ones(X.shape[1])))
            for qi in range(len(q_ids)):
                qid = int(q_ids[qi])
                dots = _seq_fold_dot(X, q_mat[qi])
                sims = dots / (q_norms[qi] * row_norms)
                mask = ids != qid
                s = np.concatenate([cand_sims[qid], sims[mask]])
                nid = np.concatenate([cand_ids[qid], ids[mask]])
                if len(s) > k:
                    kth = np.partition(s, len(s) - k)[len(s) - k]
                    keep = s >= kth - 2e-9
                    s, nid = s[keep], nid[keep]
                    if len(s) > k + 64:
                        order = np.lexsort((nid, -np.round(s, 9)))[: k + 64]
                        s, nid = s[order], nid[order]
                cand_sims[qid], cand_ids[qid] = s, nid
        frames = [
            pd.DataFrame(
                {"query_id": qid, "neighbor_id": cand_ids[qid], "sim": cand_sims[qid]}
            )
            for qid in cand_sims
            if len(cand_sims[qid])
        ]
        if frames:
            yield pd.concat(frames, ignore_index=True)

    partial = emb.mapInPandas(partial_topk, out_schema)
    scored = partial.select(
        "query_id", "neighbor_id", F.round(F.col("sim"), 9).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rnk").cast("long").alias("rnk"))
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _signed(emb: DataFrame, planes: np.ndarray) -> DataFrame:
    """(vec_id, vec, sig0..sigT): per-table sign-bit signature against
    the literal hyperplane arrays — all JVM-side higher-order funcs."""
    n_tables, n_planes, _ = planes.shape
    sig_cols = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(x)) for x in planes[t, p]])
            # dot product against a literal hyperplane array
            prod = F.aggregate(
                F.zip_with("vec", arr, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(prod > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        sig_cols.append(sum(bits[1:], bits[0]).alias(f"sig{t}"))
    return emb.select("vec_id", "vec", *sig_cols)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, sim) with
    vec_a < vec_b and cosine >= threshold, candidates restricted to
    hyperplane-LSH bucket collisions (same signature in ANY table).

    This is the embedding-space member of the dedup family (exact /
    MinHash-LSH / SimHash / n-gram-Jaccard / embedding-cosine). The
    scale shape mirrors lsh_candidate_pairs: a self-join keyed on
    (table, signature) buckets costs Σ bucket² rows, not n² — at 100 TB
    the bucket width is tuned via n_planes (16-24 bits) so buckets stay
    small; recall comes from n_tables independent tables. The
    hyperplanes are seeded/deterministic, so the full approximate
    pipeline is exactly reproducible (the driver oracle re-derives the
    same planes as SQL literals).

    Pair orientation vec_a < vec_b is applied INSIDE each bucket join
    (halves the join output) and duplicates across tables are dropped
    before the exact cosine re-check.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    first = emb.select("vec").first()
    if first is None:  # empty corpus -> empty pair set, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, sim double"
        )
    dim = len(first[0])
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    signed = _signed(emb, planes).persist()
    try:
        cands = None
        for t in range(n_tables):
            a = signed.select(
                F.col("vec_id").alias("vec_a"),
                F.col("vec").alias("va"),
                F.col(f"sig{t}").alias("sig"),
            )
            b = signed.select(
                F.col("vec_id").alias("vec_b"),
                F.col("vec").alias("vb"),
                F.col(f"sig{t}").alias("sig"),
            )
            c = (
                a.join(b, "sig")
                .where(F.col("vec_a") < F.col("vec_b"))
                .select("vec_a", "va", "vec_b", "vb")
            )
            cands = c if cands is None else cands.union(c)
        cands = cands.dropDuplicates(["vec_a", "vec_b"])
        out = (
            cands.select(
                "vec_a",
                "vec_b",
                F.round(_cosine("va", "vb"), 9).alias("sim"),
            )
            .where(F.col("sim") >= threshold)
        )
        out = out.localCheckpoint(eager=True)
    finally:
        signed.unpersist()
    return out


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    max_queries: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """IVF-Flat approximate top-k: deterministic k-means builds the
    inverted-file index, each query probes its `nprobe` nearest
    centroids, and candidates are re-ranked by exact cosine.

    (query_id, neighbor_id, sim, rnk) — same contract as cosine_topk /
    lsh_ann_topk: sim is double rounded to 9 decimals, rank order
    (sim desc, neighbor_id asc), self excluded.

    Determinism: the index inherits kmeans' contract (smallest-k init,
    fixed `rounds`, argmin with cluster-id tie-break), and the probe
    ranking uses the same (distance, cluster) order, so the candidate
    set — and therefore the result — is engine-reproducible (the
    DuckDB oracle re-derives the identical index and probes).

    Scale shape: the index build is kmeans (linear scans, k*dim driver
    state); probe lists are q * nprobe tiny rows broadcast into a join
    against the cluster-keyed corpus — with the corpus written
    partitioned by `cluster`, Catalyst prunes unprobed partitions, so
    search reads ~nprobe/n_clusters of the data. No n*q exchange, no
    Python in the scoring path (zip_with/aggregate folds, whole-stage
    codegen)."""
    from linkgraph.pipeline.embedcluster import _dist2, kmeans

    if nprobe < 1 or nprobe > n_clusters:
        raise ValueError("ivf_ann_topk needs 1 <= nprobe <= n_clusters")
    km = kmeans(embeddings, k=n_clusters, rounds=rounds)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    # inverted lists: corpus keyed by its assigned cluster
    inv = emb.join(km.assignments, "vec_id")
    # probe list per query: the nprobe nearest final centroids, ranked
    # by (squared-L2, cluster) — the kmeans assignment order extended
    # past rank 1
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    _dist2(F.col("vec"), c).alias("d"),
                    F.lit(j).cast("long").alias("c"),
                )
                for j, c in enumerate(km.centroids)
            ]
        )
    )
    probes = (
        emb.where(F.col("vec_id") < max_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.explode(F.slice(ranked, 1, nprobe)).alias("pr"),
        )
        .select("query_id", "qvec", F.col("pr")["c"].alias("cluster"))
    )
    # each corpus row lives in exactly one list and each (query,
    # cluster) probe is unique, so candidates need no dedup
    cands = inv.join(F.broadcast(probes), "cluster").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine("qvec", "vec"), 9).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "sim", F.col("rnk").cast("long").alias("rnk")
        )
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    max_queries: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures -> bucket join ->
    exact re-rank within candidates. At 100 TB the bucket join replaces
    the brute-force crossJoin: cost ~ Σ bucket² instead of n·q."""
    spark = embeddings.sparkSession
    first = embeddings.select("embedding").first()
    if first is None:  # empty corpus -> empty result, same schema
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rnk long"
        )
    dim = len(first[0])
    planes = _hyperplanes(dim, n_planes, n_tables, seed)

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    signed = _signed(emb, planes).persist()
    try:
        queries = signed.where(F.col("vec_id") < max_queries)
        cands = None
        for t in range(n_tables):
            q = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("vec").alias("qvec"),
                F.col(f"sig{t}").alias("sig"),
            )
            c = (
                signed.select("vec_id", "vec", F.col(f"sig{t}").alias("sig"))
                .join(F.broadcast(q), "sig")
                .where(F.col("vec_id") != F.col("query_id"))
                .select("query_id", "qvec", "vec_id", "vec")
            )
            cands = c if cands is None else cands.union(c)
        cands = cands.dropDuplicates(["query_id", "vec_id"])
        scored = cands.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine("qvec", "vec"), 9).alias("sim"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        out = (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "sim", F.col("rnk").cast("long").alias("rnk"))
        )
        out = out.localCheckpoint(eager=True)
    finally:
        signed.unpersist()
    return out
