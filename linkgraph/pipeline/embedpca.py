"""PCA over the embeddings table — the whitening / variance-analysis
primitive in front of clustering and ANN (SemDeDup's own pipeline
PCA-reduces before k-means).

Split the way the math splits at 100 TB:

* `embedding_covariance` — the DISTRIBUTED pass: second-moment sums
  over int64-QUANTIZED coordinates (pipeline/embedprop.py's
  floor(x·QUANT) idiom — floor is rounding-mode-free, so the sums are
  exact and order-independent → the DuckDB oracle reproduces them
  bit-for-bit). One mapInPandas partial Gram per partition (dim²
  rows each) + one hash groupBy onto dim² keys — shuffle volume is
  P·dim², independent of corpus size. Overflow is bounded up front:
  each partition asserts n_p·q_max² < 2^62 (numpy would wrap
  silently), and the final ANSI SUM fails loudly rather than wrap.
* `pca_project` — the DRIVER-SCALE math: centered covariance from
  those sums, numpy eigh, top-k components (sign fixed: the
  largest-|w| coordinate is made positive, so eigenvector sign
  ambiguity cannot flip results between runs), then projection back
  on the executors as one codegen aggregate fold per component.
  numpy eigh has no cross-engine SQL twin, so this half is
  pytest-pinned against a numpy replay (the multimodal precedent).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # int64 units of 1e-6 — n·(q_max)² must stay < 2^62

_COV_SCHEMA = "d1 int, d2 int, n long, s1 long, s2 long, s12 long"


def embedding_covariance(
    emb: DataFrame,
    dim: int,
    quant: int = QUANT,
) -> DataFrame:
    """Exact quantized second-moment sums per dimension pair:
    (d1 ≤ d2, n, s1 = Σ q_{d1}, s2 = Σ q_{d2}, s12 = Σ q_{d1}·q_{d2})
    with q = floor(v·quant) as int64. Self-contained per row — the
    centered covariance is (s12/n − (s1/n)(s2/n))/quant² downstream.
    """
    if dim < 1 or quant < 1:
        raise ValueError("dim and quant must be >= 1")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        count = 0
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if mat.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {mat.shape[1]} != declared {dim}"
                )
            q = np.floor(mat * quant).astype(np.int64)
            qmax = int(np.abs(q).max(initial=0))
            count += len(q)
            if count * qmax * qmax >= 1 << 62:
                raise OverflowError(
                    "quantized Gram partial would overflow int64; "
                    "lower `quant` or repartition finer"
                )
            gram += q.T @ q
            sums += q.sum(axis=0)
        iu = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "d1": iu[0].astype(np.int32),
                "d2": iu[1].astype(np.int32),
                "n": np.full(len(iu[0]), count, dtype=np.int64),
                "s1": sums[iu[0]],
                "s2": sums[iu[1]],
                "s12": gram[iu],
            }
        )

    return (
        emb.select("embedding")
        .mapInPandas(partial, schema=_COV_SCHEMA)
        .groupBy("d1", "d2")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.sum("s12").alias("s12"),
        )
        .select(
            F.col("d1").cast("long").alias("d1"),
            F.col("d2").cast("long").alias("d2"),
            "n", "s1", "s2", "s12",
        )
    )


def covariance_matrix(cov_rows: pd.DataFrame, dim: int, quant: int = QUANT) -> np.ndarray:
    """Driver-side: centered covariance matrix from the exact sums."""
    n = int(cov_rows["n"].iloc[0])
    c = np.zeros((dim, dim))
    for r in cov_rows.itertuples():
        v = (r.s12 / n - (r.s1 / n) * (r.s2 / n)) / (quant * quant)
        c[r.d1, r.d2] = v
        c[r.d2, r.d1] = v
    return c


def pca_project(
    emb: DataFrame,
    dim: int,
    k: int = 8,
    quant: int = QUANT,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Project embeddings onto the top-k principal components of the
    quantized-exact covariance. Returns (projections, components,
    eigenvalues): projections = (vec_id, comp, value) rows; components
    = (k, dim) with the sign convention that each component's
    largest-|w| coordinate is positive (deterministic across runs —
    eigh's sign is otherwise arbitrary); eigenvalues descending.

    The projection itself runs as ONE codegen projection per row
    (aggregate fold over the embedding array with the component and
    mean broadcast as literals — fixed fold order, no Python)."""
    if k < 1 or k > dim:
        raise ValueError("k must be in [1, dim]")
    cov_rows = embedding_covariance(emb, dim, quant).toPandas()
    if cov_rows.empty:
        raise ValueError("no embeddings to project")
    n = int(cov_rows["n"].iloc[0])
    cov = covariance_matrix(cov_rows, dim, quant)
    mean = np.zeros(dim)
    for r in cov_rows[cov_rows["d1"] == cov_rows["d2"]].itertuples():
        mean[r.d1] = r.s1 / n / quant
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()  # (k, dim)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    eigvals = vals[order]
    # fixed-order fold: value_c = Σ_d (x[d] − mean[d]) · w_c[d]
    projs = []
    for c in range(k):
        w = ", ".join(repr(float(x)) for x in comps[c])
        mu = ", ".join(repr(float(x)) for x in mean)
        expr = (
            f"aggregate(zip_with(embedding, array({w}), (x, wc) -> "
            f"(CAST(x AS DOUBLE)) * wc), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) "
            f"- aggregate(zip_with(array({mu}), array({w}), (m, wc) -> m * wc), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        projs.append(
            emb.select(
                "vec_id",
                F.lit(c).cast("long").alias("comp"),
                F.expr(expr).alias("value"),
            )
        )
    out = projs[0]
    for p in projs[1:]:
        out = out.unionByName(p)
    return out, comps, eigvals
