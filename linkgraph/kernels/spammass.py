"""TrustRank + spam mass — link-spam detection for web graphs
(Gyöngyi, Garcia-Molina & Pedersen, "Combating Web Spam with
TrustRank", VLDB'04; Gyöngyi et al., "Link Spam Detection Based on
Mass Estimation", VLDB'06).

TrustRank IS personalized PageRank from a hand-vetted good-seed set
(kernels/ppr.py — trust flows out of the seeds and attenuates), so
this kernel is a composition of the two audited power iterations the
engine already has, plus the VLDB'06 mass estimate:

    p(v)  = PageRank with the uniform 1/n teleport
    t(v)  = PPR with teleport uniform on the |S| trusted seeds
    ghat(v) = t(v) * |S| / n        -- the good-core PageRank estimate:
                                        rescales the seed jump mass
                                        (1/|S| each) to the share the
                                        uniform jump gives the seeds
                                        (|S| * 1/n in total)
    spam_mass(v)     = p(v) - ghat(v)
    rel_spam_mass(v) = spam_mass(v) / p(v)

High relative mass ~ 1 means essentially none of v's rank is
reachable from the trusted core — the VLDB'06 spam signal. rel is
ANSI-safe unguarded: the uniform teleport floors p(v) at
(1-d)/n > 0. Note rel CAN be negative (a page the core endorses
far above its uniform share), which the paper keeps too.

Dangling-mass convention: p redistributes dangling mass uniformly,
t returns it to the seeds (the ppr kernel's RWR convention) — each
vector follows its own teleport distribution, as in the papers.

Spark shape: two independent audited loops (pagerank.py / ppr.py —
one SHUFFLE_HASH scatter + one partial+final SUM per round each,
byte-identical round plans, Observation-borne convergence), then ONE
n-row join and a fixed-order final projection. At 100 TB nothing new
is paid beyond the two power iterations themselves.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.kernels.pagerank import pagerank
from linkgraph.kernels.ppr import ppr


@dataclass
class SpamMassResult:
    df: DataFrame  # (id, rank, trust, spam_mass, rel_mass)
    pagerank_iterations: int
    trust_iterations: int
    converged: bool
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def spam_mass(
    graph: Graph,
    trusted_seeds: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> SpamMassResult:
    """Runs the two power iterations and joins them into the VLDB'06
    mass estimate. `trusted_seeds` is the vetted good core."""
    if not trusted_seeds:
        raise ValueError("spam_mass needs a non-empty trusted seed set")
    t0 = time.time()
    pr = pagerank(graph, damping=damping, tol=tol, max_iter=max_iter)
    tr = ppr(graph, trusted_seeds, damping=damping, tol=tol, max_iter=max_iter)
    scale = float(len(trusted_seeds)) / float(graph.n)
    mass = F.col("rank") - F.col("trust") * F.lit(scale)
    df = (
        pr.df.select("id", "rank")
        .join(tr.df.select("id", F.col("rank").alias("trust")), "id")
        .select(
            "id",
            "rank",
            "trust",
            mass.alias("spam_mass"),
            (mass / F.col("rank")).alias("rel_mass"),
        )
    )
    return SpamMassResult(
        df=df,
        pagerank_iterations=pr.iterations,
        trust_iterations=tr.iterations,
        converged=pr.converged and tr.converged,
        wall_seconds=time.time() - t0,
        metrics=[*pr.metrics, *tr.metrics],
    )
