"""Checkpoint/resume: a killed-and-resumed run must equal an
uninterrupted run exactly (SURVEY §2.6 row 4)."""

from __future__ import annotations

import pandas as pd
import pytest

from linkgraph.build import build_graph_from_edges
from linkgraph.checkpoint import CheckpointManager
from linkgraph.datagen import rmat_edges
from linkgraph.kernels import connected_components, pagerank


@pytest.fixture(scope="module")
def small_graph(spark):
    g = build_graph_from_edges(
        spark.createDataFrame(rmat_edges(scale=5, edge_factor=4), "src long, dst long"),
        n=32,
        num_partitions=4,
    )
    yield g
    g.unpersist()


def _ranks(df) -> dict[int, float]:
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_resume_equals_uninterrupted(small_graph, tmp_path):
    full = pagerank(small_graph, tol=1e-8, max_iter=50)
    assert full.converged

    ckpt = CheckpointManager(str(tmp_path), "pr")
    interrupted = pagerank(small_graph, tol=1e-8, max_iter=7, ckpt=ckpt, ckpt_every=1)
    assert not interrupted.converged
    assert ckpt.last_complete() == 6

    resumed = pagerank(small_graph, tol=1e-8, max_iter=50, ckpt=ckpt, ckpt_every=1)
    assert resumed.converged
    # parquet round-trips doubles exactly -> bit-identical continuation
    assert _ranks(resumed.df) == _ranks(full.df)
    assert resumed.iterations == full.iterations


def test_cc_resume_equals_uninterrupted(small_graph, tmp_path):
    full = connected_components(small_graph)

    ckpt = CheckpointManager(str(tmp_path), "cc")
    connected_components(small_graph, max_iter=2, ckpt=ckpt)
    resumed = connected_components(small_graph, ckpt=ckpt)
    got_full = {r["id"]: r["comp"] for r in full.df.collect()}
    got_res = {r["id"]: r["comp"] for r in resumed.df.collect()}
    assert got_full == got_res


def test_cc_resume_from_pre_bitmap_checkpoint(small_graph, tmp_path):
    """An r2-era checkpoint (state without the `changed` bitmap
    column) must still resume to the correct fixpoint — the kernel
    falls back to a full frontier, which is safe for hash-min."""
    from pyspark.sql import functions as F

    full = connected_components(small_graph)

    ckpt = CheckpointManager(str(tmp_path), "cc_old")
    # simulate the old layout: run one checkpointed round, then strip
    # the bitmap column from the saved state
    connected_components(small_graph, max_iter=1, ckpt=ckpt)
    spark = small_graph.edges.sparkSession
    loaded, _, rec = ckpt.load(spark, 0)
    old_style = loaded.select("id", "comp").localCheckpoint(eager=True)
    ckpt.save(0, old_style, metrics={k: v for k, v in rec.items()
                                     if k not in ("partition_rows",)})

    resumed = connected_components(small_graph, ckpt=ckpt)
    got_full = {r["id"]: r["comp"] for r in full.df.collect()}
    got_res = {r["id"]: r["comp"] for r in resumed.df.collect()}
    assert got_full == got_res


def test_metrics_recorded(small_graph, tmp_path):
    ckpt = CheckpointManager(str(tmp_path), "prm")
    ckpt.lineage = {"input": "rmat(scale=5)", "n": small_graph.n, "m": small_graph.m}
    res = pagerank(small_graph, tol=1e-8, max_iter=5, ckpt=ckpt, ckpt_every=1)
    assert len(res.metrics) == 5
    for rec in res.metrics:
        assert {"iteration", "diff", "dangling_mass", "edges_processed", "wall_s"} <= set(rec)
    assert ckpt.last_complete() == 4
    # per-partition row counts + input lineage ride in the sidecar
    _, _, saved = ckpt.load(small_graph.edges.sparkSession, 4)
    assert sum(saved["partition_rows"].values()) == small_graph.n
    assert saved["lineage"]["m"] == small_graph.m


def test_labelprop_resume_equals_uninterrupted(small_graph, tmp_path):
    from linkgraph.kernels import label_propagation

    full = label_propagation(small_graph, max_iter=10)

    ckpt = CheckpointManager(str(tmp_path), "lp")
    label_propagation(small_graph, max_iter=2, ckpt=ckpt)
    assert ckpt.last_complete() == 1
    resumed = label_propagation(small_graph, max_iter=10, ckpt=ckpt)

    got_full = {r["id"]: r["label"] for r in full.df.collect()}
    got_res = {r["id"]: r["label"] for r in resumed.df.collect()}
    assert got_full == got_res
    assert resumed.iterations == full.iterations


def test_pagerank_delta_resume_equals_uninterrupted(small_graph, tmp_path):
    from linkgraph.kernels import pagerank_delta

    full = pagerank_delta(small_graph, max_iterations=12)

    # quirk 1 empties the frontier after round 0 (n > ~7), so runs
    # settle in 2 rounds; interrupt after round 0 — the one mid-run
    # point — and resume through termination
    ckpt = CheckpointManager(str(tmp_path), "prd")
    pagerank_delta(small_graph, max_iterations=1, ckpt=ckpt)
    assert ckpt.last_complete() == 0
    resumed = pagerank_delta(small_graph, max_iterations=12, ckpt=ckpt)

    assert _ranks(resumed.df) == _ranks(full.df)
    assert resumed.rounds == full.rounds


def test_bfs_delta_compaction_equals_default(small_graph):
    """compact_every=2 forces several delta-union compactions on a
    multi-level run; the reached set must be identical."""
    from linkgraph.kernels import bfs

    def levels(df):
        return {r["id"]: (r["level"], r["parent"]) for r in df.collect()}

    assert levels(bfs(small_graph, root=0, compact_every=2).df) == levels(
        bfs(small_graph, root=0).df
    )


def test_bfs_resume_equals_uninterrupted(small_graph, tmp_path):
    from linkgraph.kernels import bfs

    full = bfs(small_graph, root=0)

    ckpt = CheckpointManager(str(tmp_path), "bfs")
    bfs(small_graph, root=0, max_iter=2, ckpt=ckpt)
    assert ckpt.last_complete() == 2
    # r4 layout: iter=<k>/state holds ONLY the level-k delta (the r3
    # layout rewrote the whole visited set every level)
    spark = small_graph.edges.sparkSession
    delta2, _, rec2 = ckpt.load(spark, 2)
    assert rec2["delta_ckpt"] is True
    assert {r["level"] for r in delta2.collect()} == {2}
    resumed = bfs(small_graph, root=0, ckpt=ckpt)

    def levels(df):
        return {r["id"]: (r["level"], r["parent"]) for r in df.collect()}

    assert levels(resumed.df) == levels(full.df)


def test_bfs_resume_from_legacy_full_checkpoint(small_graph, tmp_path):
    """An r3-era checkpoint — FULL visited set at iter=<k>, no
    `delta_ckpt` flag, and no `frontier_size_next` key — must still
    resume to the same result: the kernel takes the full-state load
    path and RECOUNTS the frontier instead of coercing the missing key
    to 0 (which would silently return a truncated reached set,
    ADVICE r3)."""
    from linkgraph.kernels import bfs

    full = bfs(small_graph, root=0)

    ckpt = CheckpointManager(str(tmp_path), "bfs_new")
    partial = bfs(small_graph, root=0, max_iter=2, ckpt=ckpt)
    full_visited = partial.df.localCheckpoint(eager=True)

    legacy = CheckpointManager(str(tmp_path), "bfs_old")
    legacy.save(2, full_visited, metrics={"iteration": 2})
    resumed = bfs(small_graph, root=0, ckpt=legacy)

    def levels(df):
        return {r["id"]: (r["level"], r["parent"]) for r in df.collect()}

    assert levels(resumed.df) == levels(full.df)


def test_msbfs_resume_equals_uninterrupted(small_graph, tmp_path):
    from linkgraph.kernels import msbfs

    sources = [0, 3]
    full = msbfs(small_graph, sources)

    ckpt = CheckpointManager(str(tmp_path), "msbfs")
    msbfs(small_graph, sources, max_iter=2, ckpt=ckpt)
    assert ckpt.last_complete() == 2
    spark = small_graph.edges.sparkSession
    delta2, _, rec2 = ckpt.load(spark, 2)
    assert rec2["delta_ckpt"] is True
    # per-level delta: only dist-2 rows are in the iter=2 checkpoint
    assert {r["dist"] for r in delta2.collect()} == {2}
    resumed = msbfs(small_graph, sources, ckpt=ckpt)

    def dists(df):
        return {(r["id"], r["source"]): r["dist"] for r in df.collect()}

    assert dists(resumed.df) == dists(full.df)


def test_anf_resume_equals_uninterrupted(small_graph, tmp_path):
    """ANF sketch state resumed from round 2 must finish bit-identical
    to an uninterrupted run, with the nf curve history intact."""
    from linkgraph.kernels import anf

    full = anf(small_graph, max_iter=16)

    ckpt = CheckpointManager(str(tmp_path), "anf")
    anf(small_graph, max_iter=2, ckpt=ckpt)
    assert ckpt.last_complete() == 2
    resumed = anf(small_graph, max_iter=16, ckpt=ckpt)

    cols = [c for c in full.df.columns]
    got_full = {r["id"]: [r[c] for c in cols if c != "id"] for r in full.df.collect()}
    got_res = {r["id"]: [r[c] for c in cols if c != "id"] for r in resumed.df.collect()}
    assert got_full == got_res
    assert resumed.iterations == full.iterations
    # nf is a float Observation sum: partition order changes across the
    # parquet round-trip, so compare to 1e-12 relative (sketches above
    # are bit-exact; only the estimate's summation order moves)
    assert resumed.nf == pytest.approx(full.nf, rel=1e-12)
    # a second resume after convergence is a no-op short-circuit
    again = anf(small_graph, max_iter=16, ckpt=ckpt)
    assert again.iterations == full.iterations
    assert again.nf == pytest.approx(resumed.nf, rel=1e-12)


def test_scc_resume_equals_uninterrupted(spark, tmp_path):
    """SCC checkpoints the ASSIGNED set per outer round; a run killed
    by the max_outer guard resumes (residual re-derived by anti-join)
    and equals the uninterrupted result; a converged checkpoint
    short-circuits the re-run."""
    from linkgraph.kernels import scc

    # descending path into a 2-cycle: needs >= 2 outer peel rounds
    edges = pd.DataFrame(
        {"src": [5, 4, 3, 2, 1, 0, 6], "dst": [4, 3, 2, 1, 0, 6, 0]}
    )
    g = build_graph_from_edges(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )
    full = scc(g)
    want = {r["id"]: r["scc"] for r in full.df.collect()}

    ckpt = CheckpointManager(str(tmp_path), "scc")
    with pytest.raises(RuntimeError, match="outer rounds"):
        scc(g, max_outer=1, ckpt=ckpt)
    resumed = scc(g, ckpt=ckpt)
    got = {r["id"]: r["scc"] for r in resumed.df.collect()}
    assert got == want

    # converged record short-circuits: no further outer rounds run
    again = scc(g, ckpt=ckpt)
    assert {r["id"]: r["scc"] for r in again.df.collect()} == want
    assert again.metrics[-1]["converged"]
    g.unpersist()


def test_matching_resume_equals_uninterrupted(small_graph, tmp_path):
    """Matching delta checkpoints: an interrupted run resumes from the
    per-round matched deltas and lands on the identical matching; a
    fully-converged checkpoint short-circuits without iterating."""
    from linkgraph.kernels import maximal_matching

    full = maximal_matching(small_graph)
    want = {(r["u"], r["v"]) for r in full.df.collect()}
    assert full.iterations >= 2  # the fixture must actually interrupt

    ckpt = CheckpointManager(str(tmp_path), "matching")
    interrupted = maximal_matching(small_graph, max_iter=1, ckpt=ckpt)
    assert not interrupted.metrics[-1]["converged"]

    resumed = maximal_matching(small_graph, ckpt=ckpt)
    assert {(r["u"], r["v"]) for r in resumed.df.collect()} == want
    assert resumed.iterations == full.iterations

    # converged checkpoint short-circuits
    again = maximal_matching(small_graph, ckpt=ckpt)
    assert {(r["u"], r["v"]) for r in again.df.collect()} == want
    assert again.metrics[-1]["converged"]


def test_coreness_resume_equals_uninterrupted(small_graph, tmp_path):
    """Coreness peeled-delta checkpoints: resume restores the level
    from the record, re-derives the residual graph from the union of
    peeled deltas, and finishes identically; a converged record
    short-circuits."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import coreness

    sym = symmetrize(small_graph.edges)
    g = build_graph_from_edges(sym, num_partitions=4)
    full = coreness(g)
    want = {(r["id"], r["core"]) for r in full.df.collect()}
    assert full.iterations >= 2

    ckpt = CheckpointManager(str(tmp_path), "coreness")
    interrupted = coreness(g, max_iter=1, ckpt=ckpt)
    assert not interrupted.metrics[-1]["converged"]

    resumed = coreness(g, ckpt=ckpt)
    assert {(r["id"], r["core"]) for r in resumed.df.collect()} == want
    assert resumed.iterations == full.iterations
    assert resumed.degeneracy == full.degeneracy

    again = coreness(g, ckpt=ckpt)
    assert {(r["id"], r["core"]) for r in again.df.collect()} == want
    assert again.metrics[-1]["converged"]
    g.unpersist()


def test_kcore_resume_equals_uninterrupted(small_graph, tmp_path):
    """KCore removed-delta checkpoints: resume re-derives the surviving
    edges from the union of removed sets and finishes identically; a
    converged record skips the loop."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import kcore

    sym = symmetrize(small_graph.edges)
    g = build_graph_from_edges(sym, num_partitions=4)
    k = 4
    full = kcore(g, k=k)
    want = {(r["id"], r["deg"]) for r in full.df.collect()}
    assert full.iterations >= 2

    ckpt = CheckpointManager(str(tmp_path), "kcore")
    kcore(g, k=k, max_iter=1, ckpt=ckpt)
    resumed = kcore(g, k=k, ckpt=ckpt)
    assert {(r["id"], r["deg"]) for r in resumed.df.collect()} == want
    assert resumed.iterations == full.iterations

    again = kcore(g, k=k, ckpt=ckpt)
    assert {(r["id"], r["deg"]) for r in again.df.collect()} == want
    g.unpersist()


def test_katz_resume_equals_uninterrupted(small_graph, tmp_path):
    """Katz state checkpoints: parquet round-trips doubles exactly, so
    a resumed run continues bit-identically; a converged record
    short-circuits."""
    from linkgraph.kernels import katz

    full = katz(small_graph, alpha=0.05, tol=1e-8, max_iter=60)
    assert full.converged
    want = {(r["id"], r["katz"]) for r in full.df.collect()}

    ckpt = CheckpointManager(str(tmp_path), "katz")
    interrupted = katz(
        small_graph, alpha=0.05, tol=1e-8, max_iter=4, ckpt=ckpt, ckpt_every=2
    )
    assert not interrupted.converged
    assert ckpt.last_complete() == 3

    resumed = katz(small_graph, alpha=0.05, tol=1e-8, max_iter=60, ckpt=ckpt,
                   ckpt_every=2)
    assert resumed.converged
    assert {(r["id"], r["katz"]) for r in resumed.df.collect()} == want
    assert resumed.iterations == full.iterations

    again = katz(small_graph, alpha=0.05, tol=1e-8, max_iter=60, ckpt=ckpt)
    assert {(r["id"], r["katz"]) for r in again.df.collect()} == want


def test_eigen_resume_equals_uninterrupted(small_graph, tmp_path):
    """Eigenvector-centrality checkpoints: parquet round-trips doubles
    exactly, so a resumed run continues bit-identically; a converged
    record short-circuits."""
    from linkgraph.kernels import eigenvector_centrality

    full = eigenvector_centrality(small_graph, tol=1e-8, max_iter=80)
    want = {(r["id"], r["score"]) for r in full.df.collect()}

    ckpt = CheckpointManager(str(tmp_path), "eigen")
    interrupted = eigenvector_centrality(
        small_graph, tol=1e-8, max_iter=4, ckpt=ckpt, ckpt_every=2
    )
    assert not interrupted.converged
    assert ckpt.last_complete() == 3

    resumed = eigenvector_centrality(
        small_graph, tol=1e-8, max_iter=80, ckpt=ckpt, ckpt_every=2
    )
    assert {(r["id"], r["score"]) for r in resumed.df.collect()} == want
    assert resumed.iterations == full.iterations

    again = eigenvector_centrality(small_graph, tol=1e-8, max_iter=80, ckpt=ckpt)
    assert {(r["id"], r["score"]) for r in again.df.collect()} == want


def test_ppr_sweep_resume_equals_uninterrupted(small_graph, tmp_path):
    """The sweep's only iterative state is the inner PPR: an
    interrupted run resumes through the shared CheckpointManager and
    the recomputed sweep (membership, best_k, phi) is identical; a
    converged record short-circuits the PPR entirely."""
    from linkgraph.kernels import ppr_sweep

    seeds = [0, 1]
    full = ppr_sweep(small_graph, seeds, tol=1e-8, max_iter=60)
    want = {
        (r["id"], r["sweep_pos"], r["best_k"]) for r in full.df.collect()
    }

    ckpt = CheckpointManager(str(tmp_path), "sweep")
    interrupted = ppr_sweep(
        small_graph, seeds, tol=1e-8, max_iter=4, ckpt=ckpt, ckpt_every=2
    )
    assert ckpt.last_complete() == 3
    del interrupted

    resumed = ppr_sweep(
        small_graph, seeds, tol=1e-8, max_iter=60, ckpt=ckpt, ckpt_every=2
    )
    assert resumed.best_k == full.best_k
    assert resumed.phi == pytest.approx(full.phi, abs=1e-12)
    assert {
        (r["id"], r["sweep_pos"], r["best_k"]) for r in resumed.df.collect()
    } == want

    # converged record -> the ppr loop is skipped, sweep still exact
    again = ppr_sweep(
        small_graph, seeds, tol=1e-8, max_iter=60, ckpt=ckpt, ckpt_every=2
    )
    assert {
        (r["id"], r["sweep_pos"], r["best_k"]) for r in again.df.collect()
    } == want
