"""Property-based tests (hypothesis): random small digraphs, every
kernel equals its driver-side oracle (SURVEY §5 — mirrors the
reference's quickcheck layer at /root/reference/src/ligra.rs:324-341,
lifted from par_vec properties to whole-kernel properties)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph.build import build_graph_from_edges
from linkgraph.kernels import (
    bfs,
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from tests.oracles import (
    bfs_levels_numpy,
    cc_numpy,
    labelprop_numpy,
    pagerank_numpy,
    triangle_count_numpy,
)

N = 12  # vertices per random graph


@st.composite
def digraphs(draw):
    n_edges = draw(st.integers(min_value=1, max_value=30))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=N - 1),
                st.integers(min_value=0, max_value=N - 1),
            ),
            min_size=n_edges,
            max_size=n_edges,
        )
    )
    pairs = sorted({(s, d) for s, d in edges if s != d})
    if not pairs:
        pairs = [(0, 1)]
    return pairs


_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk_graph(spark, pairs):
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    return (
        build_graph_from_edges(
            spark.createDataFrame(pdf, "src long, dst long"), n=N, num_partitions=2
        ),
        pdf["src"].to_numpy(),
        pdf["dst"].to_numpy(),
    )


@given(pairs=digraphs())
@_SETTINGS
def test_cc_property(spark, pairs):
    g, src, dst = _mk_graph(spark, pairs)
    got = connected_components(g).df.toPandas().sort_values("id")["comp"].to_numpy()
    np.testing.assert_array_equal(got, cc_numpy(N, src, dst))
    g.unpersist()


@given(pairs=digraphs())
@_SETTINGS
def test_pagerank_property(spark, pairs):
    g, src, dst = _mk_graph(spark, pairs)
    res = pagerank(g, tol=1e-8, max_iter=30)
    expected, it = pagerank_numpy(N, src, dst, tol=1e-8, max_iter=30)
    got = res.df.toPandas().sort_values("id")["rank"].to_numpy()
    assert res.iterations == it
    np.testing.assert_allclose(got, expected, atol=1e-10)
    g.unpersist()


@given(pairs=digraphs())
@_SETTINGS
def test_triangles_property(spark, pairs):
    g, src, dst = _mk_graph(spark, pairs)
    assert triangle_count(g).count == triangle_count_numpy(N, src, dst)
    g.unpersist()


@given(pairs=digraphs())
@_SETTINGS
def test_labelprop_property(spark, pairs):
    g, src, dst = _mk_graph(spark, pairs)
    got = (
        label_propagation(g, max_iter=4).df.toPandas().sort_values("id")["label"].to_numpy()
    )
    np.testing.assert_array_equal(got, labelprop_numpy(N, src, dst, max_iter=4))
    g.unpersist()


@given(pairs=digraphs())
@_SETTINGS
def test_bfs_property(spark, pairs):
    g, src, dst = _mk_graph(spark, pairs)
    got = {r["id"]: r["level"] for r in bfs(g, root=0).df.collect()}
    assert got == bfs_levels_numpy(N, src, dst, 0)
    g.unpersist()
