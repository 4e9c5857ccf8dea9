"""Frontier primitive tests (SURVEY §2.2 D1-D9): edge_map push/pull,
volume statistic, node_map/node_filter, constructors."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.build import build_graph_from_edges
from linkgraph.frontier import (
    edge_map,
    frontier_volume,
    full_frontier,
    node_filter,
    node_map,
    single_frontier,
)


@pytest.fixture(scope="module")
def diamond(spark):
    # 0→1, 0→2, 1→3, 2→3
    g = build_graph_from_edges(
        spark.createDataFrame(
            pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 3, 3]}),
            "src long, dst long",
        ),
        n=4,
        num_partitions=2,
    )
    yield g
    g.unpersist()


def test_frontier_volume(spark, diamond):
    f = spark.createDataFrame([(0,), (1,)], "id long")
    assert frontier_volume(diamond, f) == 3  # out_deg(0)=2, out_deg(1)=1


def test_edge_map_push_with_payload(spark, diamond):
    # frontier {0} carrying value 10 -> both out-neighbors receive it
    f = spark.createDataFrame([(0, 10.0)], "id long, val double")
    out = edge_map(diamond, f, aggs=[F.sum("val").alias("s")])
    assert {(r["dst"], r["s"]) for r in out.collect()} == {(1, 10.0), (2, 10.0)}


def test_edge_map_reverse_pull(spark, diamond):
    # reverse=True walks in-edges: frontier {3} reaches sources 1 and 2
    f = spark.createDataFrame([(3,)], "id long")
    out = edge_map(diamond, f, aggs=[F.count("*").alias("c")], reverse=True)
    assert {r["dst"] for r in out.collect()} == {1, 2}


def test_edge_map_merge_semantics(spark, diamond):
    # both 1 and 2 message 3: min/sum combine (the CAS-replacement, §4.3)
    f = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, val double")
    out = edge_map(
        diamond, f, aggs=[F.min("val").alias("mn"), F.sum("val").alias("sm")]
    ).collect()
    assert [(r["dst"], r["mn"], r["sm"]) for r in out] == [(3, 1.0, 3.0)]


def test_node_map_filter_constructors(spark, diamond):
    state = diamond.degrees.select("id", "out_deg")
    state2 = node_map(state, {"flag": F.col("out_deg") > 0})
    assert state2.where("flag").count() == 3
    assert node_filter(state, F.col("out_deg") == 0).count() == 1
    assert single_frontier(diamond, 2).collect()[0]["id"] == 2
    assert full_frontier(diamond).count() == 4


def test_frontier_volume_reverse_uses_in_deg(spark, diamond):
    # vertex 3: out_deg 0 but in_deg 2 — the pull-direction statistic
    # must size from in-degrees (ligra.rs:80 on the transpose)
    f = spark.createDataFrame([(3,)], "id long")
    assert frontier_volume(diamond, f) == 0
    assert frontier_volume(diamond, f, reverse=True) == 2


def test_edge_map_mode_dispatch_and_info(spark, diamond):
    # m=4 -> threshold max(4//20,1)=1: volume 1 -> sparse, volume 3 -> dense
    small = spark.createDataFrame([(1, 1.0)], "id long, val double")
    info: dict = {}
    edge_map(diamond, small, aggs=[F.sum("val").alias("s")], info=info).collect()
    assert info["mode"] == "sparse-push" and info["volume"] == 1
    big = spark.createDataFrame([(0, 1.0), (1, 1.0)], "id long, val double")
    info = {}
    out = edge_map(diamond, big, aggs=[F.sum("val").alias("s")], info=info)
    assert info["mode"] == "dense-pull" and info["volume"] == 3
    # dense and sparse forms agree on the result
    forced_sparse = edge_map(diamond, big, aggs=[F.sum("val").alias("s")], dense=False)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, forced_sparse.collect()))


def test_edge_map_exclude_dst_cond(spark, diamond):
    # Ligra cond(): visited targets receive no messages (algos.rs:142-144)
    f = spark.createDataFrame([(0, 1.0)], "id long, val double")
    visited = spark.createDataFrame([(1,)], "id long")
    out = edge_map(
        diamond, f, aggs=[F.sum("val").alias("s")], exclude_dst=visited
    ).collect()
    assert {r["dst"] for r in out} == {2}
