"""linkgraph — a PySpark-native link-graph analytics engine.

From-scratch reimplementation of the capabilities of the Rust
reference `knutwalker/ligrust` (Ligra's frontier-based vertex-subset /
edge-map model, /root/reference/src/ligra.rs) as idiomatic Spark
DataFrame programs: iterative join + aggregate rounds with explicit
partitioning, broadcast-vs-shuffle frontier dispatch, skew salting,
and per-iteration checkpointing.

Public surface:
    linkgraph.session     SparkSession factory tuned for the engine
    linkgraph.datagen     deterministic Common-Crawl-style pages synthesizer
    linkgraph.extract     vectorized Arrow UDF: html -> (text, hrefs)
    linkgraph.build       url -> dense int64 ids, edge/degree tables
    linkgraph.frontier    edge_map / node_filter primitives (Ligra trio)
    linkgraph.checkpoint  per-iteration checkpoint/resume + metrics
    linkgraph.kernels     pagerank, pagerank_delta, cc, bfs, labelprop,
                          triangles
    linkgraph.pipeline    training-data ops: dedup, similarity search,
                          text stats, multimodal plumbing
"""

__version__ = "0.1.0"
