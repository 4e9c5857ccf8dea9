"""spark-submit entry: pages parquet -> extract -> build -> kernel.

Usage:
  spark-submit --py-files dist/linkgraph.zip jobs/run_pagerank.py \\
      --pages /path/to/pages_parquet --kernel pagerank \\
      [--ckpt /path/ckpt] [--output /path/out] [--top 20]

  # or generate a deterministic synthetic corpus in-process:
  spark-submit ... jobs/run_pagerank.py --synth 5000 --kernel cc

The packaged-for-spark-submit requirement is BASELINE.json:6; this is
the Spark analogue of the reference CLI (/root/reference/src/cli.rs).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description="linkgraph kernel runner")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet dir with pages(url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, help="generate N synthetic pages instead")
    src.add_argument("--edges", help="parquet dir or table:<id> with edges(src long, dst long)")
    ap.add_argument(
        "--kernel",
        default="pagerank",
        choices=[
            "pagerank", "pagerank_delta", "cc", "bfs", "labelprop",
            "triangles", "msbfs", "harmonic", "radii", "kcore", "bc", "sssp",
            "mis", "coloring", "anf", "hits", "katz", "eigen", "salsa", "ppr", "scc", "bowtie",
            "clustering", "linkpred", "densest", "stats", "truss", "ego",
            "modularity", "conductance", "walks", "sample", "negsample", "condense",
            "matching", "msf", "jaccard", "butterflies", "pagerank_w", "coreness",
            "degrees", "alpha", "knn", "spam", "sweep", "closeness",
            "redirects", "diameter", "node2vec", "richclub", "assort", "rwsample",
            "kclique", "trussness", "landmarks", "louvain",
        ],
    )
    ap.add_argument("--ckpt", help="checkpoint root for resumable runs")
    ap.add_argument("--output", help="write result here (parquet dir or table:<id>)")
    ap.add_argument("--top", type=int, default=20, help="rows to print")
    ap.add_argument("--root", type=int, default=0, help="bfs root / ego seed")
    ap.add_argument("--radius", type=int, default=2, help="ego-net radius")
    ap.add_argument("--walk-length", type=int, default=10, help="walks: steps per walk")
    ap.add_argument("--walks-per-vertex", type=int, default=1, help="walks: lanes per start")
    ap.add_argument("--seed", type=int, default=0, help="walks/sample: corpus seed")
    ap.add_argument(
        "--fanouts", default="10,5",
        help="sample: comma-separated per-layer fanouts (seeds via --sources)",
    )
    ap.add_argument(
        "--sources",
        help="comma-separated source ids for msbfs/harmonic "
        "(default: the 4 smallest vertex ids)",
    )
    ap.add_argument(
        "--k", type=int, default=3, help="k for kcore/truss/negsample"
    )
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from linkgraph import kernels
    from linkgraph.build import build_graph_from_edges, build_graph_from_pages
    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.session import get_spark

    spark = get_spark(app_name=f"linkgraph-{args.kernel}")
    t0 = time.time()
    if args.synth:
        from linkgraph.datagen import PagesSpec, generate_pages

        pages = spark.createDataFrame(generate_pages(PagesSpec(n_pages=args.synth)))
        graph = build_graph_from_pages(pages)
    elif args.pages:
        from linkgraph.io import read_pages

        graph = build_graph_from_pages(read_pages(spark, args.pages))
    else:
        from linkgraph.io import read_pages

        graph = build_graph_from_edges(read_pages(spark, args.edges))
    build_s = time.time() - t0
    print(f"graph built: n={graph.n} m={graph.m} ({build_s:.2f}s)")

    ckpt = CheckpointManager(args.ckpt, args.kernel) if args.ckpt else None
    if ckpt is not None:
        ckpt.lineage = {
            "input": args.pages or args.edges or f"synth:{args.synth}",
            "n": graph.n,
            "m": graph.m,
        }
    t1 = time.time()
    if args.kernel == "pagerank":
        res = kernels.pagerank(graph, tol=args.tol, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("rank"))
        summary = {
            "kernel": "pagerank",
            "iterations": res.iterations,
            "converged": res.converged,
            "edges_processed": res.edges_processed,
            "edges_per_second": round(res.edges_per_second),
        }
    elif args.kernel == "pagerank_delta":
        res = kernels.pagerank_delta(graph, max_iterations=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("rank"))
        summary = {"kernel": "pagerank_delta", "rounds": res.rounds}
    elif args.kernel == "cc":
        res = kernels.connected_components(graph, ckpt=ckpt)
        out = res.df.groupBy("comp").agg(F.count("*").alias("size")).orderBy(F.desc("size"))
        summary = {"kernel": "cc", "iterations": res.iterations}
    elif args.kernel == "bfs":
        res = kernels.bfs(graph, root=args.root, ckpt=ckpt)
        out = res.df.orderBy("level", "id")
        summary = {"kernel": "bfs", "levels": res.iterations}
    elif args.kernel in ("msbfs", "harmonic", "radii", "bc", "closeness"):
        if args.sources:
            sources = [int(s) for s in args.sources.split(",")]
        else:
            sources = [
                int(r["id"]) for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        if args.kernel == "msbfs":
            res = kernels.msbfs(graph, sources, max_iter=args.max_iter, ckpt=ckpt)
            out = res.df.orderBy("source", "dist", "id")
            summary = {"kernel": "msbfs", "lanes": len(sources), "levels": res.iterations}
        elif args.kernel == "radii":
            out = kernels.radii(
                graph, sources, max_iter=args.max_iter, ckpt=ckpt
            ).orderBy(F.desc("ecc"), "source")
            summary = {"kernel": "radii", "lanes": len(sources)}
        elif args.kernel == "bc":
            res = kernels.betweenness(graph, sources, max_iter=args.max_iter)
            out = res.df.orderBy(F.desc("bc"), "id")
            summary = {"kernel": "bc", "lanes": len(sources), "levels": res.iterations}
        elif args.kernel == "closeness":
            out = kernels.closeness_centrality(
                graph, sources, max_iter=args.max_iter, ckpt=ckpt
            ).orderBy(F.desc("closeness"), "id")
            summary = {"kernel": "closeness", "lanes": len(sources)}
        else:
            out = kernels.harmonic_centrality(
                graph, sources, max_iter=args.max_iter, ckpt=ckpt
            ).orderBy(F.desc("harmonic"), "id")
            summary = {"kernel": "harmonic", "lanes": len(sources)}
    elif args.kernel == "sssp":
        # no weight column in the pages/edges inputs -> unit weights
        # (hop-count distances); library callers pass a weights DF
        res = kernels.sssp(graph, root=args.root, max_iter=args.max_iter)
        out = res.df.orderBy("dist", "id")
        summary = {"kernel": "sssp", "rounds": res.iterations}
    elif args.kernel == "mis":
        res = kernels.mis(graph, max_iter=args.max_iter)
        out = res.df.orderBy("id")
        summary = {
            "kernel": "mis",
            "rounds": res.iterations,
            "set_size": out.count(),
        }
    elif args.kernel == "matching":
        res = kernels.maximal_matching(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy("u", "v")
        summary = {
            "kernel": "matching",
            "rounds": res.iterations,
            "matched_edges": out.count(),
        }
    elif args.kernel == "msf":
        res = kernels.minimum_spanning_forest(graph, max_iter=args.max_iter)
        out = res.df.orderBy("u", "v")
        summary = {
            "kernel": "msf",
            "rounds": res.iterations,
            "forest_edges": out.count(),
            "total_weight": res.total_weight,
        }
    elif args.kernel == "pagerank_w":
        # weight = row multiplicity of the raw edge input (multi-edges
        # carry rank proportionally); needs --edges, where duplicates
        # are visible pre-dedup
        if not args.edges:
            raise SystemExit("--kernel pagerank_w needs --edges input "
                             "(weight = duplicate-row multiplicity)")
        from linkgraph.io import read_pages as _rp

        wdf = (
            _rp(spark, args.edges)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        res = kernels.pagerank_weighted(
            graph, wdf, tol=args.tol, max_iter=args.max_iter
        )
        out = res.df.orderBy(F.desc("rank"))
        summary = {
            "kernel": "pagerank_w",
            "iterations": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "jaccard":
        res = kernels.edge_jaccard(graph)
        out = res.df.orderBy(F.desc("jaccard"), "u", "v")
        summary = {"kernel": "jaccard", "edges": out.count()}
    elif args.kernel == "butterflies":
        # bipartite motif count over the raw (src, dst) edge table —
        # src/dst id spaces are the two sides (the package's offset-id
        # convention); does not symmetrize
        res = kernels.butterfly_count(graph.edges)
        out = res.df
        summary = {
            "kernel": "butterflies",
            "center": res.center,
            "counts": {k: v for k, v in out.first().asDict().items()},
        }
    elif args.kernel == "anf":
        from linkgraph.kernels.anf import effective_diameter

        res = kernels.anf(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy("id")
        summary = {
            "kernel": "anf",
            "rounds": res.iterations,
            "nf": [round(x, 1) for x in res.nf],
            "effective_diameter_90": effective_diameter(res),
        }
    elif args.kernel == "ppr":
        if args.sources:
            sources = [int(s) for s in args.sources.split(",")]
        else:
            sources = [
                int(r["id"]) for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        res = kernels.ppr(graph, sources, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("rank"), "id")
        summary = {
            "kernel": "ppr",
            "seeds": len(sources),
            "rounds": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "sweep":
        if args.sources:
            sources = [int(s) for s in args.sources.split(",")]
        else:
            sources = [
                int(r["id"]) for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        res = kernels.ppr_sweep(graph, sources, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy("sweep_pos")
        summary = {
            "kernel": "sweep",
            "seeds": len(sources),
            "ppr_rounds": res.ppr_iterations,
            "best_k": res.best_k,
            "phi": res.phi,
        }
    elif args.kernel == "spam":
        if args.sources:
            trusted = [int(s) for s in args.sources.split(",")]
        else:
            trusted = [
                int(r["id"]) for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        res = kernels.spam_mass(graph, trusted, max_iter=args.max_iter)
        out = res.df.orderBy(F.desc("rel_mass"), F.desc("rank"), "id")
        summary = {
            "kernel": "spam",
            "trusted": len(trusted),
            "pagerank_rounds": res.pagerank_iterations,
            "trust_rounds": res.trust_iterations,
            "converged": res.converged,
        }
    elif args.kernel == "hits":
        res = kernels.hits(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("auth"), "id")
        summary = {
            "kernel": "hits",
            "rounds": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "katz":
        res = kernels.katz(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("katz"), "id")
        summary = {
            "kernel": "katz",
            "rounds": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "eigen":
        res = kernels.eigenvector_centrality(
            graph, max_iter=args.max_iter, ckpt=ckpt
        )
        out = res.df.orderBy(F.desc("score"), "id")
        summary = {
            "kernel": "eigen",
            "rounds": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "node2vec":
        res = kernels.node2vec_walks(
            graph,
            length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed,
        )
        out = res.df.orderBy("start", "walk", "step")
        summary = {
            "kernel": "node2vec",
            "steps": res.steps,
            "corpus_rows": out.count(),
        }
    elif args.kernel == "walks":
        res = kernels.random_walks(
            graph,
            length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed,
        )
        out = res.df.orderBy("start", "walk", "step")
        summary = {
            "kernel": "walks",
            "steps": res.steps,
            "corpus_rows": out.count(),
        }
    elif args.kernel == "sample":
        if args.sources:
            seeds = [int(s) for s in args.sources.split(",")]
        else:
            seeds = [
                int(r["id"]) for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        fanouts = [int(f) for f in args.fanouts.split(",")]
        res = kernels.neighbor_sample(graph, seeds, fanouts, seed=args.seed)
        out = res.df.orderBy("layer", "src", "dst")
        summary = {
            "kernel": "sample",
            "layers": res.layers,
            "sampled_edges": out.count(),
        }
    elif args.kernel == "negsample":
        res = kernels.negative_sample(graph, k=args.k, seed=args.seed)
        out = res.df.orderBy("src", "slot")
        summary = {
            "kernel": "negsample",
            "k": res.k,
            "pairs": res.metrics["pairs"],
        }
    elif args.kernel == "condense":
        res = kernels.condensation(graph)
        out = res.df.orderBy(F.desc("level"), F.desc("size"), "scc")
        summary = {
            "kernel": "condense",
            "components": out.count(),
            "dag_depth": res.depth,
            "rounds": res.rounds,
        }
    elif args.kernel == "louvain":
        res = kernels.louvain(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy("id")
        qrow = kernels.modularity(
            graph, res.df.select("id", F.col("comm").alias("label"))
        ).first()
        summary = {
            "kernel": "louvain",
            "levels": res.levels,
            "rounds": res.iterations,
            "level_metrics": res.metrics,
            "communities": qrow["communities"],
            "q": qrow["q"],
        }
    elif args.kernel == "modularity":
        lp = kernels.label_propagation(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = kernels.modularity(graph, lp.df.select("id", "label"))
        summary = {
            "kernel": "modularity",
            "lp_rounds": lp.iterations,
            "q": out.first()["q"],
        }
    elif args.kernel == "conductance":
        lp = kernels.label_propagation(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = kernels.conductance(graph, lp.df.select("id", "label")).orderBy(
            F.desc("vol"), "label"
        )
        summary = {"kernel": "conductance", "lp_rounds": lp.iterations}
    elif args.kernel == "salsa":
        res = kernels.salsa(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("auth"), "id")
        summary = {
            "kernel": "salsa",
            "rounds": res.iterations,
            "converged": res.converged,
        }
    elif args.kernel == "scc":
        res = kernels.scc(graph, ckpt=ckpt)
        out = (
            res.df.groupBy("scc")
            .agg(F.count("*").alias("size"))
            .orderBy(F.desc("size"), "scc")
        )
        summary = {
            "kernel": "scc",
            "outer_rounds": res.outer_rounds,
            "n_scc": out.count(),
        }
    elif args.kernel == "bowtie":
        res = kernels.bowtie(graph)
        out = (
            res.df.groupBy("cls")
            .agg(F.count("*").alias("size"))
            .orderBy(F.desc("size"), "cls")
        )
        summary = {
            "kernel": "bowtie",
            "core_label": res.core_label,
            "core_size": res.core_size,
        }
    elif args.kernel == "clustering":
        res = kernels.local_clustering(graph)
        out = res.df.orderBy(F.desc("coeff"), "id")
        summary = {
            "kernel": "clustering",
            "triangles": res.triangles,
            "avg_coeff": round(res.avg_coeff, 6),
            "global_coeff": round(res.global_coeff, 6),
        }
    elif args.kernel == "linkpred":
        res = kernels.link_prediction(graph, max_center_deg=10_000)
        out = res.df.orderBy(F.desc("aa"), "u", "w")
        summary = {"kernel": "linkpred", "pairs": out.count()}
    elif args.kernel == "densest":
        res = kernels.densest_subgraph(graph)
        out = res.members().orderBy("id")
        summary = {
            "kernel": "densest",
            "best_round": res.best_round,
            "best_density": round(res.best_density, 6),
            "iterations": res.iterations,
            "core_size": out.count(),
        }
    elif args.kernel == "stats":
        res = kernels.graph_stats(graph)
        out = res.df
        summary = {"kernel": "stats"}
    elif args.kernel == "trussness":
        res = kernels.trussness(graph, ckpt=ckpt)
        out = res.df.orderBy("u", "w")
        summary = {
            "kernel": "trussness",
            "rounds": res.iterations,
            "max_truss": res.max_truss,
            "edges": out.count(),
            "wall_s": round(res.wall_seconds, 3),
        }
    elif args.kernel == "landmarks":
        if args.sources:
            lms = [int(s) for s in args.sources.split(",")]
        else:
            lms = [
                int(r["id"])
                for r in graph.vertices.orderBy("id").limit(4).collect()
            ]
        idx = kernels.landmark_distances(graph, lms)
        srcs = graph.vertices.where(F.col("id") % 97 == 0).select(
            F.col("id").alias("src")
        )
        dsts = graph.vertices.where(F.col("id") % 101 == 0).select(
            F.col("id").alias("dst")
        )
        out = kernels.estimate_distances(idx, srcs.crossJoin(dsts)).orderBy(
            "src", "dst"
        )
        summary = {
            "kernel": "landmarks",
            "landmarks": lms,
            "pairs_bounded": out.count(),
        }
    elif args.kernel == "degrees":
        out = kernels.degree_distribution(graph).orderBy("direction", "bin")
        summary = {"kernel": "degrees"}
    elif args.kernel == "alpha":
        out = kernels.power_law_alpha(graph, dmin=max(args.k, 1))
        summary = {"kernel": "alpha", "dmin": max(args.k, 1)}
    elif args.kernel == "knn":
        out = kernels.knn_curve(graph).orderBy("deg")
        summary = {"kernel": "knn", "degree_classes": out.count()}
    elif args.kernel == "diameter":
        res = kernels.pseudo_diameter(graph, sweeps=2)
        out = res.df
        summary = {
            "kernel": "diameter",
            "pseudo_diameter": res.pseudo_diameter,
            "sweeps": res.sweeps,
            "wall_s": round(res.wall_seconds, 3),
        }
    elif args.kernel == "rwsample":
        seeds = graph.vertices.where(F.col("id") % 101 == 0).select("id")
        sv, se = kernels.rw_sample(
            graph, seeds, length=args.walk_length,
            walks_per_seed=args.walks_per_vertex, seed=args.seed,
        )
        out = se.orderBy("src", "dst")
        summary = {
            "kernel": "rwsample",
            "sample_vertices": sv.count(),
            "sample_edges": out.count(),
        }
    elif args.kernel == "assort":
        # demo labels: id % k (pass a labels parquet via --edges-side
        # composition in real use; the kernel takes any (id, label))
        k = max(2, args.k or 10)
        labels = graph.vertices.select(
            "id", (F.col("id") % k).alias("label")
        )
        out = kernels.attribute_assortativity(graph, labels)
        summary = {"kernel": "assort", "labels": k}
    elif args.kernel == "kclique":
        res = kernels.kclique_count(graph, k=max(3, args.k))
        out = spark.createDataFrame(
            [(max(3, args.k), res.count)], "k long, n_cliques long"
        )
        summary = {"kernel": "kclique", "k": max(3, args.k),
                   "count": res.count, "wall_s": round(res.wall_seconds, 3)}
    elif args.kernel == "richclub":
        out = kernels.rich_club(graph).orderBy("k")
        summary = {"kernel": "richclub", "degree_classes": out.count()}
    elif args.kernel == "redirects":
        # CLI convenience: reduce the edge input to a functional map
        # (min dst per src) — reported so the reduction is visible
        n_edges = graph.edges.count()
        rmap = graph.edges.groupBy("src").agg(F.min("dst").alias("dst"))
        out = kernels.resolve_redirects(rmap).orderBy("src")
        summary = {
            "kernel": "redirects",
            "n_edges": n_edges,
            "n_src": rmap.count(),
            "cycles": out.where("is_cycle").count(),
        }
    elif args.kernel == "truss":
        res = kernels.ktruss(graph, k=args.k)
        out = res.df.orderBy(F.desc("support"), "u", "w")
        summary = {
            "kernel": "truss",
            "k": args.k,
            "edges": out.count(),
            "iterations": res.iterations,
        }
    elif args.kernel == "ego":
        res = kernels.ego_net(graph, [args.root], radius=args.radius)
        out = res.vertices.orderBy("dist", "id")
        summary = {
            "kernel": "ego",
            "seed": args.root,
            "radius": args.radius,
            "ball": out.count(),
            "induced_edges": res.edges.count(),
        }
    elif args.kernel == "coloring":
        res = kernels.coloring(graph, max_iter=args.max_iter)
        out = res.df.orderBy("color", "id")
        summary = {
            "kernel": "coloring",
            "rounds": res.iterations,
            "colors_used": res.colors_used,
        }
    elif args.kernel == "kcore":
        res = kernels.kcore(graph, k=args.k, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("deg"), "id")
        summary = {
            "kernel": "kcore",
            "k": args.k,
            "rounds": res.iterations,
            "core_size": out.count(),
        }
    elif args.kernel == "coreness":
        res = kernels.coreness(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.orderBy(F.desc("core"), "id")
        summary = {
            "kernel": "coreness",
            "rounds": res.iterations,
            "degeneracy": res.degeneracy,
        }
    elif args.kernel == "labelprop":
        res = kernels.label_propagation(graph, max_iter=args.max_iter, ckpt=ckpt)
        out = res.df.groupBy("label").agg(F.count("*").alias("size")).orderBy(F.desc("size"))
        summary = {"kernel": "labelprop", "iterations": res.iterations}
    else:
        tri = kernels.triangle_count(graph)
        print(json.dumps({"kernel": "triangles", "count": tri.count, "wall_s": round(tri.wall_seconds, 3)}))
        return 0
    summary["wall_s"] = round(time.time() - t1, 3)
    print(json.dumps(summary))
    out.show(args.top, truncate=False)
    if args.output:
        from linkgraph.io import write_table

        write_table(out, args.output)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
