"""spark-submit entry: training-data pipeline operators over a
documents / embeddings corpus (SURVEY §2.8).

Usage:
  spark-submit --py-files dist/linkgraph.zip jobs/run_pipeline.py \\
      --docs /path/documents_parquet --op dedup_clusters \\
      [--output /path/out] [--threshold 0.5] [--max-df 1000]

  spark-submit ... jobs/run_pipeline.py \\
      --embeddings /path/embeddings_parquet --op near_dup --threshold 0.9

Ops over --docs:        exact_dedup | minhash | lsh_pairs | simhash |
                        ngram_jaccard | minhash_jaccard | dedup_clusters |
                        token_stats | bpe_stats | lang_id | gopher |
                        fingerprints | sample
                        (--threshold = rate, --seed; deterministic
                        hash membership)
Ops over --embeddings:  ann_topk | ann_lsh | ann_ivf | near_dup |
                        kmeans | semdedup (--threshold = cosine
                        cutoff, --k = n_clusters) | cluster_sample
                        (--k = n_clusters, --per-cluster, --seed) |
                        feature_prop (--edges, --k = rounds)

Writes the result as parquet to --output when given, else prints 20
rows. Packaged-for-spark-submit per BASELINE.json:6.
"""

from __future__ import annotations

import argparse
import sys
import time

def opt(val, default):
    """`x if x is not None else default` (NOT `x or default`): an
    explicit 0 must stay 0, not silently become the default."""
    return val if val is not None else default


DOC_OPS = {
    "exact_dedup", "minhash", "lsh_pairs", "simhash", "simhash_pairs", "ngram_jaccard",
    "dedup_clusters", "token_stats", "lang_id", "gopher", "fingerprints",
    "sample", "minhash_jaccard", "bpe_stats", "decontam", "pii",
    "copy_spans", "pack", "url_canon", "url_filter", "group_cap", "tfidf",
    "fold_split",  # --query: comma-separated name:frac folds
    "vocab", "unigram", "index", "bm25", "pmi", "norm_dedup",
    "covisit",  # --docs: events-shaped parquet (user_id, ts, props)
    "funnel", "retention", "paths",  # --docs: events-shaped parquet
    "weighted_sample",  # --query names the weight column
    "c4", "chunk",  # chunk: --k = window tokens (overlap = k // 4)
    "cms", "hll", "hll_by",  # sketches: --k = CMS width / HLL 2^b buckets exponent
    "bloom",  # --k = m_bits; builds over md5(text), reports FP stats
    "transitions",  # --docs: events-shaped parquet
    "repetition",  # Gopher dup/top n-gram coverage fractions
    "bpe", "bpe_encode",  # --k = number of merges to learn
    "mask",  # --threshold = mask rate
    "skipgram",  # --k = context window
    "zorder",  # --query: comma-separated key columns; --k = bits
}
EMB_OPS = {
    "ann_topk", "ann_lsh", "ann_ivf", "near_dup", "kmeans", "semdedup",
    "cluster_sample", "feature_prop", "covariance", "pca", "pq",
}


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description="linkgraph pipeline runner")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="parquet dir or table:<id> with documents(doc_id, text)")
    src.add_argument("--embeddings", help="parquet dir or table:<id> with embeddings(vec_id, embedding)")
    ap.add_argument("--op", required=True, choices=sorted(DOC_OPS | EMB_OPS))
    ap.add_argument("--output", help="parquet dir or table:<id> output (default: show 20 rows)")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--k", type=int, default=None, help="shingle size / top-k")
    ap.add_argument("--max-df", type=int, default=None, help="stop-shingle cutoff")
    ap.add_argument("--seed", type=int, default=None, help="sample: hash seed")
    ap.add_argument("--query", help="bm25: whitespace-separated query terms")
    ap.add_argument(
        "--per-cluster", type=int, default=None,
        help="cluster_sample: items kept per kmeans cluster",
    )
    ap.add_argument(
        "--edges", default=None,
        help="feature_prop: parquet dir or table:<id> with (src, dst) "
             "hyperlink edges over the embedding ids",
    )
    ap.add_argument(
        "--benchmark", default=None,
        help="decontam: parquet dir or table:<id> with the eval-suite "
             "documents (a `text` column) to screen the corpus against",
    )
    ap.add_argument(
        "--max-bucket", type=int, default=None,
        help="LSH bucket-size cutoff for lsh_pairs (drop template "
             "mega-buckets before the pair join)",
    )
    ap.add_argument(
        "--max-brute-rows", type=int, default=1_000_000,
        help="refuse --op ann_topk above this corpus size (it is the "
             "brute-force cross-join baseline; use --op ann_lsh at scale). "
             "0 disables the guard.",
    )
    args = ap.parse_args(argv)

    from linkgraph.io import read_pages
    from linkgraph.session import get_spark

    spark = get_spark(app_name=f"linkgraph-pipeline-{args.op}")
    if args.op in DOC_OPS and not args.docs:
        ap.error(f"--op {args.op} needs --docs")
    if args.op in EMB_OPS and not args.embeddings:
        ap.error(f"--op {args.op} needs --embeddings")
    source = read_pages(spark, args.docs or args.embeddings)

    import linkgraph.pipeline as P

    t0 = time.time()
    if args.op == "exact_dedup":
        out = P.exact_dup_groups(source)
    elif args.op == "minhash":
        out = P.minhash_signatures(source)
    elif args.op == "lsh_pairs":
        out = P.lsh_candidate_pairs(source, max_bucket=args.max_bucket)
    elif args.op == "minhash_jaccard":
        out = P.minhash_jaccard_pairs(
            source, threshold=opt(args.threshold, 0.0), max_bucket=args.max_bucket
        )
    elif args.op == "simhash_pairs":
        out = P.simhash_near_pairs(
            source, max_hamming=opt(args.k, 3)
        )
    elif args.op == "simhash":
        out = P.simhash(source)
    elif args.op == "ngram_jaccard":
        out = P.ngram_jaccard_pairs(
            source, k=opt(args.k, 3), threshold=opt(args.threshold, 0.5),
            max_df=args.max_df,
        )
    elif args.op == "dedup_clusters":
        out = P.dedup_clusters(
            source, k=opt(args.k, 3), threshold=opt(args.threshold, 0.5),
            max_df=args.max_df,
        )
    elif args.op == "token_stats":
        out = P.token_stats(source)
    elif args.op == "lang_id":
        out = P.lang_id(source)
    elif args.op == "gopher":
        out = P.gopher_quality(source)
    elif args.op == "repetition":
        out = P.repetition_signals(source)
    elif args.op == "skipgram":
        out = P.skipgram_pairs(source, window=opt(args.k, 2))
    elif args.op == "mask":
        out = P.mask_tokens(
            source, rate=opt(args.threshold, 0.15), seed=opt(args.seed, 0)
        )
    elif args.op == "bpe":
        out = P.bpe_learn(source, n_merges=opt(args.k, 32)).merges
    elif args.op == "bpe_encode":
        res = P.bpe_learn(source, n_merges=opt(args.k, 32))
        m = [(r["left"], r["right"])
             for r in res.merges.orderBy("step").collect()]
        out = P.bpe_encode(source, m)
    elif args.op == "c4":
        out = P.c4_quality(source)
    elif args.op == "bloom":
        from pyspark.sql import functions as F

        hashed = source.select("doc_id", F.md5("text").alias("key"))
        m_bits = opt(args.k, 4096)
        bloom = P.bloom_build(hashed, "key", m_bits=m_bits, seed=opt(args.seed, 0))
        out = P.bloom_probe(
            bloom, hashed.select("key"), "key",
            m_bits=m_bits, seed=opt(args.seed, 0),
        )
    elif args.op == "cms":
        out = P.count_min_sketch(
            source, depth=4, width=opt(args.k, 1024), seed=opt(args.seed, 0)
        )
    elif args.op == "hll_by":
        _, col = "lang", "lang"
        from pyspark.sql import functions as F

        w = F.split(F.trim("text"), r"\s+")
        tri = F.expr("transform(sequence(0, size(w) - 3), i ->"
                     " concat(w[i], ' ', w[i+1], ' ', w[i+2]))")
        grouped = (source.select("lang", w.alias("w")).where(F.size("w") >= 3)
                   .select("lang", F.explode(tri).alias("term")))
        out = P.hll_distinct_by(grouped, "lang", b=opt(args.k, 12),
                                seed=opt(args.seed, 0))
    elif args.op == "hll":
        _, out = P.hll_distinct(
            P.word_trigrams(source), b=opt(args.k, 12), seed=opt(args.seed, 0)
        )
    elif args.op == "chunk":
        window = opt(args.k, 128)
        out = P.chunk_documents(source, window=window, overlap=window // 4)
    elif args.op == "bpe_stats":
        out = P.bpe_token_stats(source)
    elif args.op == "tfidf":
        out = P.tfidf_topk(source, k=opt(args.k, 5))
    elif args.op == "vocab":
        out = P.vocab_stats(source, k=opt(args.k, 100))
    elif args.op == "unigram":
        out = P.unigram_logprob(source)
    elif args.op == "index":
        out = P.inverted_index(source, max_df=args.max_df)
    elif args.op == "norm_dedup":
        out = P.normalized_dup_groups(source)
    elif args.op == "covisit":
        from pyspark.sql import functions as F

        ev = source.select(
            "user_id", "ts",
            F.regexp_extract("props", r'"k": ([0-9]+)', 1)
            .cast("long").alias("item"),
        )
        out = P.covisitation(
            ev, gap_minutes=120, min_count=opt(args.k, 2)
        )
    elif args.op == "transitions":
        out = P.event_transitions(source)
    elif args.op == "zorder":
        if not args.query:
            raise SystemExit("--op zorder requires --query <col,col[,col]>")
        out = P.zorder_key(source, args.query.split(","), bits=opt(args.k, 16))
    elif args.op == "paths":
        out = P.session_paths(source, gap_minutes=360, k=opt(args.k, 50))
    elif args.op == "funnel":
        steps = (args.query or "signup view click purchase").split()
        out = P.funnel_counts(source, steps)
    elif args.op == "retention":
        out = P.retention_cohorts(source, period_days=opt(args.k, 7))
    elif args.op == "weighted_sample":
        if not args.query:
            raise SystemExit("--op weighted_sample requires --query <weight column>")
        out = P.weighted_sample(source, args.query, seed=opt(args.seed, 0))
    elif args.op == "bm25":
        if not args.query:
            raise SystemExit("--op bm25 requires --query")
        out = P.bm25_topk(source, args.query, k=opt(args.k, 10))
    elif args.op == "pmi":
        out = P.pmi_topk(source, window=2, min_count=5, k=opt(args.k, 100))
    elif args.op == "pii":
        out = P.pii_redact(source)
    elif args.op == "fingerprints":
        out = P.winnow_fingerprints(source, k=5, window=4)
    elif args.op == "group_cap":
        out = P.group_capped_sample(
            source, "lang", per_group=opt(args.per_cluster, 100),
            seed=opt(args.seed, 0),
        )
    elif args.op == "url_canon":
        out = P.canonicalize_urls(source)  # --docs: any parquet with a url column
    elif args.op == "url_filter":
        # --docs: any parquet with a url column; --query = comma-
        # separated blocked domains (keywords stay library-level here)
        blocked = (args.query or "example.invalid").split(",")
        out = P.url_filter(source, blocked_domains=blocked)
    elif args.op == "fold_split":
        spec = args.query or "train:0.8,val:0.1,test:0.1"
        folds = {
            part.split(":")[0]: float(part.split(":")[1])
            for part in spec.split(",")
        }
        out = P.fold_split(source, folds, seed=opt(args.seed, 0))
    elif args.op == "pack":
        out = P.pack_sequences(source, budget=opt(args.k, 2048))
    elif args.op == "copy_spans":
        out = P.copy_candidates(
            source, k=5, window=4, min_shared=2, max_df=opt(args.max_df, 64)
        )
    elif args.op == "sample":
        out = P.hash_sample(
            source, rate=opt(args.threshold, 0.1), seed=opt(args.seed, 0)
        )
    elif args.op == "ann_topk":
        # guarded: cosine_topk is the brute-force baseline and raises
        # above --max-brute-rows, directing users to --op ann_lsh
        out = P.cosine_topk(
            source, k=opt(args.k, 5),
            max_rows=args.max_brute_rows if args.max_brute_rows > 0 else None,
        )
    elif args.op == "ann_lsh":
        out = P.lsh_ann_topk(source, k=opt(args.k, 5))
    elif args.op == "ann_ivf":
        out = P.ivf_ann_topk(source, k=opt(args.k, 5))
    elif args.op == "near_dup":
        out = P.embedding_near_dup_pairs(source, threshold=opt(args.threshold, 0.9))
    elif args.op == "pq":
        out = P.pq_codes(source, n_subspaces=opt(args.k, 4))
    elif args.op == "covariance":
        out = P.embedding_covariance(source, dim=opt(args.k, 64))
    elif args.op == "pca":
        out, comps, vals = P.pca_project(source, dim=64, k=opt(args.k, 8))
        print({"op": "pca", "eigenvalues": [round(float(v), 9) for v in vals]})
    elif args.op == "kmeans":
        out = P.kmeans(source, k=opt(args.k, 8), rounds=3).assignments
    elif args.op == "semdedup":
        out = P.semantic_dedup(
            source, threshold=opt(args.threshold, 0.95), n_clusters=opt(args.k, 8)
        )
    elif args.op == "feature_prop":
        if not args.edges:
            ap.error("--op feature_prop needs --edges")
        out = P.feature_propagation(
            read_pages(spark, args.edges), source, rounds=opt(args.k, 2)
        )
    elif args.op == "decontam":
        if not args.benchmark:
            ap.error("--op decontam needs --benchmark")
        out = P.decontaminate(
            source, read_pages(spark, args.benchmark), n=opt(args.k, 13)
        )
    elif args.op == "cluster_sample":
        out = P.cluster_balanced_sample(
            source, per_cluster=opt(args.per_cluster, 100),
            n_clusters=opt(args.k, 8), seed=opt(args.seed, 0),
        )
    else:  # pragma: no cover
        raise AssertionError(args.op)

    if args.output:
        from linkgraph.io import write_table

        write_table(out, args.output)
        n = read_pages(spark, args.output).count()
        print(f'{{"op": "{args.op}", "rows": {n}, "wall_s": {time.time() - t0:.3f}}}')
    else:
        out.show(20, truncate=80)
        print(f'{{"op": "{args.op}", "wall_s": {time.time() - t0:.3f}}}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
