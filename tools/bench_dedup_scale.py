"""Pipeline-family scale bench (VERDICT r4 item 3): the §2.8 dedup and
ANN scale claims rested on plan shapes; this run produces measured
large-input evidence. One synthetic 10M-doc template corpus (pure SQL
generation, no Python, no external data) runs the production dedup leg

    minhash_signatures -> band_frame bucket census -> lsh_candidate
    pairs (max_bucket guard ON) -> connected-components clustering

and an IVF-ANN leg (2M embeddings, index build + probe + re-rank) at
local[LOW] and local[HIGH] (cpuset-pinned subprocesses, same input,
same code), reporting per-stage walls, the Σ bucket² vs n² candidate
bound, guard-trip behavior, and N->4N scaling efficiency — the same
estimator bench_scaling.py uses for the graph kernels.

Corpus shape (deterministic): groups of 4 near-duplicate docs (three
shared 32-hex words + a 6-hex per-doc tail) so LSH buckets are real
near-dup groups, plus a 0.1% exact-duplicate "template flood" (every
1000th doc is byte-identical) that collapses into mega-buckets — the
regime the max_bucket guard exists for: unguarded it alone contributes
~choose2(10k) ≈ 50M candidate pairs; guarded those docs route to
exact dedup (the bucket signature already names the group).

Usage: python tools/bench_dedup_scale.py [--docs 10000000]
         [--embs 2000000] [--low 8] [--high 32] [--max-bucket 64]
Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEDUP_WORKER = """
import json, sys, time
n_docs = int(sys.argv[1]); max_bucket = int(sys.argv[2]); cpus = int(sys.argv[3])
from pyspark.sql import functions as F
from linkgraph.session import get_spark
spark = get_spark(app_name=f"dedup-scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=256,
                  extra_conf={"spark.driver.memory": "40g"})
from linkgraph.pipeline.dedup import (band_frame, lsh_candidate_pairs,
                                      minhash_signatures)

# template corpus: groups of 4 near-dups + 0.1% exact-dup flood.
# k=6 shingles: the text alphabet is hex (md5 words), so k=3 would
# give a ~17^3 = 4.9k shingle universe where unrelated docs collide
# into mega-buckets by pigeonhole (measured: 156k-member buckets,
# transitive chaining). 17^6 = 24M >> 66 shingles/doc keeps bucket
# membership a true near-dup signal, as k=3 is for natural text.
g = (F.col("id") / 4).cast("long")
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 1000 == 0, F.lit("template flood common boilerplate text shared by every thousandth document"))
     .otherwise(F.concat_ws(" ",
        F.md5(F.concat(F.lit("ga"), g.cast("string"))),
        F.md5(F.concat(F.lit("gb"), g.cast("string"))),
        F.substring(F.md5(F.col("id").cast("string")), 1, 6),
     )).alias("text"),
)

t0 = time.time()
sig = minhash_signatures(docs, k=6).persist()
n_sig = sig.count()
t_sig = time.time() - t0

# bucket census over EXACTLY the band frame the join uses
t0 = time.time()
buckets = band_frame(sig).groupBy("band_id", "band_sig").agg(
    F.count("*").alias("cnt"))
stats = buckets.agg(
    F.count("*").alias("n_buckets"),
    F.max("cnt").alias("max_bucket_seen"),
    F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
    F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2).alias("cand_unguarded"),
    F.sum(F.when(F.col("cnt") > max_bucket, 1).otherwise(0)).alias("guard_trips"),
    F.sum(F.when(F.col("cnt") > max_bucket,
                 F.col("cnt") * (F.col("cnt") - 1) / 2).otherwise(0)
          ).alias("cand_dropped_by_guard"),
).collect()[0].asDict()
t_census = time.time() - t0

t0 = time.time()
pairs = lsh_candidate_pairs(docs, sig=sig, max_bucket=max_bucket).persist()
n_pairs = pairs.count()
t_pairs = time.time() - t0

t0 = time.time()
from linkgraph.build import build_graph_from_edges
from linkgraph.kernels import connected_components
pg = build_graph_from_edges(
    pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")))
cc = connected_components(pg)
n_clusters = cc.df.select("comp").distinct().count()
t_cc = time.time() - t0

print(json.dumps({
    "cpus": cpus, "n_docs": n_docs, "sig_rows": n_sig,
    "wall_signatures_s": round(t_sig, 1),
    "wall_bucket_census_s": round(t_census, 1),
    "wall_lsh_pairs_s": round(t_pairs, 1),
    "wall_cc_clusters_s": round(t_cc, 1),
    "wall_total_s": round(t_sig + t_census + t_pairs + t_cc, 1),
    "n_candidate_pairs": n_pairs,
    "n_clusters": n_clusters,
    "cc_rounds": cc.iterations,
    "bucket_stats": {k: float(v) if v is not None else None
                     for k, v in stats.items()},
}))
"""

ANN_WORKER = """
import json, sys, time
n_embs = int(sys.argv[1]); cpus = int(sys.argv[2])
from pyspark.sql import functions as F
from linkgraph.session import get_spark
spark = get_spark(app_name=f"ann-scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=128,
                  extra_conf={"spark.driver.memory": "40g"})
from linkgraph.pipeline.simsearch import ivf_ann_topk

dim = 16
emb = spark.range(n_embs).select(
    F.col("id").alias("vec_id"),
    F.expr(f"transform(sequence(0, {dim - 1}), "
           f"j -> cast(pmod(hash(id * {dim} + j), 1000) as double) / 500.0 - 1.0)"
           ).alias("embedding"),
).persist()
emb.count()  # input materialized outside the timed window

t0 = time.time()
res = ivf_ann_topk(emb, k=10, max_queries=64, n_clusters=16, nprobe=2)
rows = res.collect()
t_ann = time.time() - t0
print(json.dumps({
    "cpus": cpus, "n_embs": n_embs, "dim": dim,
    "wall_ann_s": round(t_ann, 1),
    "result_rows": len(rows),
    # ADVICE r5: an order-dependent float SUM can spuriously differ
    # across parallelism levels; digest the sorted (query, neighbor,
    # rounded sim) rows instead — order-insensitive, value-exact to
    # 6dp, and deterministic ACROSS processes (builtin hash() is
    # per-process salted; the two legs are separate workers)
    "checksum": __import__("hashlib").md5(repr(sorted(
        (r["query_id"], r["neighbor_id"], round(r["sim"], 6)) for r in rows
    )).encode()).hexdigest(),
}))
"""


def run_worker(code: str, args: list[str], cpus: int) -> dict:
    pin = (["taskset", "-c", f"0-{cpus - 1}"]
           if os.path.exists("/usr/bin/taskset") else [])
    out = subprocess.run(
        pin + [sys.executable, "-c", code, *args, str(cpus)],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"worker (cpus={cpus}) exited {out.returncode}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(rec), file=sys.stderr)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--embs", type=int, default=2_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--skip-ann", action="store_true")
    args = ap.parse_args()

    factor = args.high / args.low
    # high first: residual page-cache advantage then favors the LOW
    # leg, biasing efficiency downward, never up
    d_hi = run_worker(DEDUP_WORKER, [str(args.docs), str(args.max_bucket)],
                      args.high)
    d_lo = run_worker(DEDUP_WORKER, [str(args.docs), str(args.max_bucket)],
                      args.low)
    eff = round((d_lo["wall_total_s"] / d_hi["wall_total_s"]) / factor, 3)

    ann = {}
    if not args.skip_ann:
        a_hi = run_worker(ANN_WORKER, [str(args.embs)], args.high)
        a_lo = run_worker(ANN_WORKER, [str(args.embs)], args.low)
        assert a_hi["checksum"] == a_lo["checksum"], "ANN results diverged"
        ann = {
            "low": a_lo, "high": a_hi,
            "efficiency": round((a_lo["wall_ann_s"] / a_hi["wall_ann_s"]) / factor, 3),
        }

    n = args.docs
    bs = d_hi["bucket_stats"]
    result = {
        "dedup": {"low": d_lo, "high": d_hi, "efficiency": eff},
        "ann": ann,
        "subquadratic": {
            "n_choose_2": n * (n - 1) / 2,
            "cand_unguarded": bs["cand_unguarded"],
            "cand_after_guard": d_hi["n_candidate_pairs"],
            "unguarded_vs_n2": bs["cand_unguarded"] / (n * (n - 1) / 2),
        },
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Dedup/ANN pipeline scale run {result['ts']} "
            f"({n:,} docs, {args.embs:,} embeddings, local[{args.low}] vs "
            f"local[{args.high}], max_bucket={args.max_bucket}, cpuset-pinned)\n\n"
            f"Dedup leg (minhash_signatures -> bucket census -> LSH pairs "
            f"(guard ON) -> CC clustering):\n\n"
            f"| cores | signatures s | census s | pairs s | cc s | total s |\n"
            f"|---|---|---|---|---|---|\n"
            f"| {d_lo['cpus']} | {d_lo['wall_signatures_s']} | {d_lo['wall_bucket_census_s']} "
            f"| {d_lo['wall_lsh_pairs_s']} | {d_lo['wall_cc_clusters_s']} | {d_lo['wall_total_s']} |\n"
            f"| {d_hi['cpus']} | {d_hi['wall_signatures_s']} | {d_hi['wall_bucket_census_s']} "
            f"| {d_hi['wall_lsh_pairs_s']} | {d_hi['wall_cc_clusters_s']} | {d_hi['wall_total_s']} |\n\n"
            f"scaling efficiency (total) = ({d_lo['wall_total_s']} / "
            f"{d_hi['wall_total_s']}) / {factor:.0f} = **{eff}**\n\n"
            f"Sub-quadratic evidence: n(n-1)/2 = {n * (n - 1) / 2:.3e} possible "
            f"pairs; Σ choose2(bucket) unguarded = {bs['cand_unguarded']:.3e} "
            f"({bs['cand_unguarded'] / (n * (n - 1) / 2):.2e} of n²); after the "
            f"max_bucket={args.max_bucket} guard the realized candidate join is "
            f"{d_hi['n_candidate_pairs']:,} pairs ({bs['guard_trips']:.0f} "
            f"mega-buckets dropped, {bs['cand_dropped_by_guard']:.3e} pairs "
            f"routed to exact dedup; largest bucket {bs['max_bucket_seen']:.0f}). "
            f"{d_hi['n_clusters']:,} clusters in {d_hi['cc_rounds']} CC rounds.\n"
        )
        if ann:
            f.write(
                f"\nIVF-ANN leg (index build + probe + exact re-rank, 64 "
                f"queries, k=10, 16 lists, nprobe 2): local[{args.low}] "
                f"{ann['low']['wall_ann_s']}s vs local[{args.high}] "
                f"{ann['high']['wall_ann_s']}s -> efficiency "
                f"**{ann['efficiency']}** (identical result checksum both legs).\n"
            )
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
