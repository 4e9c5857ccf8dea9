"""Dump formatted physical plans for the headline operators — the
inspectable artifact behind the plan-shape claims (zero Exchange on
per-row ops, partial+final aggregates, broadcast probes, shuffled-hash
kernel scatters). tests/test_plans.py pins the load-bearing properties
in CI; this tool prints the full plans for human review.

Usage: python tools/plan_audit.py [out_path]   (default PLANS.txt)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (name, builder) — each returns a DataFrame whose plan we dump
SUBJECTS = [
    "degree_counts",
    "pagerank_k",
    "cc_components",
    "triangle_count",
    "labelprop_k",
    "lsh_pairs",
    "ann_ivf_topk",
    "bm25_topk",
    "cms_top_words",
    "hll_trigrams",
    "bloom_probe",
    "c4_quality",
    "chunk_documents",
    "node2vec_walks",
    "bpe_token_counts",
    "simhash_pairs",
    "zorder_orders",
    "embedding_covariance",
    "url_filter",
    "fold_split",
    "louvain_k",
    "trussness",
    "landmark_est",
    "host_communities",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "PLANS.txt")
    import __spark_entry__ as entry
    from linkgraph.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    with open(out_path, "w") as f:
        for name in SUBJECTS:
            f.write(f"{'=' * 72}\n== {name}\n{'=' * 72}\n")
            try:
                df = qs[name](spark, SF_DIR)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                f.write(buf.getvalue())
            except Exception as exc:  # noqa: BLE001 — audit tool, report and move on
                f.write(f"(failed to build: {exc})\n")
            f.write("\n\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
