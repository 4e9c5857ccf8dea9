"""Dump formatted physical plans for the headline operators — the
inspectable artifact behind the plan-shape claims (zero Exchange on
per-row ops, partial+final aggregates, broadcast probes, shuffled-hash
kernel scatters). tests/test_plans.py pins the load-bearing properties
in CI; this tool prints the full plans for human review AND emits a
diffable per-query feature summary (PLANS_r5.json) so plan regressions
— a Sort or CartesianProduct sneaking into a pinned loop — show up as
a one-line diff round-over-round instead of a buried wall change.

Counted features per plan (from `explain("formatted")` node names):
  exchanges          Exchange (shuffle) operators
  sorts              Sort operators
  sort_merge_joins / shuffled_hash_joins / broadcast_hash_joins
  nested_loop_joins  BroadcastNestedLoopJoin (one-row broadcast scalars
                     are legitimate; anything else is suspect)
  cartesian          CartesianProduct — MUST be 0 everywhere
  batch_eval_python  row-at-a-time Python UDF eval — MUST be 0
  arrow_python       ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  wholestage         WholeStageCodegen spans

Usage: python tools/plan_audit.py [out_txt] [out_json]
       (defaults PLANS.txt, PLANS_r5.json)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# The five driver-benched headline queries map to the first five
# subjects; betweenness/trussness/louvain_ml are the most expensive r4
# kernels (VERDICT r4 item 7); the rest are the pipeline plan shapes
# the 100 TB posture claims rest on.
SUBJECTS = [
    "degree_counts",
    "pagerank_k",
    "cc_components",
    "triangle_count",
    "labelprop_k",
    "betweenness",
    "trussness",
    "louvain_ml",
    "lsh_pairs",
    "ann_ivf_topk",
    "ann_topk",
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
    "landmark_est",
    "host_communities",
]

FEATURES = {
    "exchanges": r"\bExchange\b",
    "sorts": r"\bSort\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "batch_eval_python": r"\bBatchEvalPython\b",
    "arrow_python": r"\b(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b",
    "wholestage": r"\bWholeStageCodegen\b",
}


def summarize(plan_text: str) -> dict:
    # Count only in the numbered operator-tree section (`(3) Sort ...`
    # header lines), not in the per-node detail blocks below it, so a
    # node is counted once.
    tree_lines = [
        line for line in plan_text.splitlines()
        if re.match(r"^[\s:*+-]*\(\d+\)\s", line)
    ]
    tree = "\n".join(tree_lines)
    out = {k: len(re.findall(rx, tree)) for k, rx in FEATURES.items()}
    # formatted mode renders codegen spans as `[codegen id : N]` tags in
    # the detail section, not as tree nodes — count distinct span ids
    out["wholestage"] = len(set(re.findall(r"\[codegen id : (\d+)\]", plan_text)))
    return out


def main() -> None:
    out_txt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "PLANS.txt")
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "PLANS_r6.json")
    import __spark_entry__ as entry
    from linkgraph.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    summary: dict[str, dict] = {}
    with open(out_txt, "w") as f:
        for name in SUBJECTS:
            f.write(f"{'=' * 72}\n== {name}\n{'=' * 72}\n")
            try:
                df = qs[name](spark, SF_DIR)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                text = buf.getvalue()
                f.write(text)
                summary[name] = summarize(text)
            except Exception as exc:  # noqa: BLE001 — audit tool, report and move on
                f.write(f"(failed to build: {exc})\n")
                summary[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            f.write("\n\n")
    # r6 (VERDICT r5 item 4): fold the committed MID-LOOP round plans
    # of the iterative kernels (plans/r06/*_after.txt, captured by the
    # round's optimization work) into the audit as `round:<name>`
    # rows, so a Sort or extra Exchange sneaking into a per-iteration
    # plan is diffable from the committed artifact — the final
    # (post-sever) plans of iterative kernels are LogicalRDD leaves
    # and blind to the loop's shuffle work.
    plans_dir = os.path.join(REPO, "plans", "r06")
    if os.path.isdir(plans_dir):
        for fn in sorted(os.listdir(plans_dir)):
            if fn.endswith("_after.txt"):
                with open(os.path.join(plans_dir, fn)) as fh:
                    summary[f"round:{fn[: -len('_after.txt')]}"] = summarize(
                        fh.read()
                    )
    with open(out_json, "w") as f:
        json.dump({"sf_dir": SF_DIR, "plans": summary}, f, indent=1, sort_keys=True)
    print(f"wrote {out_txt} and {out_json}")


if __name__ == "__main__":
    main()
