"""Training-data pipeline ops: Python-oracle checks for the hashing
pipeline, LSH recall vs brute force, multimodal plumbing."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import (
    cosine_topk,
    exact_dup_groups,
    lsh_ann_topk,
    minhash_signatures,
    simhash,
    token_stats,
    winnow_fingerprints,
)
from linkgraph.pipeline.dedup import MINHASH_P, minhash_params
from linkgraph.pipeline.multimodal import (
    decode_media,
    extract_features,
    fake_media_table,
    frame_sample_plan,
)

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox",
            "the quick brown fox",  # exact dup of 0
            "the quick brown foxes jump",
            "completely different words here",
        ],
    }
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(DOCS)
    out = {r["text_hash"]: (r["n_docs"], r["keep_id"]) for r in exact_dup_groups(df).collect()}
    h = hashlib.md5(b"the quick brown fox").hexdigest()
    assert out[h] == (2, 0)
    assert len(out) == 3


def test_minhash_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {
        (r["doc_id"], r["hash_idx"]): r["min_hash"]
        for r in minhash_signatures(df, num_hashes=4, k=3).collect()
    }
    for _, row in DOCS.iterrows():
        text = row["text"]
        shingles = {text[i : i + 3] for i in range(len(text) - 2)}
        for i, a, b in minhash_params(4):
            expected = min((a * _h32(s) + b) % MINHASH_P for s in shingles)
            assert got[(row["doc_id"], i)] == expected


def test_simhash_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=16).collect()}
    for _, row in DOCS.iterrows():
        toks = [t for t in row["text"].split() if t]
        val = 0
        for b in range(16):
            s = sum(2 * ((_h32(t) >> b) & 1) - 1 for t in toks)
            if s > 0:
                val |= 1 << b
        assert got[row["doc_id"]] == val
    # identical docs -> identical fingerprints; near docs -> close
    assert got[0] == got[1]
    d_near = bin(got[0] ^ got[2]).count("1")
    d_far = bin(got[0] ^ got[3]).count("1")
    assert d_near < d_far


def _winnow_py(text: str, k: int, w: int) -> set[int]:
    """Straight-line winnowing oracle (Schleimer et al. SIGMOD'03),
    mirroring fingerprint.py's tokenization exactly: trim + split \\s+,
    empties kept (an empty text gives [''] -> no grams)."""
    import re

    toks = re.split(r"\s+", text.strip())
    if len(toks) < k:
        return set()
    hs = [_h32(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    return {min(hs[p : p + w]) for p in range(0, max(len(hs) - w, 0) + 1)}


def test_winnow_fingerprints_matches_python_oracle(spark):
    texts = [
        "a b c d e f g h i j k l m n o p",  # long: many full windows
        "z y x a b c d e f g h i w v u",  # shares the run "a b c d e f g h"
        "one two three four five",  # exactly k tokens -> 1 gram < window
        "tiny doc",  # < k tokens -> no fingerprints
        "",  # empty -> no fingerprints
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_py(t, 5, 4), f"doc {i}"
    # the winnowing guarantee: a shared token run of length >= w+k-1
    # (here 8 = 4+5-1) yields at least one shared fingerprint
    assert got[0] & got[1]
    assert not got[0] & got.get(3, set())


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    # 10 clusters so ANN has structure
    centers = rng.standard_normal((10, 16))
    rows = []
    for i in range(200):
        v = centers[i % 10] + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v.astype(np.float32)], i % 10))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_matches_numpy(spark, emb_df):
    out = cosine_topk(emb_df, k=3, max_queries=5).toPandas()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_df.collect()}
    for qid in range(5):
        qv = vecs[qid]
        sims = {
            vid: round(float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v))), 9)
            for vid, v in vecs.items()
            if vid != qid
        }
        expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = out[out.query_id == qid].sort_values("rnk")
        assert list(got["neighbor_id"]) == [e[0] for e in expected]
        np.testing.assert_allclose(list(got["sim"]), [e[1] for e in expected], atol=2e-9)


def test_lsh_ann_recall(spark, emb_df):
    """Clustered data: LSH candidates must recover most exact top-3."""
    exact = cosine_topk(emb_df, k=3, max_queries=10).toPandas()
    approx = lsh_ann_topk(emb_df, k=3, max_queries=10, n_planes=6, n_tables=6).toPandas()
    hits = tot = 0
    for qid in range(10):
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.7, f"LSH recall {hits}/{tot}"


def test_ivf_ann_recall_and_probe_all_exact(spark, emb_df):
    """IVF on clustered data: good recall at nprobe=3/8, and probing
    EVERY list degenerates to the exact brute-force result (the
    candidate set becomes the whole corpus minus self)."""
    from linkgraph.pipeline import ivf_ann_topk

    exact = cosine_topk(emb_df, k=3, max_queries=10).toPandas()
    approx = ivf_ann_topk(
        emb_df, k=3, max_queries=10, n_clusters=8, nprobe=3
    ).toPandas()
    hits = tot = 0
    for qid in range(10):
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.7, f"IVF recall {hits}/{tot}"

    full = (
        ivf_ann_topk(emb_df, k=3, max_queries=10, n_clusters=8, nprobe=8)
        .toPandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    exact_sorted = exact.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, exact_sorted, check_dtype=False)


def test_ivf_ann_deterministic_and_guards(spark, emb_df):
    """Same input → identical result (deterministic index + probes);
    nprobe outside [1, n_clusters] is refused."""
    from linkgraph.pipeline import ivf_ann_topk

    a = ivf_ann_topk(emb_df, k=2, max_queries=4).toPandas()
    b = ivf_ann_topk(emb_df, k=2, max_queries=4).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rnk"]).reset_index(drop=True),
        b.sort_values(["query_id", "rnk"]).reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="nprobe"):
        ivf_ann_topk(emb_df, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_ann_topk(emb_df, n_clusters=4, nprobe=5)


def test_lsh_pairs_max_bucket_guard(spark):
    """Template mega-buckets are dropped by max_bucket; distinct docs
    in small buckets are unaffected; default None is exact banding."""
    from linkgraph.pipeline.dedup import lsh_candidate_pairs

    # 6 identical template docs (one giant bucket per band) + 2 docs
    # identical to each other but distinct from the template
    rows = [(i, "the same boilerplate template text here") for i in range(6)]
    rows += [(10, "a genuinely different document body"),
             (11, "a genuinely different document body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unguarded = lsh_candidate_pairs(docs)
    assert unguarded.count() == 15 + 1  # C(6,2) template pairs + the real pair

    guarded = lsh_candidate_pairs(docs, max_bucket=3)
    got = {(r["doc_a"], r["doc_b"]) for r in guarded.collect()}
    assert got == {(10, 11)}  # mega-bucket dropped, real pair kept


def test_cosine_topk_max_rows_guard(spark, emb_df):
    """The brute-force baseline refuses corpora above max_rows,
    directing callers at the LSH scale path (docstring contract)."""
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        cosine_topk(emb_df, k=3, max_rows=50)
    # under the limit (or unguarded) it runs
    assert cosine_topk(emb_df, k=1, max_queries=2, max_rows=200).count() == 2


def test_cosine_topk_guard_is_default(spark):
    """The guard is ON at the library layer WITHOUT any argument: a
    >100k-row corpus is refused by the default max_rows (VERDICT r3
    item 4 — previously only jobs/run_pipeline.py enforced it)."""
    big = spark.range(100_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.1), F.lit(0.2)).cast("array<float>").alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_rows=100000"):
        cosine_topk(big, k=1)
    # explicit escape hatch still works
    assert cosine_topk(big, k=1, max_queries=1, max_rows=None).count() == 1


def test_runner_refuses_brute_force_above_limit(spark, emb_df, tmp_path):
    """jobs/run_pipeline.py enforces the guard by default."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    try:
        import run_pipeline
    finally:
        sys.path.pop(0)
    path = str(tmp_path / "emb")
    emb_df.write.parquet(path)
    # run_pipeline calls get_spark(); getOrCreate applies that default
    # config to the EXISTING session — restore the test session's confs
    # afterwards so later tests aren't silently re-configured
    from linkgraph.session import conf_override
    keep = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions",)
    }
    with conf_override(spark, keep):
        with pytest.raises(ValueError, match="ann_lsh"):
            run_pipeline.main(["--embeddings", path, "--op", "ann_topk",
                               "--max-brute-rows", "50"])


def test_empty_embeddings_guards(spark):
    from linkgraph.pipeline.simsearch import embedding_near_dup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert embedding_near_dup_pairs(empty).count() == 0
    assert lsh_ann_topk(empty).count() == 0


def test_multimodal_features(spark):
    media = fake_media_table(spark, n=32)
    feats = extract_features(media, bins=16).toPandas()
    assert len(feats) == 32
    for _, r in feats.iterrows():
        f = np.array(r["feature"])
        assert len(f) == 16
        assert abs(f.sum() - 1.0) < 1e-5  # L1-normalized histogram
        assert r["n_bytes"] >= 64
    # frame-sample plan expands rows without decoding
    plan = frame_sample_plan(media, every_n=4)
    assert plan.count() == 32 * 4


def test_decode_stub_raises_for_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_media("image/png", b"\x89PNG")


def test_token_stats_edge_cases(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["", "one two, three."]})
    )
    out = {r["doc_id"]: r.asDict() for r in token_stats(df).collect()}
    assert out[0]["n_tokens"] == 0 and out[0]["quality_score"] == 0.0
    assert out[1]["n_tokens"] == 3
    assert out[1]["punct_cnt"] == 2


def test_ngram_jaccard_stop_shingle_guard(spark):
    """The max_df cutoff defuses the hot-shingle quadratic join: 40
    docs sharing one long boilerplate prefix are all pairwise
    near-dups without the guard (C(40,2) pairs from boilerplate
    shingles alone); with max_df below the corpus size the universal
    shingles are dropped from index AND sizes, and only genuinely
    overlapping suffixes survive."""
    from linkgraph.pipeline import ngram_jaccard_pairs

    boiler = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [(i, boiler + f"unique tail number {i:04d}") for i in range(40)],
        "doc_id long, text string",
    )
    unguarded = ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    assert unguarded.count() == 40 * 39 // 2  # boilerplate dominates
    guarded = ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=20)
    # every shingle of the shared prefix has df=40 > 20 -> dropped; the
    # remaining per-doc shingles ("...number 0001") overlap too little
    assert guarded.count() < 40


def test_embedding_near_dup_pairs(spark, emb_df):
    """Clustered embeddings: every same-cluster pair has cosine ~1
    (0.05 jitter) and identical-direction vectors always share every
    LSH signature, so all high-sim pairs must be found; returned pairs
    are exactly {(a<b): sim >= t AND bucket-collision in >=1 table},
    verified against a NumPy reconstruction of the same pipeline."""
    from linkgraph.pipeline import embedding_near_dup_pairs
    from linkgraph.pipeline.simsearch import _hyperplanes

    t = 0.95
    out = embedding_near_dup_pairs(emb_df, threshold=t, n_planes=6, n_tables=4).toPandas()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_df.collect()}
    planes = _hyperplanes(16, 6, 4, seed=42)
    sigs = {}
    for vid, v in vecs.items():
        sigs[vid] = [
            sum((1 << p) for p in range(6) if float(np.dot(v, planes[tb, p])) > 0)
            for tb in range(4)
        ]
    expected = set()
    for a in vecs:
        for b in vecs:
            if a >= b:
                continue
            if not any(sigs[a][tb] == sigs[b][tb] for tb in range(4)):
                continue
            sim = round(float(np.dot(vecs[a], vecs[b])
                              / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))), 9)
            if sim >= t:
                expected.add((a, b))
    got = set(zip(out["vec_a"], out["vec_b"]))
    assert got == expected
    assert (out["sim"] >= t).all()
    # same-cluster pairs dominate: the op actually finds near-dups
    assert len(got) > 100
    same_cluster = sum(1 for a, b in got if a % 10 == b % 10)
    assert same_cluster == len(got)


def test_dedup_clusters_union_find(spark):
    """dedup_clusters == union-find over the >=threshold Jaccard pair
    graph; docs with no pair are singletons labelled by their own id."""
    from linkgraph.pipeline import dedup_clusters, ngram_jaccard_pairs

    docs = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [
                "aaaa bbbb cccc dddd",
                "aaaa bbbb cccc dddd",      # dup of 0
                "aaaa bbbb cccc dddx",      # near-dup of 0/1
                "wholly unrelated text one",
                "wholly unrelated text two",  # near-dup of 3
                "zzz qqq vvv",              # singleton
            ],
        }
    )
    sdf = spark.createDataFrame(docs)
    pairs = ngram_jaccard_pairs(sdf, k=3, threshold=0.5).toPandas()
    parent = list(range(6))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in pairs.iterrows():
        ra, rb = find(int(r["doc_a"])), find(int(r["doc_b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: min(x for x in range(6) if find(x) == find(d)) for d in range(6)}
    out = dedup_clusters(sdf, k=3, threshold=0.5).toPandas()
    got = dict(zip(out["doc_id"], out["cluster"]))
    assert got == expected
    assert got[5] == 5  # singleton keeps its own id
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3


def test_kmeans_matches_numpy_lloyd(spark, emb_df):
    """Deterministic k-means == a NumPy Lloyd replay with the same
    init (smallest k ids), same round count, raw-double argmin with
    cluster-id tie-break."""
    from linkgraph.pipeline import kmeans

    k, rounds = 6, 3
    res = kmeans(emb_df, k=k, rounds=rounds)
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}

    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb_df.collect()
    )
    ids = [i for i, _ in rows]
    X = np.stack([v for _, v in rows])
    C = X[:k].copy()
    for rnd in range(1, rounds + 1):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the first (smallest id) on ties
        if rnd < rounds:
            for j in range(k):
                if (assign == j).any():
                    C[j] = X[assign == j].mean(axis=0)
    want = {i: int(a) for i, a in zip(ids, assign)}
    assert got == want
    assert len(res.centroids) == k and len(res.centroids[0]) == 16
    # 10 true generator clusters, k=6: each output cluster must be
    # internally consistent with the final centroids (sanity)
    assert set(got.values()) <= set(range(k))


def test_kmeans_separated_blobs_and_guards(spark):
    """Two well-separated blobs with k=2 split perfectly regardless of
    float detail; k > n and bad params raise."""
    from linkgraph.pipeline import kmeans

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        base = np.zeros(8) if i % 2 == 0 else np.full(8, 100.0)
        rows.append((i, [float(x) for x in base + 0.1 * rng.standard_normal(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = kmeans(df, k=2, rounds=3)
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}
    even = {got[i] for i in range(0, 40, 2)}
    odd = {got[i] for i in range(1, 40, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd

    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError):
        kmeans(df.limit(1), k=2)


def test_semantic_dedup_matches_numpy_replay(spark, emb_df):
    """The full SemDeDup pipeline == a NumPy replay: kmeans index
    (same deterministic contract), centroid_sim rank (ASC, vec_id
    tie-break), removal iff an earlier-ranked cluster-mate has
    9-decimal-rounded cosine >= threshold."""
    from linkgraph.pipeline import semantic_dedup

    k, rounds, thr = 6, 3, 0.9
    out = semantic_dedup(emb_df, threshold=thr, n_clusters=k, rounds=rounds).toPandas()

    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb_df.collect()
    )
    ids = [i for i, _ in rows]
    X = np.stack([v for _, v in rows])
    C = X[:k].copy()
    for rnd in range(1, rounds + 1):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        if rnd < rounds:
            for j in range(k):
                if (assign == j).any():
                    C[j] = X[assign == j].mean(axis=0)

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 9)

    want_keep = {}
    for j in range(k):
        members = [i for i, a in zip(ids, assign) if a == j]
        ranked = sorted(members, key=lambda i: (cos(X[i], C[j]), i))
        for pos, i in enumerate(ranked):
            dup = any(cos(X[i], X[y]) >= thr for y in ranked[:pos])
            want_keep[i] = not dup
    got_keep = dict(zip(out["vec_id"], out["keep"]))
    assert got_keep == want_keep
    got_cluster = dict(zip(out["vec_id"], out["cluster"]))
    assert got_cluster == {i: int(a) for i, a in zip(ids, assign)}
    # the synthetic corpus has 10 near-duplicate generator families in
    # 6 clusters — dedup must actually remove something and keep
    # at least one representative per cluster
    assert 0 < sum(got_keep.values()) < len(ids)
    kept_clusters = {got_cluster[i] for i, kp in got_keep.items() if kp}
    assert kept_clusters == set(got_cluster.values())


def test_semantic_dedup_closed_forms_and_guard(spark):
    """Two separated blobs of near-identical vectors: exactly one
    survivor per cluster at a high threshold; threshold > 1 keeps all;
    max_cluster guard refuses degenerate clusterings."""
    from linkgraph.pipeline import semantic_dedup

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        base = np.zeros(8) if i % 2 == 0 else np.full(8, 100.0)
        base[0] += 1.0  # keep vectors off the origin so cosine is stable
        rows.append((i, [float(x) for x in base + 1e-4 * rng.standard_normal(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup(df, threshold=0.999, n_clusters=2, rounds=3).toPandas()
    per_cluster = out[out.keep].groupby("cluster").size()
    assert list(per_cluster) == [1, 1]

    all_kept = semantic_dedup(df, threshold=1.1, n_clusters=2, rounds=3).toPandas()
    assert all_kept["keep"].all()

    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup(df, n_clusters=2, max_cluster=5)


def test_hash_sample_deterministic_and_exact(spark):
    """Membership == a hashlib md5 replay (not just the rate); stable
    across repartitioning; different seeds give different samples."""
    from linkgraph.pipeline import hash_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string"
    )
    rate, seed = 0.2, 7
    got = {r["doc_id"] for r in hash_sample(docs, rate, seed=seed).collect()}
    want = {
        i
        for i in range(500)
        if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
        < int(rate * (1 << 32))
    }
    assert got == want
    assert 0 < len(got) < 500
    # layout-independent: same membership after repartition
    got2 = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), rate, seed=seed).collect()
    }
    assert got2 == got
    # seed changes the sample
    got3 = {r["doc_id"] for r in hash_sample(docs, rate, seed=8).collect()}
    assert got3 != got
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample_per_stratum_rates(spark):
    """Per-stratum rates: en at 10%, de at 100%, unlisted at 0; exact
    membership replayed per stratum."""
    from linkgraph.pipeline import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(docs, {"en": 0.1, "de": 1.0}, seed=4).collect()
    got = {(r["doc_id"], r["lang"]) for r in out}
    assert all(lang != "fr" for _, lang in got)  # default_rate 0
    assert {i for i, lang in rows if lang == "de"} == {
        i for i, lang in got if lang == "de"
    }  # rate 1.0 keeps everything
    en_want = {
        i
        for i, lang in rows
        if lang == "en"
        and int(hashlib.md5(f"4:{i}".encode()).hexdigest()[:8], 16)
        < int(0.1 * (1 << 32))
    }
    assert {i for i, lang in got if lang == "en"} == en_want


def test_gopher_quality_matches_python_replay(spark):
    """gopher_quality == a pure-Python replay (collections.Counter)
    over a corpus exercising repetition, symbols, short docs, and the
    empty edge case; every metric compared after the same 9-decimal
    rounding, the keep flag exactly."""
    from collections import Counter

    from linkgraph.pipeline import gopher_quality

    texts = [
        "",  # empty -> all-zero metrics, keep False (n_words < 50)
        "word",  # single word -> no bigrams
        "spam spam spam spam spam",  # one dominant bigram
        ("the quick brown fox jumps over the lazy dog " * 8).strip(),
        "x " * 49 + "#### ... ... nothing",  # symbols
        " ".join(f"word{i:03d}" for i in range(60)),  # 50+ distinct words, keep-able
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    for i, t in enumerate(texts):
        words = t.strip().split() if t.strip() else []
        n = len(words)
        n_chars = len(t)
        n_word_chars = sum(len(w) for w in words)
        mwl = round(n_word_chars / n, 9) if n else 0.0
        dup = round(1.0 - len(set(words)) / n, 9) if n else 0.0
        bigrams = Counter(
            f"{words[j]} {words[j + 1]}" for j in range(n - 1)
        )
        top_chars = max((c * len(b) for b, c in bigrams.items()), default=0)
        topf = round(top_chars / n_chars, 9) if bigrams else 0.0
        sym = t.count("#") + t.count("...")
        symr = round(sym / n, 9) if n else 0.0
        keep = (
            50 <= n <= 100_000
            and 3.0 <= mwl <= 10.0
            and dup <= 0.90
            and topf <= 0.20
            and symr <= 0.10
        )
        got = out[i]
        assert got["n_words"] == n, (i, got)
        assert got["mean_word_len"] == pytest.approx(mwl, abs=1e-12)
        assert got["dup_word_frac"] == pytest.approx(dup, abs=1e-12)
        assert got["top_bigram_char_frac"] == pytest.approx(topf, abs=1e-12)
        assert got["symbol_word_ratio"] == pytest.approx(symr, abs=1e-12)
        assert got["keep"] == keep, (i, got, keep)
    # the designed corpus exercises both branches of the flag
    assert {out[i]["keep"] for i in range(len(texts))} == {True, False}


def test_cluster_balanced_sample_quota_and_determinism(spark, emb_df):
    """cluster_balanced_sample keeps exactly min(quota, cluster size)
    per kmeans cluster, selected by the seeded md5-prefix hash with
    vec_id ties — replayed via hashlib over the kernel's own
    assignments; membership is stable under repartitioning and
    changes with the seed."""
    import hashlib
    from collections import Counter

    from linkgraph.pipeline import cluster_balanced_sample, kmeans

    k, rounds, m, seed = 6, 3, 5, 7

    def h(vid: int) -> int:
        return int(
            hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()[:8], 16
        )

    assigned = kmeans(emb_df, k=k, rounds=rounds).assignments.collect()
    by_cluster: dict[int, list[int]] = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    expected = set()
    for c, ids in by_cluster.items():
        for vid in sorted(ids, key=lambda v: (h(v), v))[:m]:
            expected.add((vid, c))

    out = cluster_balanced_sample(
        emb_df, per_cluster=m, n_clusters=k, rounds=rounds, seed=seed
    )
    got = {(r["vec_id"], r["cluster"]) for r in out.collect()}
    assert got == expected
    counts = Counter(c for _, c in got)
    for c, ids in by_cluster.items():
        assert counts[c] == min(m, len(ids))

    # layout-independent: same kept set from a different partitioning
    got2 = {
        (r["vec_id"], r["cluster"])
        for r in cluster_balanced_sample(
            emb_df.repartition(7), per_cluster=m, n_clusters=k, rounds=rounds, seed=seed
        ).collect()
    }
    assert got2 == got
    # seed-sensitive
    got_other = {
        (r["vec_id"], r["cluster"])
        for r in cluster_balanced_sample(
            emb_df, per_cluster=m, n_clusters=k, rounds=rounds, seed=99
        ).collect()
    }
    assert got_other != got

    with pytest.raises(ValueError):
        cluster_balanced_sample(emb_df, per_cluster=0)


def test_bpe_token_stats_matches_python_re(spark):
    """The BPE-ish pre-tokenizer counts == Python `re` replay (the
    pattern is lookahead-free ASCII so Java regex, RE2, and `re`
    tokenize identically); whitespace counts match .split()."""
    import re

    from linkgraph.pipeline import bpe_token_stats
    from linkgraph.pipeline.textstats import BPE_ISH_PATTERN

    texts = [
        "",
        "hello world",
        "I'm fine... really, 100% fine!",
        "  leading and   multiple   spaces  ",
        "mixed123tokens and CAPS-dashes_underscores 3.14",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in bpe_token_stats(df).collect()}
    pat = re.compile(BPE_ISH_PATTERN)
    for i, t in enumerate(texts):
        n_ws = len(t.split())
        n_bpe = len(pat.findall(t))
        assert out[i]["n_tokens_ws"] == n_ws, (i, out[i])
        assert out[i]["n_tokens_bpe"] == n_bpe, (i, out[i])
        want = round(len(t) / n_bpe, 9) if n_bpe else 0.0
        assert out[i]["chars_per_token"] == pytest.approx(want, abs=1e-12)
    # the BPE-ish tokenizer splits punctuation runs the ws one glues
    assert out[2]["n_tokens_bpe"] > out[2]["n_tokens_ws"]


def test_minhash_jaccard_pairs_estimator(spark):
    """jaccard_est == (equal signature components)/num_hashes replayed
    from the kernel's own signatures over the LSH candidate set; the
    threshold prunes exactly; identical docs estimate 1.0."""
    from linkgraph.pipeline import (
        lsh_candidate_pairs,
        minhash_jaccard_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact dup of 0 -> est 1.0
            (2, base + " tail two"),
            (3, base + " tail three"),
            (4, "completely different words entirely unrelated"),
        ],
        "doc_id long, text string",
    )
    sigs: dict[int, dict[int, int]] = {}
    for r in minhash_signatures(docs, num_hashes=8, k=3).collect():
        sigs.setdefault(r["doc_id"], {})[r["hash_idx"]] = r["min_hash"]
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, num_hashes=8, band_rows=2, k=3).collect()
    }
    expect = {
        (a, b): round(
            sum(sigs[a][i] == sigs[b][i] for i in range(8)) / 8, 9
        )
        for a, b in cand
    }
    out = minhash_jaccard_pairs(docs, num_hashes=8, band_rows=2, k=3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_est"] for r in out}
    assert got == expect
    assert got[(0, 1)] == 1.0
    # threshold prunes exactly on the rounded estimate
    thr = 0.5
    pruned = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est"]
        for r in minhash_jaccard_pairs(
            docs, num_hashes=8, band_rows=2, k=3, threshold=thr
        ).collect()
    }
    assert pruned == {p: j for p, j in expect.items() if j >= thr}


def test_feature_propagation_matches_python_replay(spark, emb_df):
    """2 rounds of in-neighbor+self mean == an exact integer replay of
    the fixed-point contract (floor(x*1e9) quantize, int64 sums,
    floor-division means); every (vec_id, dim) cell compared EXACTLY —
    no float tolerance, that is the operator's whole point."""
    import math

    from linkgraph.pipeline import feature_propagation

    n = 200
    edge_list = [(i, (i + 1) % n) for i in range(n)] + [
        (i, (7 * i + 3) % n) for i in range(n)
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = feature_propagation(edges, emb_df, rounds=2).collect()

    Q: dict[int, list[int]] = {}
    for r in emb_df.collect():
        Q[r["vec_id"]] = [math.floor(float(x) * 1e9) for x in r["embedding"]]
    incoming: dict[int, set[int]] = {v: {v} for v in range(n)}
    for s, d in edge_list:
        incoming[d].add(s)
    for _ in range(2):
        # floor of the double quotient == true floor here (see module
        # docstring's error bound), which for ints is Python's //
        Q = {
            v: [
                sum(Q[u][d] for u in incoming[v]) // len(incoming[v])
                for d in range(16)
            ]
            for v in range(n)
        }
    assert len(out) == n * 16
    for r in out:
        assert r["x"] == Q[r["vec_id"]][r["dim"]] / 1e9, (r["vec_id"], r["dim"])


def test_feature_propagation_closed_forms(spark):
    """Directed path 0 -> 1: vertex 0 (no in-edges) keeps its vector
    via the self-loop; vertex 1 averages both. rounds=0 is refused."""
    from linkgraph.pipeline import feature_propagation

    emb = spark.createDataFrame(
        [(0, [2.0, 4.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {
        (r["vec_id"], r["dim"]): r["x"]
        for r in feature_propagation(edges, emb, rounds=1).collect()
    }
    assert got == {(0, 0): 2.0, (0, 1): 4.0, (1, 0): 1.0, (1, 1): 2.0}
    with pytest.raises(ValueError):
        feature_propagation(edges, emb, rounds=0)


def test_decontaminate_matches_python_replay(spark):
    """decontaminate == a pure-Python set replay over a corpus with a
    verbatim benchmark copy, a partial n-gram overlap, a disjoint-vocab
    doc, and a too-short doc (< n words -> trivially clean)."""
    from linkgraph.pipeline import decontaminate

    bench_texts = [
        "alpha beta gamma delta epsilon",
        "one two three four five six",
    ]
    corpus = [
        (0, "alpha beta gamma delta epsilon"),  # verbatim eval doc
        (1, "x one two three four five six y"),  # embedded eval span
        (2, "totally different vocabulary here okay"),  # clean
        (3, "one two"),  # < n words, trivially clean
        (4, "zero one two three four five seven"),  # shares one 3-gram run
    ]
    n = 3
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(t,) for t in bench_texts], "text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=n).collect()}

    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    bench_grams = set().union(*(grams(t) for t in bench_texts))
    for doc_id, text in corpus:
        shared = len(grams(text) & bench_grams)
        assert out[doc_id]["n_shared_ngrams"] == shared, (doc_id, text)
        assert out[doc_id]["contaminated"] == (shared > 0)
    assert not out[2]["contaminated"] and not out[3]["contaminated"]
    assert out[0]["contaminated"] and out[1]["contaminated"]

    with pytest.raises(ValueError):
        decontaminate(docs, bench, n=0)


def test_pii_redact_matches_python_re(spark):
    """pii_redact == Python `re` replay of the same sequential
    email → ip → phone mask (patterns are lookahead-free ASCII so
    Java regex, RE2, and `re` agree); placeholders carry no maskable
    characters, so the op is idempotent."""
    import re

    from linkgraph.pipeline import pii_redact
    from linkgraph.pipeline.pii import PII_PATTERNS

    texts = [
        "",
        "no pii here at all",
        "mail me at first.last+tag@sub.example.co or x9@y.io",
        "server 10.0.0.1 and 255.255.255.255 but not 1.2.3",
        "call 555-010-1234 or 555.987.6543 now",
        "user5@example.com from 36.252.212.37 call 555-010-1234",
        "version 1.2.3.4.5 strings and 1234-567-8901 long runs",
        "already masked <EMAIL> <IP> <PHONE> stays put",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}

    for i, t in enumerate(texts):
        cur = t
        want_counts = {}
        for name, pattern, placeholder in PII_PATTERNS:
            want_counts[f"n_{name}s"] = len(re.findall(pattern, cur))
            cur = re.sub(pattern, placeholder, cur)
        got = out[i]
        for k, v in want_counts.items():
            assert got[k] == v, (i, k, got)
        assert got["redacted"] == cur, (i, got["redacted"], cur)
        assert got["has_pii"] == (sum(want_counts.values()) > 0)

    # sequential-mask contract: the email's digits never double-count
    assert out[5]["n_emails"] == 1 and out[5]["n_ips"] == 1
    assert out[5]["n_phones"] == 1
    # idempotence: redacting the redacted corpus is a no-op
    redacted = pii_redact(df).select(
        "doc_id", F.col("redacted").alias("text")
    )
    twice = {r["doc_id"]: r["redacted"] for r in pii_redact(redacted).collect()}
    for i in range(len(texts)):
        assert twice[i] == out[i]["redacted"]


def test_pii_redact_plan_is_scan_projection(spark):
    """100 TB shape: the whole op is one codegen projection over the
    scan — no Exchange anywhere in the plan."""
    from linkgraph.pipeline import pii_redact

    df = spark.createDataFrame([(0, "a@b.co")], "doc_id long, text string")
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_copy_candidates_matches_python_oracle(spark):
    """Pair shared-fingerprint counts equal the _winnow_py set replay;
    min_shared and max_df guards behave."""
    from itertools import combinations

    from linkgraph.pipeline import copy_candidates

    texts = [
        "a b c d e f g h i j k l m n o p",       # 0
        "z y x a b c d e f g h i w v u",          # 1: shares a long run with 0
        "q r s a b c d e f g h i t u v",          # 2: shares the same run
        "one two three four five six seven",      # 3: unrelated
        "a b c d e f g h i j k l m n o p",        # 4: verbatim copy of 0
        "tiny doc",                                # 5: below k tokens
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    fps = {i: _winnow_py(t, 5, 4) for i, t in enumerate(texts)}

    def expect(min_shared, max_df):
        cnt = {}
        for f in set().union(*fps.values()):
            cnt[f] = sum(f in s for s in fps.values())
        kept = {
            i: {f for f in s if max_df is None or cnt[f] <= max_df}
            for i, s in fps.items()
        }
        out = {}
        for a, b in combinations(range(len(texts)), 2):
            shared = len(kept[a] & kept[b])
            if shared >= min_shared:
                out[(a, b)] = shared
        return out

    got = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in copy_candidates(df, k=5, window=4, min_shared=1,
                                 max_df=None).collect()
    }
    assert got == expect(1, None)
    # the verbatim copy shares EVERY fingerprint
    assert got[(0, 4)] == len(fps[0])
    # min_shared prunes weak pairs
    got2 = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in copy_candidates(df, k=5, window=4, min_shared=2,
                                 max_df=None).collect()
    }
    assert got2 == expect(2, None)
    # a fingerprint in >max_df docs is boilerplate: dropped pre-join
    got3 = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in copy_candidates(df, k=5, window=4, min_shared=1,
                                 max_df=2).collect()
    }
    assert got3 == expect(1, 2)


def test_pack_sequences_matches_python_replay(spark):
    """Packing equals the sequential doc_id-order replay, is invariant
    to parallelism (the two-phase prefix sum is layout-independent),
    and overflow stays below one document."""
    from linkgraph.pipeline import pack_sequences

    rng = np.random.default_rng(11)
    texts = [" ".join(["w"] * int(rng.integers(0, 40))) for _ in range(200)]
    ids = list(range(0, 400, 2))  # sparse ids: order is by id, not position
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "text": texts}))

    budget = 64
    toks = [len(t.split()) if t.strip() else 0 for t in texts]
    cum = 0
    want = {}
    for i, t in sorted(zip(ids, toks)):
        want[i] = (t, cum // budget, cum % budget)
        cum += t

    for p in (3, 8):
        got = {
            r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_off"])
            for r in pack_sequences(df, budget=budget, num_partitions=p).collect()
        }
        assert got == want, f"num_partitions={p}"

    # overflow bound: a sequence exceeds the budget by < its straddling
    # doc's length, i.e. every doc STARTS strictly inside its sequence
    for i, (t, s, off) in want.items():
        assert 0 <= off < budget

    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_pack_sequences_empty_and_zero_docs(spark):
    """Zero-token docs consume no budget; empty input yields no rows."""
    from linkgraph.pipeline import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c", "", "d e"]})
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_off"])
        for r in pack_sequences(df, budget=4).collect()
    }
    assert got == {1: (3, 0, 0), 2: (0, 0, 3), 3: (2, 0, 3)}
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, budget=4).count() == 0


def test_canonicalize_urls_rules_and_python_replay(spark):
    """Each canonicalization rule in isolation + a Python `re` replay
    (the cross-engine portability pin for the shared patterns)."""
    import re

    from linkgraph.pipeline import canonicalize_urls
    from linkgraph.pipeline.urlnorm import TRACKING_PARAM_RE

    cases = {
        # fragment stripped
        "http://a.com/p#sec": ("http://a.com/p", "a.com", True),
        # scheme+host lowercased, path case preserved
        "HTTP://WWW.Ex.COM/Path/Q": ("http://www.ex.com/Path/Q", "www.ex.com", True),
        # default ports dropped, non-default kept
        "http://a.com:80/x": ("http://a.com/x", "a.com", True),
        "https://a.com:443/x": ("https://a.com/x", "a.com", True),
        "http://a.com:8080/x": ("http://a.com:8080/x", "a.com", True),
        "https://a.com:80/x": ("https://a.com:80/x", "a.com", True),
        # tracking params dropped, order of survivors preserved
        "http://a.com/x?b=2&utm_source=s&a=1": ("http://a.com/x?b=2&a=1", "a.com", True),
        "http://a.com/x?utm_campaign=c&fbclid=f&gclid=g&msclkid=m": ("http://a.com/x", "a.com", True),
        # empty path -> "/"
        "http://a.com": ("http://a.com/", "a.com", True),
        "http://a.com?utm_source=s": ("http://a.com/", "a.com", True),
        # no scheme -> pass-through, invalid
        "not a url": ("not a url", "", False),
        "/relative/path": ("/relative/path", "", False),
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    got = {
        r["url"]: (r["canonical"], r["host"], r["is_valid"])
        for r in canonicalize_urls(df).collect()
    }
    assert got == cases
    # portability: Python re agrees with the JVM on the tracking pattern
    assert re.match(TRACKING_PARAM_RE, "utm_source=x")
    assert re.match(TRACKING_PARAM_RE, "fbclid")
    assert not re.match(TRACKING_PARAM_RE, "mutm_source=x")
    assert not re.match(TRACKING_PARAM_RE, "id=utm_source")


def test_canonicalize_urls_idempotent(spark):
    """Canonical output is a fixpoint: canonicalize(canonical) is the
    identity (crawl frontiers re-normalize without harm)."""
    from linkgraph.pipeline import canonicalize_urls

    urls = [
        "HTTP://A.com:80/p?utm_source=x&k=1#f",
        "https://b.com",
        "http://c.com:9090/q?z=9",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    once = canonicalize_urls(df).select(F.col("canonical").alias("url"))
    twice = canonicalize_urls(once)
    for r in twice.collect():
        assert r["canonical"] == r["url"]


def test_group_capped_sample_matches_hashlib_replay(spark):
    """Per-group kept sets equal the hashlib replay (seeded md5-prefix
    rank, ties by id); caps hold; seeds move the representatives;
    membership is repartition-stable."""
    import hashlib

    from linkgraph.pipeline import group_capped_sample

    rng = np.random.default_rng(5)
    n = 240
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": [["en", "en", "en", "fr", "de"][int(rng.integers(5))] for _ in range(n)],
            "text": ["x"] * n,
        }
    )
    df = spark.createDataFrame(pdf)

    def replay(seed, cap):
        def h(i):
            return int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16
            )
        kept = set()
        for lang, grp in pdf.groupby("lang"):
            order = sorted(grp["doc_id"], key=lambda i: (h(i), i))
            kept.update(order[:cap])
        return kept

    for seed, cap in ((0, 10), (7, 25)):
        got = {
            r["doc_id"]
            for r in group_capped_sample(df, "lang", cap, seed=seed).collect()
        }
        assert got == replay(seed, cap), (seed, cap)
        sizes = (
            group_capped_sample(df, "lang", cap, seed=seed)
            .groupBy("lang").count().collect()
        )
        assert all(r["count"] <= cap for r in sizes)
    assert replay(0, 10) != replay(7, 10)  # seed sensitivity
    # repartition stability
    got_rep = {
        r["doc_id"]
        for r in group_capped_sample(df.repartition(13), "lang", 10).collect()
    }
    assert got_rep == replay(0, 10)
    with pytest.raises(ValueError):
        group_capped_sample(df, "lang", 0)


# ---------------------------------------------------------------------------
# TF-IDF top-k terms
# ---------------------------------------------------------------------------


def test_tfidf_topk_matches_python_replay(spark):
    """tfidf_topk == a Counter/math replay of the same smooth-idf
    formula, including rank order (round-9 score, term tiebreak)."""
    import math
    from collections import Counter

    from linkgraph.pipeline import tfidf_topk

    texts = [
        "spark spark spark join filter",
        "join filter join scan",
        "vector vector scan scan scan",
        "spark join",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    k = 3
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["tfidf"])
        for r in tfidf_topk(docs, k=k).collect()
    }

    n = len(texts)
    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    df_cnt = Counter(term for c in tfs.values() for term in c)
    exp = {}
    for i, c in tfs.items():
        scored = [
            (
                round(tf * (math.log((1.0 + n) / (1.0 + df_cnt[t])) + 1.0), 9),
                t,
                tf,
            )
            for t, tf in c.items()
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, t, tf) in enumerate(scored[:k], start=1):
            exp[(i, rank)] = (t, tf, s)
    assert set(got) == set(exp)
    for key in exp:
        gt, gtf, gs = got[key]
        et, etf, es = exp[key]
        assert (gt, gtf) == (et, etf), key
        assert gs == pytest.approx(es, abs=1e-12), key


def test_tfidf_topk_rare_term_wins(spark):
    """A unique term outranks a corpus-wide one at equal tf (idf)."""
    from linkgraph.pipeline import tfidf_topk

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["rare common", "common here", "common there"],
            }
        )
    )
    top = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk(docs, k=1).collect()
    }
    assert top[0] == "rare"
    with pytest.raises(ValueError):
        tfidf_topk(docs, k=0)


# ---------------------------------------------------------------------------
# vocabulary stats + unigram-LM surprisal
# ---------------------------------------------------------------------------


def test_vocab_stats_matches_counter_replay(spark):
    """vocab_stats == Counter replay of df/cf and the (cf DESC, term)
    rank order."""
    from collections import Counter

    from linkgraph.pipeline import vocab_stats

    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "cat dog cat",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = [
        (r["rank"], r["term"], r["df"], r["cf"])
        for r in vocab_stats(docs, k=4).orderBy("rank").collect()
    ]

    cf = Counter(t for x in texts for t in x.split())
    df_cnt = Counter(t for x in texts for t in set(x.split()))
    exp_order = sorted(cf, key=lambda t: (-cf[t], t))[:4]
    exp = [
        (i + 1, t, df_cnt[t], cf[t]) for i, t in enumerate(exp_order)
    ]
    assert got == exp

    with pytest.raises(ValueError):
        vocab_stats(docs, k=0)


def test_unigram_logprob_matches_python_replay(spark):
    """unigram_logprob == an exact integer replay: same micro-bit
    quantization (HALF_UP), exact int64 totals, one final division."""
    import math
    from collections import Counter

    from linkgraph.pipeline import unigram_logprob

    texts = [
        "aa aa aa bb",
        "bb cc",
        "aa rare",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["total_bits_e6"], r["mean_bits"])
        for r in unigram_logprob(docs).collect()
    }

    cf = Counter(t for x in texts for t in x.split())
    T = sum(cf.values())
    bits_e6 = {
        t: math.floor((math.log(float(T)) - math.log(c)) / math.log(2.0)
                      * 1e6 + 0.5)
        for t, c in cf.items()
    }
    exp = {}
    for i, x in enumerate(texts):
        toks = x.split()
        if not toks:
            continue  # empty docs vanish at the explode
        total = sum(bits_e6[t] for t in toks)
        exp[i] = (len(toks), total, total / (1e6 * len(toks)))
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][:2] == exp[i][:2], i
        assert got[i][2] == exp[i][2], i  # bit-exact division

    # the common term carries fewer bits than the rare one
    assert bits_e6["aa"] < bits_e6["rare"]
    # doc 2 (aa + rare) scores higher mean surprisal than doc 0
    assert got[2][2] > got[0][2]


# ---------------------------------------------------------------------------
# Inverted index / BM25 / PMI (retrieval + collocations)
# ---------------------------------------------------------------------------


def test_inverted_index_matches_python_replay(spark):
    """Posting lists == a Counter replay: df/cf exact, postings
    serialized in doc_id order; max_df drops stopword-grade terms."""
    from collections import Counter

    from linkgraph.pipeline import inverted_index

    texts = [
        "spark spark join filter",
        "join filter join scan",
        "vector vector scan scan scan",
        "spark join",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r["term"]: r for r in inverted_index(docs).collect()}

    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    exp: dict[str, list[tuple[int, int]]] = {}
    for i, c in tfs.items():
        for t, tf in c.items():
            exp.setdefault(t, []).append((i, tf))
    assert set(got) == set(exp)
    for t, plist in exp.items():
        plist.sort()
        assert got[t]["df"] == len(plist)
        assert got[t]["cf"] == sum(tf for _, tf in plist)
        assert got[t]["postings"] == " ".join(f"{d}:{tf}" for d, tf in plist)

    capped = {r["term"] for r in inverted_index(docs, max_df=2).collect()}
    assert capped == {t for t, p in exp.items() if len(p) <= 2}
    with pytest.raises(ValueError):
        inverted_index(docs, max_df=0)


def test_bm25_topk_matches_python_replay(spark):
    """Ranking and scores == a pure-Python BM25 replay with the same
    micro-unit quantization; a query term unique to one doc puts that
    doc first."""
    import math
    from collections import Counter

    from linkgraph.pipeline import bm25_topk

    texts = [
        "spark spark join filter",
        "join filter join scan scan scan scan scan",
        "vector vector scan scan scan",
        "spark join",
        "needle spark",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    query, k1, b = "spark scan needle", 1.2, 0.75
    got = [
        (r["doc_id"], r["matched"], r["score"], r["rank"])
        for r in bm25_topk(docs, query, k=10).collect()
    ]

    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    n = len(texts)
    avgdl = sum(dls.values()) / n
    terms = query.split()
    dfq = {t: sum(1 for c in tfs.values() if c[t] > 0) for t in terms}
    rows = []
    for i, c in tfs.items():
        tot, matched = 0, 0
        for t in terms:
            tf = c[t]
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            w = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dls[i]) / avgdl))
            # Python round is HALF_EVEN; Spark/DuckDB are HALF_UP — use floor(x+0.5)
            tot += math.floor(w * 1e6 + 0.5)
        if matched:
            rows.append((-tot, i, matched))
    rows.sort()
    exp = [
        (i, m, -negtot / 1e6, r + 1)
        for r, (negtot, i, m) in enumerate(rows[:10])
    ]
    assert got == exp
    assert got[0][0] == 4  # 'needle' is unique to doc 4 -> highest idf
    with pytest.raises(ValueError):
        bm25_topk(docs, "   ")
    with pytest.raises(ValueError):
        bm25_topk(docs, "spark", k=0)


def test_pmi_topk_matches_python_replay(spark):
    """Pair counts, marginals, pmi, and rank order == a brute-force
    window replay; planted collocation ranks first."""
    import math
    from collections import Counter

    from linkgraph.pipeline import pmi_topk

    texts = [
        "zig zag spark join filter zig zag",
        "join filter join scan zig zag",
        "vector vector scan scan scan",
        "spark join zig zag",
        "x",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    window, min_count, k = 2, 2, 50
    got = [
        (r["a"], r["b"], r["pair_count"], r["pmi"], r["rank"])
        for r in pmi_topk(docs, window=window, min_count=min_count, k=k).collect()
    ]

    pairs: Counter = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                a, b = sorted((toks[i], toks[j]))
                pairs[(a, b)] += 1
    n_pairs = sum(pairs.values())
    slots: Counter = Counter()
    for (a, b), c in pairs.items():
        slots[a] += c
        slots[b] += c
    scored = []
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = round(
            math.log(4.0) + math.log(float(n_pairs)) + math.log(c)
            - math.log(slots[a]) - math.log(slots[b]),
            9,
        )
        scored.append((-pmi, a, b, c))
    scored.sort()
    exp = [
        (a, b, c, -negpmi, r + 1)
        for r, (negpmi, a, b, c) in enumerate(scored[:k])
    ]
    assert got == exp
    assert ("zag", "zig") in {(a, b) for a, b, *_ in got}  # planted collocation
    with pytest.raises(ValueError):
        pmi_topk(docs, window=0)
    with pytest.raises(ValueError):
        pmi_topk(docs, k=0)


def test_normalized_dedup_matches_python_replay(spark):
    """normalize_text == a Python `re` replay of the shared NORM_*
    patterns; normalization is idempotent; case/punct/digit/space
    variants collapse into one group with the minimum keep_id."""
    import re

    from linkgraph.pipeline import normalize_text, normalized_dup_groups
    from linkgraph.pipeline.dedup import NORM_DIGITS, NORM_PUNCT, NORM_WS

    def norm_py(s: str) -> str:
        s = s.lower()
        s = re.sub(NORM_DIGITS, "0", s)
        s = re.sub(NORM_PUNCT, "", s)
        s = re.sub(NORM_WS, " ", s)
        return s.strip()

    texts = [
        "Spark joins FAST!",
        "  spark   joins fast ",
        "spark, joins; fast...",
        "call me at 555 1234",
        "call me at 999 0000",  # digits->0 and punct-strip merge these
        "totally different",
        "",
        "!!!",  # normalizes to empty -> merges with ""
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got_norm = {r["doc_id"]: r["norm"] for r in normalize_text(docs).collect()}
    for i, t in enumerate(texts):
        assert got_norm[i] == norm_py(t)
        assert norm_py(norm_py(t)) == norm_py(t)  # idempotent

    groups = {
        r["keep_id"]: r["n_docs"] for r in normalized_dup_groups(docs).collect()
    }
    assert groups == {0: 3, 3: 2, 5: 1, 6: 2}


def test_covisitation_matches_python_replay(spark):
    """Session pairing, counts, marginals, and cosine scores == a
    sequential gaps-and-islands replay; power-session guard and param
    guards enforced."""
    import itertools
    import math
    from collections import Counter

    from linkgraph.pipeline import covisitation

    # user 1: two sessions (gap at 40 min); user 2: one long session
    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (1, "2024-01-01 00:05:00", 11),
        (1, "2024-01-01 00:10:00", 10),  # dup item, same session
        (1, "2024-01-01 00:50:00", 12),  # >= 30-min gap -> new session
        (1, "2024-01-01 00:55:00", 10),
        (2, "2024-01-01 00:00:00", 10),
        (2, "2024-01-01 00:10:00", 11),
        (2, "2024-01-01 00:20:00", 12),
        (2, "2024-01-01 00:29:59", 13),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "item"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)

    def replay(gap_min, min_count, max_items=None):
        sessions = []
        for u in sorted({r[0] for r in rows}):
            evs = sorted((pd.Timestamp(t), i) for uu, t, i in rows if uu == u)
            cur = {evs[0][1]}
            last = evs[0][0]
            for t, i in evs[1:]:
                if (t - last).total_seconds() >= gap_min * 60:
                    sessions.append(cur)
                    cur = set()
                cur.add(i)
                last = t
            sessions.append(cur)
        if max_items is not None:
            sessions = [s for s in sessions if len(s) <= max_items]
        cnt: Counter = Counter()
        marg: Counter = Counter()
        for s in sessions:
            for i in s:
                marg[i] += 1
            for a, b in itertools.combinations(sorted(s), 2):
                cnt[(a, b)] += 1
        return {
            (a, b): (c, round(c / (math.sqrt(marg[a]) * math.sqrt(marg[b])), 9))
            for (a, b), c in cnt.items()
            if c >= min_count
        }

    for gap, mc in ((30, 1), (30, 2), (120, 1)):
        got = {
            (r["item_a"], r["item_b"]): (r["cnt"], r["score"])
            for r in covisitation(df, gap_minutes=gap, min_count=mc).collect()
        }
        assert got == replay(gap, mc), (gap, mc)

    # power-session guard: user 2's 4-item session drops at max 3
    got_g = {
        (r["item_a"], r["item_b"]): (r["cnt"], r["score"])
        for r in covisitation(
            df, gap_minutes=30, min_count=1, max_session_items=3
        ).collect()
    }
    assert got_g == replay(30, 1, max_items=3)
    with pytest.raises(ValueError):
        covisitation(df, gap_minutes=0)
    with pytest.raises(ValueError):
        covisitation(df, max_session_items=1)


def test_funnel_and_retention_match_python_replay(spark):
    """funnel_counts == a per-user first-touch replay (with and
    without horizon); retention_cohorts == a set-replay of absolute
    periods; param guards enforced."""
    from linkgraph.pipeline import funnel_counts, retention_cohorts

    rows = [
        # user 1 completes the whole funnel in order
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 01:00:00", "view"),
        (1, "2024-01-03 00:00:00", "click"),
        # user 2 clicks BEFORE viewing -> stalls at view
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 00:30:00", "click"),
        (2, "2024-01-01 02:00:00", "view"),
        # user 3 never signs up
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-02 00:00:00", "click"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)

    got = {
        r["step"]: (r["event_type"], r["users"])
        for r in funnel_counts(df, ["signup", "view", "click"]).collect()
    }
    assert got == {1: ("signup", 2), 2: ("view", 2), 3: ("click", 1)}
    # 24h horizon from signup: user 1's click at +48h drops out
    got_h = {
        r["step"]: r["users"]
        for r in funnel_counts(
            df, ["signup", "view", "click"], horizon_minutes=24 * 60
        ).collect()
    }
    assert got_h == {1: 2, 2: 2, 3: 0}
    with pytest.raises(ValueError):
        funnel_counts(df, [])
    with pytest.raises(ValueError):
        funnel_counts(df, ["signup"], horizon_minutes=0)

    got_r = {
        (r["cohort"], r["offset"]): r["users"]
        for r in retention_cohorts(df, period_days=1).collect()
    }
    # absolute day index of 2024-01-01 (exact integer division)
    d0 = int(pd.Timestamp("2024-01-01").value // 1000) // 86_400_000_000
    # users 1,2,3 first active day d0; user 1 also d0+2, user 3 d0+1
    assert got_r == {(d0, 0): 3, (d0, 1): 1, (d0, 2): 1}
    with pytest.raises(ValueError):
        retention_cohorts(df, period_days=0)


def test_weighted_sample_matches_hashlib_replay(spark):
    """Per-row keep probability == an exact hashlib membership replay;
    w<=0 keeps nothing, w>=1 keeps everything; stable under
    repartitioning; seed-sensitive."""
    from linkgraph.pipeline import weighted_sample

    n = 200
    pdf = pd.DataFrame(
        {"doc_id": range(n), "w": [(i % 11) / 10.0 for i in range(n)]}
    )
    df = spark.createDataFrame(pdf)

    def replay(seed):
        kept = set()
        for i in range(n):
            h = int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16
            )
            w = min(max((i % 11) / 10.0, 0.0), 1.0)
            if h < w * 2**32:
                kept.add(i)
        return kept

    got = {r["doc_id"] for r in weighted_sample(df, "w", seed=3).collect()}
    assert got == replay(3)
    assert {i for i in got if i % 11 == 0} == set()  # w=0 rows never kept
    assert {i for i in range(n) if i % 11 == 10} <= got  # w=1 rows always
    got_rep = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "w", seed=3).collect()
    }
    assert got_rep == got
    assert {r["doc_id"] for r in weighted_sample(df, "w", seed=4).collect()} != got


def test_c4_quality_matches_python_replay(spark):
    """c4_quality == a pure-Python replay of the C4 §2.2 rules over a
    corpus exercising every rule in isolation + the keep path."""
    import re

    from linkgraph.pipeline import c4_quality
    from linkgraph.pipeline.textstats import C4_JS_PATTERN

    texts = [
        "",  # empty
        "no terminal punctuation here at all",
        "Too short.",  # < 5 words (and < 3 sentences)
        "One sentence only with plenty of words in it.",  # < 3 sentences
        "First ok. Second ok. Third ok too.",  # keep
        "Lorem ipsum dolor sit amet. Second. Third.",  # lorem
        "A brace { appears. Second. Third.",  # brace
        "Please enable javascript to view. Second. Third.",  # javascript
        "Javascripted words do not count. Second. Third ok.",  # NOT a js word hit? see replay
        'Quoted endings count too. Really. "Yes."',  # ends with quote
        "Trailing spaces still end fine. Second. Third.   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in c4_quality(df).collect()}
    js = re.compile(C4_JS_PATTERN)
    for i, t in enumerate(texts):
        words = t.strip().split() if t.strip() else []
        n_words = len(words)
        n_sent = sum(t.count(ch) for ch in ".!?")
        ends = t.rstrip()[-1:] in (".", "!", "?", '"')
        lorem = "lorem ipsum" in t.lower()
        brace = "{" in t
        jshit = js.search(t.lower()) is not None
        keep = (
            ends and n_words >= 5 and n_sent >= 3
            and not lorem and not brace and not jshit
        )
        got = out[i]
        assert got["n_words"] == n_words, (i, got)
        assert got["n_sentences"] == n_sent, (i, got)
        assert got["ends_terminal"] == ends, (i, got)
        assert got["has_lorem"] == lorem, (i, got)
        assert got["has_brace"] == brace, (i, got)
        assert got["has_javascript"] == jshit, (i, got)
        assert got["keep"] == keep, (i, got)


def test_chunk_documents_matches_python_replay(spark):
    """chunk_documents == a pure-Python sliding-window replay; pins
    last-chunk-reaches-the-end, no-subset-chunks, and the empty and
    exactly-window edge cases."""
    from linkgraph.pipeline import chunk_documents

    texts = [
        "",
        "one",
        " ".join(f"t{i}" for i in range(8)),  # == window
        " ".join(f"t{i}" for i in range(9)),  # window + 1
        " ".join(f"t{i}" for i in range(29)),  # several chunks
        "  padded   with   spaces  ",
    ]
    window, overlap = 8, 3
    stride = window - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["doc_id"], r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, window=window, overlap=overlap)
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    want = []
    for i, t in enumerate(texts):
        words = t.strip().split() if t.strip() else []
        n = len(words)
        if n == 0:
            continue
        n_chunks = 1 if n <= window else (n - window + stride - 1) // stride + 1
        for k in range(n_chunks):
            s = k * stride
            chunk = words[s : s + window]
            want.append((i, k, s, len(chunk), " ".join(chunk)))
        # invariant: the final chunk reaches the last token
        assert (n_chunks - 1) * stride + window >= n
    assert got == want


def test_chunk_documents_param_guards(spark):
    import pytest as _pytest

    from linkgraph.pipeline import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, window=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, window=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(df, window=4, overlap=-1)


def _md5_int(key: str, hex_digits: int) -> int:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:hex_digits], 16)


def test_count_min_sketch_matches_hashlib_replay(spark):
    """The CMS grid and point estimates == a hashlib replay; the CMS
    guarantee (est >= true, exact when width is collision-free)
    holds; guards raise."""
    from collections import Counter

    import pytest as _pytest

    from linkgraph.pipeline import cms_estimate, count_min_sketch

    texts = ["a b c a", "b b d", "", "  ", "e a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    depth, width, seed = 3, 4, 9
    sk = count_min_sketch(docs, depth=depth, width=width, seed=seed)
    got = {(r["d"], r["bucket"]): r["cnt"] for r in sk.collect()}
    true = Counter(w for t in texts if t.strip() for w in t.split())
    want: dict[tuple[int, int], int] = {}
    for term, c in true.items():
        for d in range(depth):
            b = _md5_int(f"{seed}:{d}:{term}", 8) % width
            want[(d, b)] = want.get((d, b), 0) + c
    assert got == want
    terms = spark.createDataFrame([(t,) for t in true], "term string")
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(sk, terms, depth=depth, width=width, seed=seed).collect()
    }
    for term, c in true.items():
        want_est = min(
            want[(d, _md5_int(f"{seed}:{d}:{term}", 8) % width)]
            for d in range(depth)
        )
        assert est[term] == want_est
        assert est[term] >= c  # the guarantee
    # collision-free width -> exact
    sk2 = count_min_sketch(docs, depth=2, width=1 << 20, seed=seed)
    est2 = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(sk2, terms, depth=2, width=1 << 20, seed=seed).collect()
    }
    assert est2 == dict(true)
    with _pytest.raises(ValueError):
        count_min_sketch(docs, depth=0)


def test_hll_distinct_matches_hashlib_replay_and_merges(spark):
    """HLL registers == a hashlib replay; the estimate == the same
    scaled-integer formula; register-MAX merging two halves == the
    whole; accuracy within 5 standard errors on 5k distinct keys."""
    import math

    import pytest as _pytest

    from linkgraph.pipeline import hll_distinct

    n, b, seed = 5000, 8, 3
    m, S = 1 << b, 60 - b
    vals = spark.range(n).select(F.concat(F.lit("key"), F.col("id")).alias("term"))
    regs_df, est_df = hll_distinct(vals, b=b, seed=seed)
    got_regs = {r["bucket"]: r["reg"] for r in regs_df.collect()}
    want_regs = {i: 0 for i in range(m)}
    for i in range(n):
        h = _md5_int(f"{seed}:key{i}", 15)
        bkt, w = h & (m - 1), h >> b
        rho = S - (w.bit_length() - 1) if w > 0 else S + 1
        want_regs[bkt] = max(want_regs[bkt], rho)
    assert got_regs == want_regs
    est = est_df.collect()[0].asDict()
    z = sum((1 << S) >> r for r in want_regs.values())
    v = sum(1 for r in want_regs.values() if r == 0)
    assert est["z_scaled"] == z and est["zero_buckets"] == v
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << S) / z
    want_est = (
        float(m) * math.log(float(m) / v) if (raw <= 2.5 * m and v > 0) else raw
    )
    assert est["estimate"] == pytest.approx(round(want_est, 9), abs=1e-9)
    # accuracy: within 5 * 1.04/sqrt(m) of the truth
    assert abs(est["estimate"] - n) / n < 5 * 1.04 / math.sqrt(m)
    # mergeability: MAX of half-registers == whole-corpus registers
    h1, _ = hll_distinct(vals.where(F.col("term") < "key25"), b=b, seed=seed)
    h2, _ = hll_distinct(vals.where(F.col("term") >= "key25"), b=b, seed=seed)
    merged = {
        r["bucket"]: r["reg"]
        for r in h1.unionByName(h2)
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .collect()
    }
    assert merged == want_regs
    with _pytest.raises(ValueError):
        hll_distinct(vals, b=3)


def test_word_trigrams_replay(spark):
    from linkgraph.pipeline import word_trigrams

    texts = ["a b c d", "x y", "", "p q r"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(r["term"] for r in word_trigrams(docs).collect())
    want = []
    for t in texts:
        ws = t.split()
        want += [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
    assert got == sorted(want)


def test_embedding_covariance_matches_numpy_replay(spark):
    """The quantized second-moment sums == a numpy int64 replay
    (exact equality — ints), partition-count independent; the dim
    guard and overflow guard raise."""
    import numpy as np
    import pytest as _pytest

    from linkgraph.pipeline import embedding_covariance

    rng = np.random.default_rng(5)
    mat = rng.normal(0, 0.3, size=(40, 6))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    quant = 1_000_000
    for parts in (1, 5):
        got = {
            (r["d1"], r["d2"]): (r["n"], r["s1"], r["s2"], r["s12"])
            for r in embedding_covariance(
                emb.repartition(parts), dim=6, quant=quant
            ).collect()
        }
        q = np.floor(mat * quant).astype(np.int64)
        want = {}
        for a in range(6):
            for b in range(a, 6):
                want[(a, b)] = (
                    40,
                    int(q[:, a].sum()),
                    int(q[:, b].sum()),
                    int((q[:, a] * q[:, b]).sum()),
                )
        assert got == want
    with _pytest.raises(Exception):
        embedding_covariance(emb, dim=7).collect()  # dim mismatch
    with _pytest.raises(ValueError):
        embedding_covariance(emb, dim=0)


def test_pca_project_matches_numpy_replay(spark):
    """Top-k PCA == a numpy replay on the same quantized covariance:
    eigenvalues exactly equal (identical driver-side eigh input),
    projections allclose, the sign convention is deterministic, and
    components are orthonormal. A planted dominant direction is
    recovered."""
    import numpy as np
    import pytest as _pytest

    from linkgraph.pipeline import pca_project
    from linkgraph.pipeline.embedpca import covariance_matrix, QUANT

    rng = np.random.default_rng(11)
    direction = np.array([3.0, 1.0, 0.0, 0.0]) / np.sqrt(10)
    mat = rng.normal(0, 0.05, size=(60, 4)) + np.outer(
        rng.normal(0, 1.0, 60), direction
    )
    rows = [(i, [float(x) for x in mat[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj, comps, vals = pca_project(emb, dim=4, k=2)
    # numpy replay of the same pipeline
    q = np.floor(mat * QUANT).astype(np.int64)
    n = len(q)
    s12 = q.T @ q
    s1 = q.sum(0)
    cov = (s12 / n - np.outer(s1 / n, s1 / n)) / (QUANT * QUANT)
    w_, v_ = np.linalg.eigh(cov)
    order = np.argsort(w_)[::-1][:2]
    assert np.allclose(vals, w_[order], rtol=0, atol=0)
    want = v_[:, order].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(want[i])))
        if want[i, j] < 0:
            want[i] = -want[i]
    assert np.allclose(comps, want, atol=1e-12)
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-12)
    # dominant direction recovered (up to sign already fixed)
    assert abs(float(np.dot(comps[0], direction))) > 0.999
    # projections match x·w − mean·w
    got = {
        (r["vec_id"], r["comp"]): r["value"] for r in proj.collect()
    }
    mean = mat_mean = None
    mean = s1 / n / QUANT
    for i in range(60):
        for c in range(2):
            want_v = float(np.dot(mat[i], comps[c]) - np.dot(mean, comps[c]))
            assert got[(i, c)] == pytest.approx(want_v, abs=1e-9)
    with _pytest.raises(ValueError):
        pca_project(emb, dim=4, k=0)
    with _pytest.raises(ValueError):
        pca_project(emb, dim=4, k=5)


def test_bloom_filter_matches_hashlib_replay(spark):
    """Bloom words == a hashlib replay; members are ALWAYS flagged
    (no false negatives); a shard-built pair of filters BIT_ORs to
    the whole-corpus filter; guards raise."""
    import pytest as _pytest

    from linkgraph.pipeline import bloom_build, bloom_probe

    m_bits, k, seed = 256, 3, 5
    keys = [f"key{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in keys], "key string")
    bloom = bloom_build(df, "key", m_bits=m_bits, k=k, seed=seed)
    got = {r["word"]: r["bits"] for r in bloom.collect()}
    want: dict[int, int] = {}
    for v in keys:
        for j in range(k):
            p = _md5_int(f"{seed}:{j}:{v}", 8) % m_bits
            want[p // 32] = want.get(p // 32, 0) | (1 << (p % 32))
    assert got == want
    probes = spark.createDataFrame(
        [(v,) for v in keys + [f"nope{i}" for i in range(60)]], "key string"
    )
    res = {
        r["value"]: r["maybe_member"]
        for r in bloom_probe(bloom, probes, "key", m_bits=m_bits, k=k, seed=seed).collect()
    }
    assert all(res[v] for v in keys)  # no false negatives, ever
    # replay the probe decision for the non-members too
    for v in (f"nope{i}" for i in range(60)):
        bits_ok = all(
            (want.get((_md5_int(f"{seed}:{j}:{v}", 8) % m_bits) // 32, 0)
             >> ((_md5_int(f"{seed}:{j}:{v}", 8) % m_bits) % 32)) & 1
            for j in range(k)
        )
        assert res[v] == bits_ok
    # mergeability: shard filters BIT_OR to the whole
    h1 = bloom_build(df.where(F.col("key") < "key3"), "key", m_bits=m_bits, k=k, seed=seed)
    h2 = bloom_build(df.where(F.col("key") >= "key3"), "key", m_bits=m_bits, k=k, seed=seed)
    merged = {
        r["word"]: r["bits"]
        for r in h1.unionByName(h2).groupBy("word").agg(F.bit_or("bits").alias("bits")).collect()
    }
    assert merged == want
    with _pytest.raises(ValueError):
        bloom_build(df, "key", m_bits=100)  # not a multiple of 32
    with _pytest.raises(ValueError):
        bloom_build(df, "key", k=0)


def test_event_transitions_matches_replay(spark):
    """Transition table == a sequential per-user replay with the
    (ts, event_id) order; probs row-normalize to 1 per from-state."""
    from collections import Counter, defaultdict

    from linkgraph.pipeline import event_transitions

    rows = [
        # user, ts-second, event_id, type — includes a simultaneous
        # pair (tie broken by event_id)
        (1, 0, 10, "a"), (1, 5, 11, "b"), (1, 5, 12, "c"), (1, 9, 13, "a"),
        (2, 0, 20, "b"), (2, 1, 21, "b"),
        (3, 0, 30, "a"),  # single event: no transitions
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "sec", "event_id", "event_type"])
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf["sec"], unit="s")
    df = spark.createDataFrame(pdf[["user_id", "ts", "event_id", "event_type"]])
    got = {
        (r["from_type"], r["to_type"]): (r["cnt"], r["prob"])
        for r in event_transitions(df).collect()
    }
    want = Counter()
    by_user = defaultdict(list)
    for u, sec, eid, t in rows:
        by_user[u].append((sec, eid, t))
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    marg = Counter()
    for (a, _), c in want.items():
        marg[a] += c
    assert set(got) == set(want)
    for k, c in want.items():
        assert got[k] == (c, c / marg[k[0]])
    # row-normalization
    from collections import defaultdict as dd

    sums = dd(float)
    for (a, _), (_, p) in got.items():
        sums[a] += p
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values())


def test_zorder_key_matches_replay_and_locality(spark):
    """zkey == the Morton replay for 2 and 3 columns; guards raise;
    and the locality property: sorting by zkey keeps both dimensions'
    ranges small within blocks (the pruning rationale)."""
    import pytest as _pytest

    from linkgraph.pipeline import zorder_key

    def morton(vals, bits):
        z = 0
        n = len(vals)
        for c, v in enumerate(vals):
            for i in range(bits):
                z |= ((v >> i) & 1) << (i * n + c)
        return z

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["zkey"] for r in zorder_key(df, ["x", "y"], bits=3).collect()}
    assert got == {(x, y): morton([x, y], 3) for x, y in pts}
    df3 = spark.createDataFrame([(1, 2, 3), (7, 6, 5)], "a long, b long, c long")
    got3 = {
        (r["a"], r["b"], r["c"]): r["zkey"]
        for r in zorder_key(df3, ["a", "b", "c"], bits=4).collect()
    }
    assert got3 == {t: morton(list(t), 4) for t in [(1, 2, 3), (7, 6, 5)]}
    # locality: each 16-row block of the zkey order spans a 4x4 tile
    ordered = sorted(pts, key=lambda t: morton(list(t), 3))
    for b in range(4):
        block = ordered[b * 16 : (b + 1) * 16]
        xs = [x for x, _ in block]
        ys = [y for _, y in block]
        assert max(xs) - min(xs) <= 3 and max(ys) - min(ys) <= 3
    with _pytest.raises(ValueError):
        zorder_key(df, ["x"], bits=3)
    with _pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_repetition_signals_matches_python_replay(spark):
    """(top, dup) n-gram fractions == a pure-Python replay with exact
    interval-union coverage; overlap case pins union != Σcount·n."""
    from collections import Counter

    import pytest as _pytest

    from linkgraph.pipeline import repetition_signals

    texts = [
        "a b a b a b",          # overlapping dups: union = all 6 words
        "x y z w",              # no dups
        "p p q r p p s t",      # two disjoint dup islands
        "q q q q q",            # single repeated token
        "one two",              # shorter than n for n>=3
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ns = (2, 3)
    got = {
        (r["doc_id"], r["n"]): (r["top_ngram_frac"], r["dup_ngram_frac"])
        for r in repetition_signals(df, ns=ns).collect()
    }
    for i, t in enumerate(texts):
        words = t.split()
        nw = len(words)
        for n in ns:
            if nw < n:
                assert got[(i, n)] == (0.0, 0.0)
                continue
            grams = [" ".join(words[j : j + n]) for j in range(nw - n + 1)]
            cnt = Counter(grams)
            top = round(max(cnt.values()) * n / nw, 9)
            covered = set()
            for j, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered.update(range(j, j + n))
            dup = round(len(covered) / nw, 9)
            assert got[(i, n)] == (top, dup), (i, n, got[(i, n)], (top, dup))
    # overlap pin: doc 0 at n=2 has 5 dup gram occurrences (Σ c·n = 10
    # > 6 words) but union coverage is exactly 1.0
    assert got[(0, 2)][1] == 1.0
    with _pytest.raises(ValueError):
        repetition_signals(df, ns=())
    with _pytest.raises(ValueError):
        repetition_signals(df, ns=(1,))


def test_bpe_learn_matches_sequential_replay(spark):
    """Learned merges == a classic sequential BPE replay (word-freq
    weighted, greedy left-to-right, (cnt DESC, pair) ties); the
    overlapping-pair closed form pins the encoding's merge order."""
    from collections import Counter

    import pytest as _pytest

    from linkgraph.pipeline import bpe_learn

    def replay(texts, k):
        freqs = Counter(w for t in texts for w in t.split())
        state = {w: tuple(w) for w in freqs}
        merges = []
        for step in range(1, k + 1):
            cnt = Counter()
            for w, syms in state.items():
                for a, b in zip(syms, syms[1:]):
                    cnt[(a, b)] += freqs[w]
            if not cnt:
                break
            (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((step, a, b, c))
            new_state = {}
            for w, syms in state.items():
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_state[w] = tuple(out)
            state = new_state
        return merges, state

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa abab",  # overlap cases
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    res = bpe_learn(df, n_merges=6)
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in res.merges.orderBy("step").collect()
    ]
    want_merges, want_state = replay(texts, 6)
    assert got == want_merges
    # final vocab symbolization matches too
    vocab = {
        tuple(r["ws"].strip("~").split("~~")): r["freq"]
        for r in res.vocab.collect()
    }
    freqs = Counter(w for t in texts for w in t.split())
    assert vocab == {tuple(s): freqs[w] for w, s in want_state.items()}

    # pure-overlap closed form: "aaaa" alone merges (a,a) then (aa,aa)
    df2 = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    res2 = bpe_learn(df2, n_merges=2)
    got2 = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in res2.merges.orderBy("step").collect()
    ]
    assert got2 == [(1, "a", "a", 3), (2, "aa", "aa", 1)]
    assert [r["ws"] for r in res2.vocab.collect()] == ["~aaaa~"]

    with _pytest.raises(ValueError):
        bpe_learn(df2, n_merges=0)
    df3 = spark.createDataFrame([(0, "bad~word")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bpe_learn(df3, n_merges=1)


def test_bpe_encode_matches_sequential_apply(spark):
    """Per-doc token counts == applying the merge list sequentially
    (greedy left-to-right per merge) to every word; learn∘encode on
    the training corpus reproduces the final vocab sizes; guard."""
    import pytest as _pytest

    from linkgraph.pipeline import bpe_encode, bpe_learn

    texts = ["low lower lowest", "aaaa abab low", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    res = bpe_learn(df, n_merges=4)
    merges = [
        (r["left"], r["right"]) for r in res.merges.orderBy("step").collect()
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode(df, merges).collect()
    }

    def apply(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        words = t.split()
        assert got[i] == (len(words), sum(apply(w) for w in words)), (i, got[i])
    with _pytest.raises(ValueError):
        bpe_encode(df, [("a~", "b")])


def test_pq_codes_matches_numpy_replay(spark):
    """PQ codes == a numpy Lloyd replay per subspace (exact code
    equality, the kmeans determinism contract); quantizing with the
    codebooks reduces reconstruction error vs the global mean;
    guards raise."""
    import numpy as np
    import pytest as _pytest

    from linkgraph.pipeline import pq_codes

    rng = np.random.default_rng(3)
    mat = rng.normal(0, 1.0, size=(60, 8))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_sub, k, rounds = 2, 4, 2
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_codes(emb, n_subspaces=n_sub, k=k, rounds=rounds).collect()
    }

    def lloyd(x):
        cent = x[:k].copy()  # smallest-k ids init
        for r in range(rounds):
            d = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
            assign = np.argmin(d, axis=1)  # ties: smallest cluster id
            if r < rounds - 1:
                for c in range(k):
                    if (assign == c).any():
                        cent[c] = x[assign == c].mean(0)
        return assign

    err_pq, err_mean = 0.0, 0.0
    for s in range(n_sub):
        x = mat[:, s * 4 : (s + 1) * 4]
        assign = lloyd(x)
        for i in range(60):
            assert got[(i, s)] == assign[i], (i, s)
        cent = np.array([x[assign == c].mean(0) if (assign == c).any() else x[c]
                         for c in range(k)])
        err_pq += float(((x - cent[assign]) ** 2).sum())
        err_mean += float(((x - x.mean(0)) ** 2).sum())
    assert err_pq < err_mean
    with _pytest.raises(ValueError):
        pq_codes(emb, n_subspaces=3)  # does not divide dim 8
    with _pytest.raises(ValueError):
        pq_codes(emb.where("vec_id < 0"), n_subspaces=2)


def test_simhash_near_pairs_complete_within_radius(spark):
    """Band-bucketed pairs == ALL pairs within the Hamming radius (a
    brute-force simhash-distance replay — the pigeonhole guarantee
    means zero missed pairs); popcounts exact; guards raise."""
    import pytest as _pytest

    from linkgraph.pipeline import simhash, simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} shared words body common {'x' * (i % 3)}")
         for i in range(40)],
        "doc_id long, text string",
    )
    hashes = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    for mh in (1, 2, 3):
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_near_pairs(docs, bits=16, max_hamming=mh).collect()
        }
        want = {}
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = bin(hashes[a] ^ hashes[b]).count("1")
                if d <= mh:
                    want[(a, b)] = d
        assert got == want  # complete AND exact — nothing missed
    # mega-bucket guard drops everything when max_bucket is tiny
    assert (
        simhash_near_pairs(docs, bits=16, max_hamming=1, max_bucket=1).count() == 0
    )
    with _pytest.raises(ValueError):
        simhash_near_pairs(docs, bits=16, max_hamming=0)
    with _pytest.raises(ValueError):
        simhash_near_pairs(docs, bits=4, max_hamming=4)


def test_hll_distinct_by_matches_ungrouped_per_group(spark):
    """Grouped HLL per group == running hll_distinct on that group's
    values alone (identical registers, z, zeros, estimate)."""
    from linkgraph.pipeline import hll_distinct, hll_distinct_by

    vals = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("k"), "id").alias("term"),
    )
    got = {
        r["grp"]: (r["m"], r["z_scaled"], r["zero_buckets"], r["estimate"])
        for r in hll_distinct_by(vals, "grp", b=6, seed=2).collect()
    }
    for g in ("0", "1", "2"):
        _, est = hll_distinct(vals.where(F.col("grp") == g), b=6, seed=2)
        r = est.collect()[0]
        assert got[g] == (
            r["m"], r["z_scaled"], r["zero_buckets"], r["estimate"]
        ), g


def test_session_paths_matches_replay(spark):
    """Ranked paths == a sequential sessionize-and-count replay
    (same gap rule, same (ts, event_id) order, same truncation,
    same tie-break); guards raise."""
    import pandas as pd
    import pytest as _pytest

    from linkgraph.pipeline import session_paths

    rows = [
        # user, minute, event_id, type
        (1, 0, 1, "a"), (1, 5, 2, "b"), (1, 100, 3, "c"),  # 2 sessions
        (2, 0, 4, "a"), (2, 5, 5, "b"),
        (3, 0, 6, "a"), (3, 1, 7, "b"), (3, 2, 8, "c"), (3, 3, 9, "d"),
        (4, 0, 10, "a"), (4, 0, 11, "b"),  # simultaneous: id order
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "minute", "event_id", "event_type"])
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf["minute"], unit="m")
    df = spark.createDataFrame(pdf[["user_id", "ts", "event_id", "event_type"]])
    got = [
        (r["path"], r["n_sessions"], r["rank"])
        for r in session_paths(df, gap_minutes=30, max_len=3, k=10)
        .orderBy("rank").collect()
    ]
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for u, m, eid, t in rows:
        by_user[u].append((m, eid, t))
    cnt = Counter()
    for u, evs in by_user.items():
        evs.sort()
        cur = []
        last = None
        for m, eid, t in evs:
            if last is not None and (m - last) * 60_000_000 >= 30 * 60 * 1_000_000:
                cnt[">".join(cur[:3])] += 1
                cur = []
            cur.append(t)
            last = m
        if cur:
            cnt[">".join(cur[:3])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(p, c, i + 1) for i, (p, c) in enumerate(want)]
    assert got == want
    # truncation: user 3's 4-event session reports a 3-step path
    assert any(p == "a>b>c" for p, _, _ in got)
    with _pytest.raises(ValueError):
        session_paths(df, gap_minutes=0)
    with _pytest.raises(ValueError):
        session_paths(df, max_len=0)


def test_mask_tokens_matches_hashlib_replay(spark):
    """Masked positions == a hashlib membership replay; labels align
    with positions; rate 0/1 closed forms; repartition-stable;
    guard raises."""
    import pytest as _pytest

    from linkgraph.pipeline import mask_tokens

    texts = ["alpha beta gamma delta epsilon zeta", "one", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rate, seed = 0.4, 3
    thr = int(rate * (1 << 32))
    got = {r["doc_id"]: r.asDict() for r in mask_tokens(df, rate, seed).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        masked = [
            j for j in range(len(words))
            if _md5_int(f"{seed}:{i}:{j}", 8) < thr
        ]
        want_text = " ".join(
            "[MASK]" if j in masked else w for j, w in enumerate(words)
        )
        want_labels = " ".join(f"{j}:{words[j]}" for j in masked)
        g = got[i]
        assert g["masked_text"] == want_text
        assert g["labels"] == want_labels
        assert g["n_tokens"] == len(words) and g["n_masked"] == len(masked)
    # closed forms + layout independence
    all_m = mask_tokens(df, 1.0, seed).collect()
    assert all(r["n_masked"] == r["n_tokens"] for r in all_m)
    none_m = mask_tokens(df, 0.0, seed).collect()
    assert all(r["n_masked"] == 0 for r in none_m)
    re = {
        r["doc_id"]: r["masked_text"]
        for r in mask_tokens(df.repartition(7), rate, seed).collect()
    }
    assert re == {r["doc_id"]: r["masked_text"] for r in mask_tokens(df, rate, seed).collect()}
    with _pytest.raises(ValueError):
        mask_tokens(df, rate=1.5)


def test_skipgram_pairs_matches_replay(spark):
    """Pair counts == a Counter replay over all in-window ordered
    pairs; window truncation at doc edges; guard raises."""
    from collections import Counter

    import pytest as _pytest

    from linkgraph.pipeline import skipgram_pairs

    texts = ["a b c a b", "x y", "solo", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for window in (1, 2):
        got = {
            (r["center"], r["context"]): r["cnt"]
            for r in skipgram_pairs(df, window=window).collect()
        }
        want = Counter()
        for t in texts:
            ws = t.split()
            for i, c in enumerate(ws):
                for j in range(max(0, i - window), min(len(ws), i + window + 1)):
                    if j != i:
                        want[(c, ws[j])] += 1
        assert got == dict(want), window
    # min_count cut (recompute the window-1 truth — the loop exits
    # with window-2 counts in `want`)
    want1 = Counter()
    for t in texts:
        ws = t.split()
        for i, c in enumerate(ws):
            for j in range(max(0, i - 1), min(len(ws), i + 2)):
                if j != i:
                    want1[(c, ws[j])] += 1
    got2 = {
        (r["center"], r["context"])
        for r in skipgram_pairs(df, window=1, min_count=2).collect()
    }
    assert got2 == {p for p, c in want1.items() if c >= 2}
    with _pytest.raises(ValueError):
        skipgram_pairs(df, window=0)


# ---------------------------------------------------------------------------
# fold_split
# ---------------------------------------------------------------------------


def _fold_h32(seed: int, doc_id) -> int:
    return int(
        hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16
    )


def test_fold_split_matches_hashlib_replay(spark):
    """Fold assignment must equal the boundary arithmetic replayed with
    hashlib, be exhaustive, and be stable under repartitioning."""
    from linkgraph.pipeline import fold_split

    ids = list(range(500))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    folds = {"train": 0.8, "val": 0.1, "test": 0.1}
    seed = 7
    out = fold_split(docs, folds, seed=seed)
    got = {r["doc_id"]: r["fold"] for r in out.collect()}
    b_train = int(0.8 * (1 << 32))
    b_val = int(0.9 * (1 << 32))
    for i in ids:
        h = _fold_h32(seed, i)
        want = "train" if h < b_train else ("val" if h < b_val else "test")
        assert got[i] == want, i
    assert len(got) == len(ids)  # exhaustive: one fold per row
    # layout-independence
    got8 = {
        r["doc_id"]: r["fold"]
        for r in fold_split(docs.repartition(8), folds, seed=seed).collect()
    }
    assert got8 == got
    # seed sensitivity: a different seed moves at least one document
    got_s = {
        r["doc_id"]: r["fold"] for r in fold_split(docs, folds, seed=8).collect()
    }
    assert got_s != got


def test_fold_split_validates_fractions(spark):
    from linkgraph.pipeline import fold_split

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        fold_split(docs, {"a": 0.5, "b": 0.4})  # sums to 0.9
    with pytest.raises(ValueError):
        fold_split(docs, {})
    with pytest.raises(ValueError):
        fold_split(docs, {"a": 1.5, "b": -0.5})


# ---------------------------------------------------------------------------
# url_filter
# ---------------------------------------------------------------------------


def test_url_filter_domain_and_keyword_rules(spark):
    """Blocklist matches host dot-suffixes only (never substrings);
    kw_hits counts exact substring occurrences; keep combines both."""
    from linkgraph.pipeline import url_filter

    urls = [
        "http://ads.example.com/x",        # subdomain of blocked
        "https://example.com/",            # exact blocked
        "https://notexample.com/page",     # NOT blocked (substring only)
        "http://good.org/casino/poker",    # 2 keyword hits
        "http://good.org/CASINO",          # case-insensitive hit
        "plain-text-not-a-url",            # invalid: host '', kept
        "https://ok.net:8080/a?x=1",       # port stripped from host
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = url_filter(
        df,
        blocked_domains=["example.com", "bad.org"],
        blocked_keywords=["casino", "poker"],
        max_kw_hits=1,
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows["http://ads.example.com/x"]["blocked_domain"] == "example.com"
    assert not rows["http://ads.example.com/x"]["keep"]
    assert rows["https://example.com/"]["blocked_domain"] == "example.com"
    assert rows["https://notexample.com/page"]["blocked_domain"] is None
    assert rows["https://notexample.com/page"]["keep"]
    r = rows["http://good.org/casino/poker"]
    assert r["blocked_domain"] is None and r["kw_hits"] == 2 and not r["keep"]
    r = rows["http://good.org/CASINO"]
    assert r["kw_hits"] == 1 and r["keep"]  # <= max_kw_hits
    r = rows["plain-text-not-a-url"]
    assert r["host"] == "" and r["blocked_domain"] is None and r["keep"]
    assert rows["https://ok.net:8080/a?x=1"]["host"] == "ok.net"


def test_url_filter_matches_python_replay(spark):
    """Full-row replay: suffix blocking + substring counting in pure
    Python over a deterministic url set."""
    from linkgraph.pipeline import url_filter

    blocked = ["spam.example", "tracker.io"]
    kws = ["win", "free"]
    urls = [
        f"http://h{i % 5}.{'spam.example' if i % 3 == 0 else 'site.org'}"
        f"/p{i}{'?win=free' if i % 4 == 0 else ''}"
        for i in range(60)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: (r["blocked_domain"], r["kw_hits"], r["keep"])
        for r in url_filter(df, blocked, kws, max_kw_hits=0).collect()
    }
    for u in urls:
        host = u.split("://")[1].split("/")[0].lower()
        labels = host.split(".")
        sufs = {".".join(labels[i:]) for i in range(len(labels))}
        bd = min((b for b in blocked if b in sufs), default=None)
        lo = u.lower()
        hits = sum(lo.count(k) for k in kws)
        assert got[u] == (bd, hits, bd is None and hits == 0), u


def test_url_filter_rejects_empty_keyword(spark):
    """r5 ADVICE fix: an empty blocked keyword would divide the
    occurrence count by len(kw)=0 (NULL kw_hits, NULL keep) — it must
    be rejected up front."""
    from linkgraph.pipeline import url_filter

    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    with pytest.raises(ValueError, match="non-empty"):
        url_filter(df, ["bad.com"], blocked_keywords=[""])
    with pytest.raises(ValueError, match="non-empty"):
        url_filter(df, ["bad.com"], blocked_keywords=["ok", ""])
