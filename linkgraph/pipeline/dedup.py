"""Deduplication operators over a documents(doc_id, text, ...) table.

Hashing parity note: every hash in this module is derived from
``md5`` so the DuckDB oracles can reproduce values bit-for-bit:
h32(s) = int(md5(s)[:8 hex], 16) — in Spark
``conv(substring(md5(encode(s,'utf-8')),1,8),16,10)``, in DuckDB
``('0x' || substr(md5(s),1,8))::BIGINT``. MinHash permutations are
the classic (a*h + b) mod p family with fixed deterministic (a_i,b_i)
and p = 4294967311 (smallest prime > 2^32).

Everything is built-in expressions (explode/groupBy/min/window); the
shuffles are keyed on (doc_id) or (shingle) and combine map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_P = 4_294_967_311  # smallest prime > 2^32


def minhash_params(num_hashes: int) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) permutation parameters shared with the
    SQL oracles."""
    return [(i, 2 * i + 1, 1_000_003 * i + 12_345) for i in range(num_hashes)]


def h32(col: Column) -> Column:
    """32-bit integer hash of a string column via md5 prefix (portable
    to DuckDB — see module docstring)."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5 content groups -> (text_hash, n_docs, keep_id)
    where keep_id is the canonical (minimum) doc id of the group."""
    return (
        docs.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def char_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-character shingles per document.
    Pure built-ins: sequence + transform + explode (no Python)."""
    return (
        docs.where(F.length("text") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(1, length(text) - {k - 1}), i -> substring(text, i, {k}))")
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, k: int = 3
) -> DataFrame:
    """Long-format MinHash signature: (doc_id, hash_idx, min_hash).
    min_hash = min over the doc's shingles of (a_i * h32(shingle) + b_i)
    mod p."""
    spark = docs.sparkSession
    params = spark.createDataFrame(
        minhash_params(num_hashes), "hash_idx int, a long, b long"
    )
    sh = char_shingles(docs, k).select("doc_id", h32(F.col("shingle")).alias("h"))
    return (
        sh.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "hash_idx")
        .agg(
            F.min(
                F.pmod(F.col("a") * F.col("h") + F.col("b"), F.lit(MINHASH_P))
            ).alias("min_hash")
        )
    )


def band_frame(sig: DataFrame, band_rows: int = 2) -> DataFrame:
    """(doc_id, band_id, band_sig) — the LSH banding of a long-format
    minhash_signatures() frame. Factored out of lsh_candidate_pairs so
    scale tooling (tools/bench_dedup_scale.py) can measure bucket-size
    distributions — Σ bucket² is the candidate-join's true cost — from
    EXACTLY the frame the join uses, not a re-derivation that could
    drift."""
    return sig.groupBy(
        "doc_id", (F.col("hash_idx") / band_rows).cast("int").alias("band_id")
    ).agg(
        F.concat_ws(
            ":", F.sort_array(F.collect_list(F.concat_ws("=", "hash_idx", "min_hash")))
        ).alias("band_sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_rows: int = 2,
    k: int = 3,
    max_bucket: int | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH banding: split the signature into bands of
    `band_rows` hashes; docs sharing ANY band signature become a
    candidate pair. Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    Scale path: the join key is (band_id, band_sig) — buckets, not
    documents — so the shuffle is bounded by Σ bucket², never n².
    That bound degenerates on template-heavy corpora (measured on the
    sf0.1 synthetic documents: 5000 docs → 7.57M candidate pairs, 60%
    of all possible pairs, because near-identical templates collapse
    into a few giant buckets). `max_bucket` guards that regime — the
    bucket-size analogue of ngram_jaccard_pairs' `max_df` stop-shingle
    cutoff: buckets with more than `max_bucket` members are dropped
    before the self-join. Members of an oversized bucket are
    near-duplicates of a template; at 100 TB route them to
    exact/cluster dedup (the bucket signature itself identifies the
    group) rather than pairwise-expanding them. Default None preserves
    exact banding semantics (and the driver oracle).

    `sig`: optionally pass a precomputed minhash_signatures() frame
    (e.g. severed, when a caller also joins the signatures back —
    see minhash_jaccard_pairs)."""
    if sig is None:
        sig = minhash_signatures(docs, num_hashes, k)
    bands = band_frame(sig, band_rows)
    if max_bucket is not None:
        small = (
            bands.groupBy("band_id", "band_sig")
            .agg(F.count("*").alias("_bucket_n"))
            .where(F.col("_bucket_n") <= max_bucket)
            .select("band_id", "band_sig")
        )
        bands = bands.join(small, ["band_id", "band_sig"], "left_semi")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_sig")
    return (
        a.join(b, ["band_id", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_jaccard_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_rows: int = 2,
    k: int = 3,
    threshold: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """The full MinHash dedup decision stage: LSH candidate pairs +
    the ESTIMATED Jaccard = fraction of equal signature components
    (the Broder'97 estimator — E[matches/num_hashes] = J). Returns
    (doc_a, doc_b, jaccard_est) with jaccard_est >= threshold,
    9-decimal-rounded (matches/num_hashes is exact in binary for the
    default num_hashes=8, so both engines agree bit-for-bit).

    This is what replaces ngram_jaccard_pairs at 100 TB: the exact
    shingle-intersection join touches every shingle of every
    candidate; this touches num_hashes rows per side — the signature
    join is keyed on doc ids, candidates stay LSH-bounded
    (`max_bucket` guards the template-mega-bucket regime)."""
    from linkgraph.checkpoint import sever

    # severed: the signature feeds banding AND both estimate-join sides
    sig = sever(minhash_signatures(docs, num_hashes, k))
    cand = lsh_candidate_pairs(
        docs, num_hashes, band_rows, k, max_bucket=max_bucket, sig=sig
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "hash_idx", F.col("min_hash").alias("ha")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "hash_idx", F.col("min_hash").alias("hb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "hash_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.avg((F.col("ha") == F.col("hb")).cast("double")), 9
            ).alias("jaccard_est")
        )
        .where(F.col("jaccard_est") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash document fingerprint: per token-hash bit b, sum ±1 over
    tokens; bit set iff the sum is positive. Returns (doc_id, simhash).

    Two-level aggregation (doc × bit, then doc) — both combine
    map-side, no Python."""
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tok_h = tokens.select("doc_id", h32(F.col("tok")).alias("h"))
    per_bit = (
        tok_h.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
            "h",
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum(F.expr("(h >> bit) & 1") * 2 - 1).alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted
    index: pairs sharing >= 1 shingle get |A∩B| from the index join,
    |A|,|B| from per-doc shingle counts; jaccard = inter/(|A|+|B|-inter).
    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold, rounded
    to 9 decimals for order-insensitive comparison.

    max_df is the stop-shingle guard for scale: the inverted-index
    self-join costs Σ_shingle df² rows, so one ubiquitous shingle
    (" th" at web scale is a multi-billion-row bucket) is quadratic.
    Shingles with document frequency > max_df are dropped BEFORE the
    join *and* excluded from the per-doc sizes, so the result is the
    exact Jaccard over the discriminative-shingle space (the standard
    stop-shingle mitigation; near-universal shingles carry no dedup
    signal — every pair shares them — so scores shift only slightly
    toward the rare-shingle overlap). max_df=None keeps the fully
    exact small-input semantics."""
    sh = char_shingles(docs, k).persist()
    try:
        if max_df is not None:
            df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
            sh_kept = (
                sh.join(df_counts.where(F.col("df") <= max_df), "shingle")
                .select("doc_id", "shingle")
                .persist()
            )
        else:
            sh_kept = sh
        sizes = sh_kept.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        a = sh_kept.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh_kept.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 9
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
        out = out.localCheckpoint(eager=True)
    finally:
        sh.unpersist()
        if max_df is not None:
            sh_kept.unpersist()
    return out


def dedup_clusters(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    max_iter: int = 1000,
) -> DataFrame:
    """Near-duplicate clusters: connected components over the exact
    n-gram-Jaccard pair graph. Returns (doc_id, cluster) for EVERY
    document — cluster = min doc_id in its component (hash-min CC
    fixpoint); documents with no qualifying pair are singletons.

    This is the canonical "pick one per duplicate group" step after
    pair finding: pairs alone don't dedup (near-dup is not transitive
    but clustering must be), so production pipelines cluster pairs and
    keep one representative per cluster. The pair graph comes from the
    inverted-index join (stop-shingle guard via max_df, same as
    ngram_jaccard_pairs); the clustering reuses the engine's own CC
    kernel (kernels/cc.py hash-min label propagation, edge_map
    push/pull dispatch) — the link-graph and the LLM-pipeline halves of
    the library composed into one job. At 100 TB both stages are
    shuffle-safe: the pair join is bucket-keyed, and CC rounds are
    hash-partitioned joins with broadcast small-frontier dispatch.
    """
    from linkgraph.build import build_graph_from_edges
    from linkgraph.kernels.cc import connected_components

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold, max_df=max_df)
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
    )
    vertices = docs.select(F.col("doc_id").cast("long").alias("id")).distinct()
    g = build_graph_from_edges(edges, vertices=vertices)
    try:
        res = connected_components(g, max_iter=max_iter)
        # res.df is severed (localCheckpoint) — safe to drop the pair
        # graph's caches so repeated pipeline calls don't leak blocks
        return res.df.select(
            F.col("id").alias("doc_id"), F.col("comp").alias("cluster")
        )
    finally:
        g.unpersist()


# CCNet-style normalization (Wenzek et al. LREC'20 §4.1), restricted
# to its portable-ASCII subset so Java regex (Spark), RE2 (DuckDB) and
# Python `re` transform identically: lowercase, digits -> 0, ASCII
# punctuation stripped, whitespace collapsed, trimmed. (CCNet also
# strips accents via NFD — locale/ICU-dependent, deliberately out of
# the cross-engine contract and documented here.)
NORM_DIGITS = "[0-9]"
NORM_PUNCT = "[!-/:-@\\[-`{-~]"  # the four ASCII punctuation runs
NORM_WS = "[ \\t\\n\\r\\f]+"


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, norm) — the CCNet-normalized text (one codegen
    projection, no shuffle; patterns shared with the oracle and the
    pytest replay via the NORM_* constants)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), NORM_DIGITS, "0"),
                NORM_PUNCT,
                "",
            ),
            NORM_WS,
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm"))


def normalized_dup_groups(docs: DataFrame) -> DataFrame:
    """Normalized exact dedup (the CCNet paragraph-hash move): md5
    groups over normalize_text -> (norm_hash, n_docs, keep_id), the
    exact_dup_groups shape — documents differing only in case, ASCII
    punctuation, digits, or whitespace collapse into one group.

    Plan shape: one codegen normalization projection on the scan +
    one hash-keyed groupBy (map-side combine) — identical 100 TB
    profile to exact_dup_groups."""
    return (
        normalize_text(docs)
        .select("doc_id", F.md5(F.encode("norm", "utf-8")).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """SimHash near-duplicate pairs (Manku, Jain & Das Sarma WWW'07 —
    Google's web near-dup detector): documents whose simhashes differ
    in at most `max_hamming` bits. The WWW'07 band trick makes it
    bucketed, never n²: split the fingerprint into max_hamming + 1
    bands — by pigeonhole, any pair within the Hamming radius agrees
    EXACTLY on at least one band — so candidates come from
    (band, band_bits) bucket self-joins and only candidates pay the
    exact popcount verification (bit_count(xor) — pure int64, so rows
    are hash-exact).

      (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤ max_hamming.

    max_bucket: the LSH mega-bucket guard (dedup.py's measured
    Σ bucket² → n² failure mode): bands whose bucket exceeds it are
    dropped — recall trade documented, blow-up bounded."""
    if bits < 2 or not 1 <= max_hamming < bits:
        raise ValueError("need bits >= 2 and 1 <= max_hamming < bits")
    n_bands = max_hamming + 1
    base = bits // n_bands
    extra = bits % n_bands
    # band b covers [off_b, off_b + len_b): first `extra` bands one
    # bit longer — all bits covered exactly once
    offs, lens = [], []
    off = 0
    for b in range(n_bands):
        ln = base + (1 if b < extra else 0)
        offs.append(off)
        lens.append(ln)
        off += ln
    sh = simhash(docs, bits=bits)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftright(simhash, {offs[b]}) & {(1 << lens[b]) - 1}"
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket is not None:
        sizes = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bs"))
        bands = bands.join(
            sizes.where(F.col("bs") <= max_bucket).select("band", "key"),
            ["band", "key"],
        )
    a = bands.select("band", "key", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = bands.select("band", "key", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(ha ^ hb)").cast("long").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
