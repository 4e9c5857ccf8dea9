"""Text analysis over documents(doc_id, text, lang, ...): token
counting, quality scoring, and a language-ID heuristic — all built-in
string expressions (no Python), each reproducible in ANSI SQL for the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed marker lists shared with the SQL oracles
STOPWORDS = ("the", "a", "and", "of", "to")
PUNCT = ".,!?;:"

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and"),
    "de": ("der", "und"),
    "fr": ("le", "et"),
    "es": ("el", "y"),
    "zh": ("de", "shi"),
}


def _count_occurrences(text_col, needle: str):
    """Occurrences of ' needle ' in ' '||text||' ' via length arithmetic
    (portable: identical semantics in Spark and DuckDB replace())."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    target = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(target), F.lit(""))))
        / len(target)
    ).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, punct_cnt,
    stopword_cnt, quality_score). quality_score is a deterministic
    [0,1]-ish blend: stopword ratio + length band + punctuation
    sanity — the classic cheap web-text quality heuristics."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chars = F.length("text")
    punct_cnt = F.length("text") - F.length(
        F.regexp_replace("text", f"[{PUNCT}]", "")
    )
    stopword_cnt = None
    for sw in STOPWORDS:
        c = _count_occurrences(F.col("text"), sw)
        stopword_cnt = c if stopword_cnt is None else stopword_cnt + c
    # long, not int: downstream oracles (DuckDB length() -> BIGINT)
    # compare dtype-for-dtype through Arrow, and int32 vs int64 is the
    # exact class of value-identical hash mismatch that bit simhash.
    df = docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        punct_cnt.cast("long").alias("punct_cnt"),
        stopword_cnt.cast("long").alias("stopword_cnt"),
    )
    avg_tok = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(
        F.col("n_tokens") > 0, F.col("stopword_cnt") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    len_band = F.when((F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000), 1.0).otherwise(0.0)
    punct_ok = F.when(
        F.col("n_chars") > 0,
        F.when(F.col("punct_cnt") / F.col("n_chars") < 0.1, 1.0).otherwise(0.0),
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.round(avg_tok, 9).alias("avg_token_len"),
        "punct_cnt",
        "stopword_cnt",
        F.round(
            0.5 * F.least(sw_ratio * 5, F.lit(1.0)) + 0.3 * len_band + 0.2 * punct_ok, 9
        ).alias("quality_score"),
    )


# BPE-ish pre-tokenizer regex (the GPT-2 pattern's portable core:
# optional leading space + letter run | digit run | punct run, else
# whitespace runs). Deliberately NO lookahead and ASCII classes only,
# so Java regex (Spark), RE2 (DuckDB), and Python `re` tokenize
# byte-identically; alternation is first-match in all three.
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens_ws, n_tokens_bpe, chars_per_token): token
    counting with both the whitespace tokenizer and a BPE-ish
    pre-tokenizer regex — the LM-budgeting view of a corpus
    (chars/token is the standard compression ratio proxy).
    Whole-stage-codegen projection (regexp_extract_all + size), no
    shuffle, trivially scan-parallel."""
    ws = F.split(F.trim(F.col("text")), r"\s+")
    n_ws = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(ws)
    )
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        "doc_id",
        n_ws.cast("long").alias("n_tokens_ws"),
        n_bpe.cast("long").alias("n_tokens_bpe"),
        F.round(
            F.when(
                n_bpe > 0, F.length("text").cast("long") / n_bpe.cast("long")
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("chars_per_token"),
    )


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_dup_word_frac: float = 0.90,
    max_top_bigram_frac: float = 0.20,
    max_symbol_ratio: float = 0.10,
) -> DataFrame:
    """Gopher-style repetition / quality signals per document (Rae et
    al. 2021, the public web-text filter rules; word-level subset —
    line-based signals are degenerate on a single-line corpus):

      (doc_id, n_words, mean_word_len, dup_word_frac,
       top_bigram_char_frac, symbol_word_ratio, keep)

    * dup_word_frac: 1 − distinct/total word occurrences — the cheap
      proxy for Gopher's duplicate-n-gram family.
    * top_bigram_char_frac: characters covered by the most frequent
      word bigram (count × bigram length) over total characters —
      Gopher's top-2-gram repetition signal.
    * symbol_word_ratio: ('#' chars + '...' occurrences) per word —
      Gopher's symbol screens.
    * keep: every threshold passes, evaluated on the ROUNDED metrics
      so the flag is engine-reproducible bit-for-bit.

    Scale shape: the per-doc scalars are one whole-stage-codegen
    projection (split + array_distinct, no shuffle); the bigram mode
    is explode → two hash aggs keyed by doc (map-side combine, per-doc
    bounded cardinality) + one doc-keyed join back — no cross-doc
    joins anywhere, trivially partition-parallel at 100 TB.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_word_chars = F.length(F.regexp_replace("text", r"\s+", ""))
    hash_cnt = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    ell_cnt = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."), F.lit(""))))
        / 3
    ).cast("long")
    base = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        toks.alias("w"),
        n_words.cast("long").alias("n_words"),
        n_word_chars.cast("long").alias("n_word_chars"),
        (hash_cnt + ell_cnt).cast("long").alias("symbol_cnt"),
    )
    # most-frequent-bigram coverage: per-doc explode -> (doc, bigram)
    # count -> per-doc max(count * len). Bounded by doc length; both
    # aggs combine map-side on the doc key.
    bigrams = F.expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"
    )
    top = (
        base.where(F.col("n_words") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max(F.col("c") * F.length("bigram")).alias("top_chars"))
    )
    m = base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.round(
            F.when(
                F.col("n_words") > 0, F.col("n_word_chars") / F.col("n_words")
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("mean_word_len"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                1.0 - F.size(F.array_distinct("w")).cast("long") / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.col("top_chars") / F.col("n_chars"), F.lit(0.0)), 9
        ).alias("top_bigram_char_frac"),
        F.round(
            F.when(
                F.col("n_words") > 0, F.col("symbol_cnt") / F.col("n_words")
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("symbol_word_ratio"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_char_frac") <= max_top_bigram_frac)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
    )
    return m.select("*", keep.alias("keep"))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): deterministic marker-word scorer; argmax
    with ties broken by language code order. A stand-in for a real
    n-gram model — the operator shape (scored columns + greatest +
    chained when) is the point."""
    scores = {
        lang: sum(
            (_count_occurrences(F.col("text"), m) for m in markers),
            F.lit(0).cast("long"),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select(
        "doc_id", *[v.alias(f"s_{k}") for k, v in scores.items()]
    )
    langs = sorted(LANG_MARKERS)  # tie-break: alphabetical language code
    best = F.greatest(*[F.col(f"s_{k}") for k in langs])
    pred = None
    for k in langs:
        cond = F.col(f"s_{k}") == best
        pred = F.when(cond, F.lit(k)) if pred is None else pred.when(cond, F.lit(k))
    return df.select("doc_id", pred.alias("pred_lang"))


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic corpus-statistics
    keyword/topic-signal op (Salton & Buckley 1988; smooth idf per
    scikit-learn's TfidfTransformer: idf = ln((1+n)/(1+df)) + 1).

    Output: (doc_id, term, tf long, rank long, tfidf double), rank
    1..k per doc ordered by (tfidf DESC, term ASC). The score is
    ROUND(_, 9) BEFORE ranking and idf derives from int64 (n, df)
    through one fixed-order expression, so rank and score are
    engine-reproducible bit-for-bit (the feature_prop determinism
    lesson applied at the ranking boundary).

    Plan shape: explode -> (doc, term) hash agg (map-side combine) ->
    vocab-sized df agg -> broadcast join back -> per-doc rank window.
    The window partitions on doc_id with per-doc state bounded by the
    doc's distinct-term count — no global sort, 100 TB-safe. n_docs is
    one scalar agg (the pagerank-scalar pattern)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    n_docs = docs.count()
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).where(F.length("term") > 0)
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * idf, 9).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "rank", "tfidf")
    )


def _ws_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term) whitespace tokenization — the shared tokenizer of
    token_stats/tfidf_topk/vocab_stats/unigram_logprob (empty docs
    yield no rows)."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).where(F.length("term") > 0)


def vocab_stats(docs: DataFrame, k: int = 100) -> DataFrame:
    """Top-k corpus vocabulary: (term, df, cf, rank) — document
    frequency, corpus frequency, rank 1..k by (cf DESC, term ASC).
    The tokenizer-vocab / stopword-derivation view of a corpus (the
    seed statistics for BPE training and marker-list construction).

    Plan shape: explode -> (doc, term) hash agg -> vocab-sized
    (df, cf) agg -> orderBy(cf DESC, term).limit(k) = TakeOrdered
    (per-partition top-k + k-row driver merge, NO global sort) -> rank
    window over the k surviving rows only. All int64 — hash-exact."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tf = _ws_terms(docs).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    vocab = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
    top = vocab.orderBy(F.desc("cf"), F.asc("term")).limit(k)
    # rank window runs over <= k rows (post-limit) — bounded state
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    return top.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document unigram-LM surprisal — the cheap analogue of
    CCNet's perplexity quality filter (Wenzek et al. 2020), with the
    LM trained on the corpus itself (MLE, so every token has cf >= 1
    and there is no OOV/smoothing branch).

    Output (docs with >= 1 token; empty docs vanish at the explode):
      (doc_id, n_tokens, total_bits_e6, mean_bits)
    where bits(t) = -log2(cf(t)/T) is quantized ONCE per vocab term to
    int64 micro-bits (ROUND(bits*1e6) — HALF_UP, positive domain), so
    the per-doc totals are exact order-independent int64 SUMs and
    mean_bits = total_bits_e6 / (1e6 * n_tokens) is ONE correctly-
    rounded division — bit-identical across engines by construction
    (the feature_prop determinism contract; float summation across a
    doc's terms would be partial-sum-order-dependent). The only
    cross-engine float op is LN of int64 inputs inside the per-TERM
    quantization, where a 1-ulp libm divergence flips an integer only
    on a measure-zero boundary.

    Plan shape: explode -> (doc, term) hash agg (severed: it feeds the
    vocab agg, the T scalar, and the scoring join — one corpus scan,
    not three) -> vocab-sized cf agg -> broadcast bits table -> one
    doc-keyed agg. T is one scalar agg (the pagerank-scalar pattern).
    High mean_bits = rare-token-heavy (boilerplate/garbage or highly
    novel); low = repetitive/templated."""
    from linkgraph.checkpoint import sever

    tf = _ws_terms(docs).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf = sever(tf)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = vocab.agg(F.sum("cf")).first()[0]
    if total is None:
        total = 0  # empty corpus -> empty output below anyway
    bits = (F.log(F.lit(float(total))) - F.log(F.col("cf"))) / F.log(
        F.lit(2.0)
    )
    bits_tbl = vocab.select(
        "term",
        F.round(bits * F.lit(1000000.0), 0).cast("long").alias("bits_e6"),
    )
    agg = tf.join(F.broadcast(bits_tbl), "term").groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("bits_e6")).cast("long").alias("total_bits_e6"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "total_bits_e6",
        (
            F.col("total_bits_e6")
            / (F.lit(1000000.0) * F.col("n_tokens"))
        ).alias("mean_bits"),
    )


def pmi_topk(
    docs: DataFrame, window: int = 2, min_count: int = 5, k: int = 100
) -> DataFrame:
    """Top-k pointwise-mutual-information word pairs (Church & Hanks
    CL'90) over sliding-window co-occurrence — the distributional-
    semantics / collocation-mining op (the count table word2vec-style
    embeddings factorize; Levy & Goldberg NIPS'14).

    Pairs: within each document, unordered token pairs at distance
    1..window (canonicalized least/greatest; identical-token pairs
    kept — they are the diagonal of the symmetric co-occurrence
    matrix). With N = total pair count and slot marginals
    s(t) = occurrences of t across both pair slots (Σ s = 2N),

        pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )
                 = ln 4 + ln N + ln c(a,b) − ln s(a) − ln s(b)

    evaluated as that EXACT left-to-right sum of LNs of int64-exact
    doubles, then ROUND(_, 9) BEFORE ranking (the tfidf_topk
    determinism contract at the ranking boundary); ties break on
    (a, b). Output: (a, b, pair_count, pmi, rank), rank 1..k by
    (pmi DESC, a, b).

    Plan shape: pair generation is one whole-stage-codegen projection
    (nested transform over sequence — per-doc O(len·window) rows, NO
    join, NO shuffle); then one (a,b)-keyed count (map-side combine),
    a slot-marginal explode + term-keyed count, two broadcast-sized
    joins back, and orderBy().limit(k) = TakeOrdered. `min_count`
    drops noise pairs before ranking. At 100 TB the only large
    relation is the pair-count table, bounded by vocab² but in
    practice Zipf-thin past min_count."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col("text")), r"\s+")
    pair_t = "array<struct<a:string,b:string>>"
    pairs_expr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.transform(
                F.sequence(
                    i + 1, F.least(i + F.lit(window), F.size(toks))
                ),
                lambda j: F.struct(
                    F.least(
                        F.element_at(toks, i), F.element_at(toks, j)
                    ).alias("a"),
                    F.greatest(
                        F.element_at(toks, i), F.element_at(toks, j)
                    ).alias("b"),
                ),
            ),
        )
    )
    pairs = (
        docs.select(
            F.explode(
                F.when(F.size(toks) >= 2, pairs_expr).otherwise(
                    F.array().cast(pair_t)
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where((F.length("a") > 0) & (F.length("b") > 0))
    )
    c = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    c = c.persist()
    n_pairs = c.agg(F.sum("c")).collect()[0][0] or 0
    if n_pairs == 0:
        c.unpersist()
        raise ValueError("no co-occurrence pairs (all documents < 2 tokens)")
    slots = (
        c.select(F.explode(F.array("a", "b")).alias("t"), "c")
        .groupBy("t")
        .agg(F.sum("c").alias("s"))
    )
    pmi = F.round(
        F.log(F.lit(4.0))
        + F.log(F.lit(float(n_pairs)))
        + F.log(F.col("c"))
        - F.log(F.col("sa"))
        - F.log(F.col("sb")),
        9,
    )
    scored = (
        c.where(F.col("c") >= min_count)
        .join(F.broadcast(slots.select(F.col("t").alias("a"), F.col("s").alias("sa"))), "a")
        .join(F.broadcast(slots.select(F.col("t").alias("b"), F.col("s").alias("sb"))), "b")
        .select("a", "b", F.col("c").cast("long").alias("pair_count"), pmi.alias("pmi"))
    )
    top = scored.orderBy(F.desc("pmi"), "a", "b").limit(k)
    w = Window.orderBy(F.desc("pmi"), "a", "b")
    out = top.select(
        "a", "b", "pair_count", "pmi",
        F.row_number().over(w).cast("long").alias("rank"),
    )
    out = out.localCheckpoint(eager=True)
    c.unpersist()
    return out


# C4's "javascript" rule is a word match, not a substring match
# (Raffel et al. JMLR'20 §2.2 drops LINES with the word javascript;
# document-level here — single-line corpus). Lookahead-free ASCII so
# Java regex (Spark), RE2 (DuckDB) and Python `re` agree.
C4_JS_PATTERN = r"(^|[^a-z])javascript([^a-z]|$)"
C4_TERMINALS = (".", "!", "?", '"')


def c4_quality(
    docs: DataFrame,
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style cleanliness signals per document (Raffel et al.
    JMLR'20 §2.2 — the public heuristics behind C4, document-level
    subset; the corpus is single-line so the original line-level rules
    collapse to whole-text rules; the badword list and the
    three-sentence-span dedup are out of scope — dedup is its own
    operator family here):

      (doc_id, n_words, n_sentences, ends_terminal, has_lorem,
       has_brace, has_javascript, keep)

    * ends_terminal: rtrimmed text ends in . ! ? or " (C4 keeps lines
      ending in terminal punctuation).
    * n_sentences: terminal-punctuation count — C4 drops pages with
      fewer than min_sentences sentences.
    * has_lorem / has_brace / has_javascript: the lorem-ipsum,
      curly-brace (code), and javascript page screens.
    * keep: all rules pass. Every signal is integer/boolean logic on
      the text — engine-reproducible bit-for-bit, NO floats anywhere.

    Scale shape: ONE whole-stage-codegen projection on the scan — no
    shuffle, no join, trivially partition-parallel at 100 TB.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    ).cast("long")
    n_sentences = (
        F.length("text") - F.length(F.translate("text", ".!?", ""))
    ).cast("long")
    lower = F.lower(F.col("text"))
    last = F.expr("right(rtrim(text), 1)")
    ends_terminal = last.isin(*C4_TERMINALS)
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    has_javascript = lower.rlike(C4_JS_PATTERN)
    keep = (
        ends_terminal
        & (n_words >= min_words)
        & (n_sentences >= min_sentences)
        & ~has_lorem
        & ~has_brace
        & ~has_javascript
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        ends_terminal.alias("ends_terminal"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_javascript.alias("has_javascript"),
        keep.alias("keep"),
    )


def repetition_signals(
    docs: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4, 5),
) -> DataFrame:
    """The full Gopher repetition family (Rae et al. 2021 Table A1,
    word-level form — the corpus is single-line so the line/paragraph
    variants are degenerate, and word positions make the coverage
    union exact cross-engine where character offsets would drag
    whitespace bookkeeping into the contract):

      (doc_id, n, top_ngram_frac, dup_ngram_frac)

    * top_ngram_frac: words covered by occurrences of the single most
      frequent n-gram = max_count · n / n_words (Gopher's top-n-gram
      signal; gopher_quality's bigram version generalized).
    * dup_ngram_frac: fraction of word positions covered by the UNION
      of all n-grams occurring ≥ 2 times — the interval union per doc
      via gaps-and-islands (running cummax over gram starts), NOT the
      naive Σ count·n which double-counts overlaps.

    Both are exact int64 ratios through one fixed-order division,
    ROUND(9). Scale shape per n: one posexplode + two doc-keyed hash
    aggs + one per-doc window over gram positions (bounded by doc
    length — the covisit/funnel discipline); n values union at the
    end. No cross-doc joins anywhere."""
    from pyspark.sql import Window

    if not ns or any(n < 2 for n in ns):
        raise ValueError("ns must be non-empty with every n >= 2")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id",
        toks.alias("w"),
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_words"),
    )
    outs = []
    for n in ns:
        grams = F.expr(
            f"transform(sequence(0, size(w) - {n}), i -> "
            f"struct(i AS i, concat_ws(' ', slice(w, i + 1, {n})) AS g))"
        )
        pos = (
            base.where(F.col("n_words") >= n)
            .select("doc_id", "n_words", F.explode(grams).alias("x"))
            .select("doc_id", "n_words", F.col("x.i").alias("i"), F.col("x.g").alias("g"))
        )
        cnt = pos.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        top = cnt.groupBy("doc_id").agg(F.max("c").alias("top_c"))
        dup_pos = pos.join(
            cnt.where(F.col("c") >= 2).select("doc_id", "g"), ["doc_id", "g"]
        ).select("doc_id", "n_words", "i")
        # interval union over [i, i+n): islands via running cummax of
        # previous ends; the island head contributes min(n, gap)
        w_ord = (
            Window.partitionBy("doc_id")
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        covered = (
            dup_pos.withColumn("prev_end", F.max(F.col("i") + n).over(w_ord))
            .select(
                "doc_id",
                "n_words",
                F.when(
                    F.col("prev_end").isNull(), F.lit(n).cast("long")
                )
                .otherwise(
                    F.greatest(
                        F.least(
                            (F.col("i") + n) - F.col("prev_end"), F.lit(n).cast("long")
                        ),
                        F.lit(0).cast("long"),
                    )
                )
                .alias("add"),
            )
            .groupBy("doc_id")
            .agg(F.first("n_words").alias("n_words"), F.sum("add").alias("cov"))
        )
        per_doc = (
            base.select("doc_id", "n_words")
            .join(top, "doc_id", "left")
            .join(covered.select("doc_id", "cov"), "doc_id", "left")
            .select(
                "doc_id",
                F.lit(n).cast("long").alias("n"),
                F.round(
                    F.when(
                        F.col("n_words") >= n,
                        (F.coalesce(F.col("top_c"), F.lit(0)) * n).cast("double")
                        / F.col("n_words"),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("top_ngram_frac"),
                F.round(
                    F.when(
                        F.col("n_words") >= n,
                        F.coalesce(F.col("cov"), F.lit(0)).cast("double")
                        / F.col("n_words"),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("dup_ngram_frac"),
            )
        )
        outs.append(per_doc)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
