"""Text-analysis operators for corpus curation (BASELINE.json north star).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. All JVM-side expressions (split / regexp /
aggregate / md5) — vectorized, codegen-friendly, no Python in the hot
path; each has an exact SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.dedup import (
    _quote_ident,
    tokens_expr,
)

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "de", "los", "que"),
}


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token count, char count, avg token length (stable division)."""
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.round(total_len.cast("double") / n_tokens, 6).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punct ratio, stopword ratio,
    uppercase ratio — the usual pre-training corpus filters."""
    toks = tokens_expr(text_col)
    text = F.col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    en_stops = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(*en_stops)))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_upper / n_chars, 6).alias("upper_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
    )


def language_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: the language whose stopword list scores
    the most token hits wins; ties/no-hits → 'und' (undetermined).

    Deterministic tie-break: language order as listed. (A real system
    uses char n-gram models; the heuristic is the SQL-expressible core.)
    """
    toks = tokens_expr(text_col)
    out = df.select(F.col(id_col), toks.alias("_toks"))
    for lang, stops in LANG_STOPWORDS.items():
        out = out.withColumn(
            f"_hits_{lang}",
            F.size(F.filter(F.col("_toks"), lambda x: F.lower(x).isin(*stops))),
        )
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties
        guess = F.when(
            (F.col(f"_hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return out.select(F.col(id_col), guess.alias("lang_guess"))


# GPT-2-style pretokenizer, restricted to syntax RE2 (DuckDB) and Java
# (Spark) interpret identically: contractions | letter runs | digit runs
# | other-symbol runs. The real GPT-2 pattern's \s+(?!\S) lookahead is
# dropped — RE2 has no lookahead — and whitespace is simply not a token.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def bpe_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token accounting: pretoken count (the unit LLM tokenizers
    subdivide), distinct pretokens, and pretokens-per-whitespace-word —
    the cost model for 'how many tokens is this corpus'.

    All JVM-side regexp_extract_all; one narrow scan, no shuffle.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    words = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
        F.round(F.size(toks).cast("double") / F.size(words), 6).alias(
            "tokens_per_word"
        ),
    )


def curation_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One-pass per-document curation record: token count, stopword
    ratio, language guess, and the order-insensitive content fingerprint
    — the map stage of a training-data curation pipeline.

    Single narrow scan (no shuffle, no Python): downstream filter →
    dedup → per-language rollup only ever shuffles this small record,
    never the document text. At 100 TB the text column is pruned right
    at the parquet reader.
    """
    toks = tokens_expr(text_col)
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keep], toks.alias("_toks"),
    )
    tk = F.col("_toks")
    n_tokens = F.size(tk)
    hits = {
        lang: F.size(F.filter(tk, lambda x: F.lower(x).isin(*stops)))
        for lang, stops in LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        guess = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        fingerprint_expr(tk).alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        F.round(hits["en"] / n_tokens, 6).alias("stopword_ratio"),
        guess.alias("lang_guess"),
    )


def top_tokens(
    df: DataFrame, k: int = 100, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Global vocabulary induction: the k most frequent tokens with counts.

    explode → groupBy(token) with map-side partial aggregation (the
    shuffle carries one row per distinct token per partition, never the
    corpus) → orderBy+limit, which Spark executes as TakeOrdered (per-
    partition top-k merged on the driver) — no single-partition window.
    Ties break on token text so the cut at k is deterministic.
    """
    toks = tokens_expr(text_col)
    tok = F.explode(toks).alias("token")
    out = df.select(tok)
    if lowercase:
        out = out.select(F.lower(F.col("token")).alias("token"))
    return (
        out.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf·idf.

    Scored as ``tf × ⌊log2(N ÷ df)⌋`` — tf·idf with the idf quantized
    to integer bits, so every score is exact int64 and bit-identical
    across engines (⌊log2 m⌋ computes as binary-digit count, no
    float log). Review r2 replaced the previous ``tf/df`` score, which
    is NOT order-equivalent to tf·idf (a hapax typo outranked repeated
    topical terms). Ties break on tf, then the term text. Exact
    ``tf``/``df`` counts ride along in the output.

    Two shuffles (doc-term tf, term df) + one join; the join's build
    side is the vocabulary — Zipf-small next to the corpus — so it
    broadcasts under AQE at scale. The per-doc top-k window partitions
    by document: bounded by terms-per-document, never corpus-wide.
    """
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    terms = df.select(
        F.col(id_col), F.explode(toks).alias("_t")
    ).select(F.col(id_col), F.lower(F.col("_t")).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = terms.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("_n"))
    # idf quantized to whole bits: ⌊log2(N div df)⌋ = binary digit
    # count - 1, exact integer arithmetic on both engines
    idf_q = F.length(F.conv(F.expr("_n div df"), 10, 2)) - 1
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * idf_q)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "rnk")
    )


def fingerprint_expr(toks: Column) -> Column:
    """md5 over the sorted distinct token set — the one definition the
    standalone operator and the one-pass curation record share."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — catches shuffled/reordered copies exact-hash misses."""
    return df.select(
        F.col(id_col),
        fingerprint_expr(tokens_expr(text_col)).alias("fingerprint"),
    )


# PII patterns — kept inside the RE2 ∩ Java-regex subset (same rationale
# as the BPE pretokenizer above) so Spark and the DuckDB oracle extract
# IDENTICAL matches. Counting uses regexp_extract_all + size on both
# engines; redaction replaces every match with a fixed-width tag.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "long_digits": (r"\b\d{9,}\b", "<NUM>"),
}


def scrub_expr(col: Column) -> Column:
    """The sequential PII redaction fold (pattern order matters:
    email before IP before digit-runs); shared by ``pii_scrub`` and the
    in-stream masking query."""
    out = col
    for pat, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII hit counts + the redacted text's length.

    The standard pre-training scrub pass (emails / IP addresses / long
    digit runs — account-number shaped). All JVM-side regexp built-ins:
    one projection, no shuffle, no Python — at 100 TB this runs at scan
    speed and the redacted column can be written straight back out.
    The reference has no text ops; this is a BASELINE.json north-star
    (B) operator over the driver's documents table.
    """
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    scrubbed = scrub_expr(text)
    return df.select(
        F.col(id_col),
        *counts,
        F.length(text).alias("n_chars_raw"),
        F.length(scrubbed).alias("n_chars_scrubbed"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-doc n-gram repetition ratio — the boilerplate/spam signal.

    ``dup_ngram_ratio`` = 1 − distinct/total over word n-grams (0 when
    the doc is shorter than n tokens). Computed with array expressions
    in one projection (the n-gram list is NOT deduplicated first, unlike
    ``dedup.word_shingles_expr``) — no shuffle, no Python.
    """
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col),
        F.size(grams).alias("n_ngrams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_ngrams"),
        F.when(F.size(grams) > 0,
               F.round(F.lit(1.0) - F.size(F.array_distinct(grams))
                       / F.size(grams), 6)
         ).otherwise(F.lit(0.0)).alias("dup_ngram_ratio"),
    )


def rare_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_count: int = 2,
) -> DataFrame:
    """Corpus-statistics quality signal: per-doc rare-token ratio.

    A token is *rare* when its global (lowercased) corpus count is
    ≤ ``max_count`` — documents dominated by rare tokens are gibberish,
    OCR noise, or out-of-distribution, the unigram-LM intuition without
    the cross-engine float-log hazard (all arithmetic here is integer
    counts; the final ratio is one exact int division, rounded).

    Scale: one shuffle to count the vocabulary, one shuffle joining
    tokens back to their counts (both on the token key — the second
    reuses the first's partitioning under AQE), then a per-doc
    aggregate. The corpus text itself crosses no shuffle — only
    (doc_id, token) pairs.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("token")
    ).select(F.col(id_col), F.lower(F.col("token")).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("_gc"))
    return (
        toks.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("_gc") <= max_count).cast("long")).alias("n_rare"),
            F.round(
                F.sum((F.col("_gc") <= max_count).cast("long"))
                / F.count("*"), 6
            ).alias("rare_ratio"),
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 3,
    width: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Heavy hitters via a count-min sketch built as a groupBy.

    The CMS is ``depth`` rows of ``width`` counters; token t increments
    counter ``h_j(t) = md5(t + '#' + j) % width`` in every row, and its
    estimate is the MIN over rows — never an underestimate, off by at
    most the collision mass in its lightest bucket. Expressed
    declaratively the sketch IS Spark's partial aggregate: each map
    task emits ≤ depth×width counters regardless of input size, so at
    100 TB the shuffle carries a few thousand rows per task where an
    exact global token count shuffles every distinct token. Estimates
    then come from broadcasting the finished sketch (depth×width rows)
    back onto the distinct-token side — no second full shuffle.

    md5-derived hashing (not xxhash) keeps every counter replayable
    bit-for-bit by the DuckDB oracle (same trick as operators/dedup.py).

    Output: top-``k`` tokens by (estimate desc, token asc) with both
    the CMS estimate and the exact count, plus ``overestimate_ok`` —
    the CMS ≥ exact invariant, checked per emitted row.
    """
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )

    def bucket(j: int) -> Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.col("tok"), F.lit(f"#{j}"))), 1, 15),
            16,
            10,
        ).cast("long") % width

    hashed = toks.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("bucket"))
                    for j in range(depth)
                ]
            )
        ).alias("h"),
    ).select("tok", F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))

    sketch = hashed.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))

    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_count"))
    tok_hashes = hashed.distinct()
    est = (
        tok_hashes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
    )
    out = est.join(exact, "tok").select(
        F.col("tok").alias("token"),
        "est_count",
        "exact_count",
        (F.col("est_count") >= F.col("exact_count")).alias("overestimate_ok"),
    )
    return out.orderBy(F.col("est_count").desc(), "token").limit(k)


def linear_score_expr(toks: Column, buckets: int = 1024) -> Column:
    """The hashed-linear weight sum as a bare expression (shared by the
    standalone scorer and the one-scan full-curation composite).

    Portable token hash: md5 hex -> 15 hex digits (< 2^60) -> int,
    identical in Spark (conv) and DuckDB ('0x...'::BIGINT); frozen
    weight w(b) = (b*31 + 7) mod 1001 - 500."""

    def weight(x: Column) -> Column:
        h = (
            F.conv(F.substring(F.md5(F.lower(x)), 1, 15), 16, 10)
            .cast("bigint")
            % buckets
        )
        return (h * 31 + 7) % 1001 - 500

    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + weight(x)
    )


def linear_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Hashed-linear quality classifier scoring — the fastText/CCNet
    corpus-filter pattern: each token hashes into one of ``buckets``
    weight slots and the document score is the weight sum; keep/drop is
    the score's sign. Here the weight table is a FROZEN deterministic
    function of the bucket id (``w(b) = (b·31 + 7) mod 1001 − 500``) —
    a stand-in for trained weights with identical plumbing, so the
    whole scorer (hash → bucket → weight → sum → threshold) is
    replayable by a SQL oracle. Swapping in trained weights is a
    broadcast array literal, not a new operator.

    Scale: one JVM-side ``aggregate`` over the token array per row —
    no shuffle, no UDF; the scorer runs inside the scan stage at
    whole-corpus throughput, which is exactly why hashed linear models
    are THE first-pass quality filter at 100 TB.
    """
    toks = tokens_expr(text_col)
    score = linear_score_expr(toks, buckets)
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        score.alias("lm_score"),
        F.round(score.cast("double") / n, 6).alias("score_per_token"),
        (score >= 0).alias("keep"),
    )


def quality_pr_sweep(
    df: DataFrame,
    weak_label: Column,
    thresholds_milli: tuple[int, ...] = (
        -80000, -40000, -20000, -10000, 0, 10000, 20000, 40000, 80000,
    ),
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Threshold calibration for the hashed-linear quality filter: for
    each candidate per-token score threshold τ (milli-units), sweep the
    whole corpus against a weak label and report the confusion counts
    plus integer-exact precision/recall/F1 (ppm) — the
    DataComp/fastText filter-tuning loop ("pick τ that keeps X% at
    best agreement with the weak signal") as ONE query instead of one
    scan per candidate.

    Predicted-positive is evaluated by integer cross-multiplication
    (``lm_score·1000 ≥ τ·n_tokens``) so no float division touches the
    decision — every count and every ppm metric is bit-exact in any
    engine (metrics use integer div; F1 folds the two ppms with one
    more integer div).

    Scale: ONE corpus scan; the threshold grid joins as a broadcast
    literal (|grid| rows) and partial aggregation means the shuffle is
    |grid| rows per partition regardless of corpus size. Doubling the
    grid costs scan-side CPU only — exactly why the sweep form beats
    re-running the filter per candidate τ at 100 TB.
    """
    if len(set(thresholds_milli)) != len(thresholds_milli):
        raise ValueError(
            f"thresholds_milli contains duplicates: {thresholds_milli!r} — "
            "a duplicate tau would double-count every row in its group"
        )
    toks = tokens_expr(text_col)
    score = linear_score_expr(toks, buckets)
    base = df.select(
        score.alias("lm_score"),
        F.size(toks).cast("long").alias("n_tokens"),
        weak_label.cast("boolean").alias("is_pos"),
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(int(t),) for t in thresholds_milli], "tau_milli int"
    )
    pred = F.col("lm_score") * 1000 >= F.col("tau_milli").cast("long") * F.col(
        "n_tokens"
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = (
        base.crossJoin(F.broadcast(grid))
        .groupBy("tau_milli")
        .agg(
            cnt(pred & F.col("is_pos")).alias("tp"),
            cnt(pred & ~F.col("is_pos")).alias("fp"),
            cnt(~pred & F.col("is_pos")).alias("fn"),
            cnt(~pred & ~F.col("is_pos")).alias("tn"),
        )
    )
    # an empty corpus still has a defined (all-zero) confusion matrix
    # at every threshold: re-anchor on the grid so no τ row vanishes
    agg = grid.join(agg, "tau_milli", "left").select(
        "tau_milli",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("tp", "fp", "fn", "tn")
        ],
    )
    # `div` (not `/` + floor): exact integer quotients at ANY row count
    # — double division drifts past ~5e9-row denominators
    out = agg.select(
        "tau_milli",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) "
            "ELSE 0 END"
        ).cast("bigint").alias("precision_ppm"),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) "
            "ELSE 0 END"
        ).cast("bigint").alias("recall_ppm"),
    )
    f1 = F.expr(
        "CASE WHEN precision_ppm + recall_ppm > 0 THEN "
        "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) "
        "ELSE 0 END"
    )
    return out.withColumn("f1_ppm", f1.cast("bigint")).orderBy("tau_milli")


def canonical_url_expr(col: Column) -> Column:
    """URL canonicalization as pure JVM expressions (RE2∩Java regex
    subset, DuckDB-replayable): lowercase scheme+host, strip default
    ports (:80 http / :443 https), drop the fragment, strip a trailing
    slash on a bare path, and SORT the query parameters — the classic
    pre-dedup normalization of web-scrape pipelines (two crawls of the
    same page rarely agree on parameter order or fragment).
    """
    # fragment off first
    u = F.regexp_replace(col, r"#.*$", "")
    # lowercase scheme://host[:port] (group 1), keep the rest verbatim
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    head = F.regexp_replace(head, r"^(http://[^/:]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/:]*):443$", r"$1")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"^(/.+?)/$", r"$1")
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        head,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def canonical_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url) → (id, url, canonical_url) — dedup key for crawl
    frontier / corpus URL dedup; zero shuffle, zero Python."""
    return df.select(
        F.col(id_col),
        F.col(url_col),
        canonical_url_expr(F.col(url_col)).alias("canonical_url"),
    )


def html_to_text_expr(col: Column) -> Column:
    """Regex HTML→text (the C4/CCNet quick pass, NOT a DOM parser):
    drop script/style/head blocks and comments, strip tags, decode the
    five XML entities, collapse whitespace. All patterns in the
    RE2∩Java subset so a SQL oracle replays the exact fold; (?is) makes
    the block patterns case-insensitive and dot-matches-newline in both
    engines.
    """
    out = col
    for pat in (
        r"(?is)<script\b.*?</script>",
        r"(?is)<style\b.*?</style>",
        r"(?is)<head\b.*?</head>",
        r"(?s)<!--.*?-->",
        r"(?s)<[^>]*>",
    ):
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST (double-escape safe)
    ):
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → (id, text, n_chars) — executor-side, whole-stage
    codegen; the extraction step between WARC response bodies and
    every text operator in this package."""
    text = html_to_text_expr(F.col(html_col))
    return df.select(
        F.col(id_col),
        text.alias("text"),
        F.length(text).alias("n_chars"),
    )


def _bigram_lm_tables(ref, top_bigrams: int, top_unigrams: int):
    """The three capped LM tables (c2k, c1k, vocab) from ONE aggregate
    over the reference-slice bigram instances (optimization r11, guide
    §2.4 "remove passes" — the nb_langid pattern): c2(w1,w2) is the
    grouped count itself, c1(w1) its per-context sum (every pair
    instance with context w1 contributes exactly 1), and V its
    distinct-context count. Previously each table re-tokenized and
    re-exploded the reference slice as its own subtree — and consumers
    that evaluate the score table twice (ccnet) paid all three twice.
    The grouped table is |distinct ref bigrams|-sized (already the
    c2k top-K's input, a distributed aggregate, never collected); the
    localCheckpoint materializes it once per run and truncates the
    shared lineage."""
    g = (
        ref.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint()
    )
    c2k = g.orderBy(F.desc("c2"), "w1", "w2").limit(top_bigrams)
    c1k = (
        g.groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
        .orderBy(F.desc("c1"), "w1")
        .limit(top_unigrams)
    )
    vocab = g.agg(F.countDistinct("w1").alias("v"))
    return c2k, c1k, vocab


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_mod: int = 10,
    top_bigrams: int = 50_000,
    top_unigrams: int = 20_000,
    keep_num: int = 9,
    keep_den: int = 2,
) -> DataFrame:
    """Bigram language-model quality filter — the CCNet/KenLM pattern:
    train an n-gram LM on a trusted reference slice, score every
    document by how "surprising" its bigrams are under that LM, and
    keep the low-perplexity (in-distribution) documents.

    Unlike :func:`linear_quality_score` (frozen hashed weights), this
    LM is genuinely TRAINED ON THE DATA: the reference slice is
    ``doc_id % ref_mod == 0``; bigram counts c2(w1,w2) and context
    counts c1(w1) are distributed aggregations over it. Scoring uses
    add-one-smoothed inverse probability, integer-quantized so the
    whole contract is exact int64 cross-engine (same trick as
    tfidf's ⌊log2⌋ idf):

        quotient  = max((c1(w1) + V) DIV (c2(w1,w2) + 1), 1)
        surprisal = ⌊log2(quotient)⌋        -- length(bin(q)) - 1
        keep      = Σ surprisal · keep_den <= n_bigrams · keep_num

    i.e. keep when the mean bigram surprisal is at most
    keep_num/keep_den bits (defaults: 4.5 bits). Unseen contexts back
    off to (0 + V) DIV 1 = V, the uniform-over-vocab cost.

    Scale: the LM tables are capped at ``top_bigrams``/``top_unigrams``
    entries via distributed top-K (TakeOrderedAndProject — count DESC,
    key tie-break, NO single-partition window), so both sides of the
    scoring join are broadcastable no matter the corpus size. Scoring
    is one scan, two broadcast hash joins, and one partial-aggregated
    groupBy(doc_id) — nothing corpus-sized shuffles except the per-doc
    rollup, which hash-aggregates map-side first.
    """
    tk = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    base = df.select(F.col(id_col), tk.alias("tk")).where(F.size("tk") >= 2)
    bgs = F.expr(
        "transform(slice(tk, 1, size(tk) - 1),"
        " (x, i) -> struct(x AS w1, tk[i + 1] AS w2))"
    )
    pairs = base.select(F.col(id_col), F.explode(bgs).alias("bg")).select(
        id_col, "bg.w1", "bg.w2"
    )

    ref = pairs.where(F.col(id_col) % ref_mod == 0)
    c2k, c1k, vocab = _bigram_lm_tables(ref, top_bigrams, top_unigrams)

    scored = (
        pairs.join(F.broadcast(c2k), ["w1", "w2"], "left")
        .join(F.broadcast(c1k), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    quo = F.greatest(
        F.expr("(coalesce(c1, 0) + v) DIV (coalesce(c2, 0) + 1)"), F.lit(1)
    )
    surp = (F.length(F.bin(quo)) - 1).cast("long")
    doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(surp).alias("surprisal"),
    )
    return doc.select(
        F.col(id_col),
        "n_bigrams",
        "surprisal",
        F.round(F.col("surprisal").cast("double") / F.col("n_bigrams"), 6)
        .alias("avg_surprisal"),
        (F.col("surprisal") * keep_den <= F.col("n_bigrams") * keep_num)
        .alias("keep"),
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
    top_words: int = 20_000,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Train BPE merges on the corpus — the Sennrich subword pattern
    every LLM tokenizer (GPT-2/LLaMA via HF ``tokenizers``) is built on:
    collapse the corpus to a word-frequency table, then repeatedly merge
    the globally most frequent adjacent symbol pair.

    Returns ``num_merges`` rows: (merge_rank, lhs, rhs, pair_count) —
    the learned merge table, in order.

    Exactness: words are lowercased ``[a-z]+`` runs; symbol sequences
    are encoded as ``||s1||s2||…||`` strings, where replacing
    ``|a||b|`` → ``|ab|`` is PROVABLY exact greedy left-to-right BPE:
    every occurrence is a pair of whole adjacent symbols (symbols never
    contain ``|``, and the pattern's flanking pipes force alignment),
    consecutive overlapping pairs share only the *outer* pipes so
    non-overlapping scan order = BPE's greedy order (``aaaaa`` →
    ``aa aa a``). Ties break on (count DESC, lhs, rhs) cross-engine.

    Scale: the ONLY corpus-sized stage is the word-count explode +
    map-side-combined groupBy, capped to ``top_words`` via distributed
    top-K (TakeOrderedAndProject) — exactly how hf-tokenizers trains
    (on word counts, not raw text). Every merge round then runs on the
    capped vocab: a vocab-sized pair aggregation and a broadcast
    1-row-best cross join; nothing returns to the driver.

    ``checkpoint_rounds`` (default on) ``localCheckpoint``s the capped
    word table and each round's vocab — the same lineage-truncation
    the PageRank join-loop uses (operators/graph.py). Without it the
    per-round lineage re-inlines every earlier round into every later
    one (O(2^N) subplans, 63 exchanges at N=6); with it the corpus is
    scanned exactly once and each round is one 20k-row shuffle plus a
    1-row broadcast. Results are identical either way.

    Execution follows :func:`unigram_train`'s split: the corpus-sized
    word count runs in Spark; the merge rounds over the
    parameter-capped word table run driver-side
    (:func:`_merge_loop_driver`) when ``top_words`` is within the
    fast-path bound, falling back to the distributed chain otherwise —
    identical results either way (agreement-tested).
    """
    fast = _merge_driver_fast_path(
        df, text_col, num_merges, top_words, wordpiece=False
    )
    if fast is not None:
        _, merges_rows = fast
        return df.sparkSession.createDataFrame(
            merges_rows,
            "merge_rank int, lhs string, rhs string, pair_count long",
        ).orderBy("merge_rank")
    _, merges = _bpe_chain(df, text_col, num_merges, top_words, checkpoint_rounds)
    return merges.orderBy("merge_rank")


# Fast-path bound for the merge-loop trainers (BPE / WordPiece): the
# collected word table is capped by the ``top_words`` PARAMETER — a
# configuration bound, same discipline as the unigram fast path.
_MERGE_DRIVER_MAX_WORDS = 1_000_000


def _merge_words(df: DataFrame, text_col: str, top_words: int) -> DataFrame:
    """The corpus-sized stage shared by the BPE/WordPiece chains and
    their driver-side fast paths: lowercase ``[a-z]+`` word-frequency
    top-K (no length filter — unlike the unigram table)."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(top_words)
    )


def _merge_loop_driver(
    word_rows: list, num_merges: int, wordpiece: bool
) -> tuple[list, list]:
    """Driver-side twin of :func:`_bpe_chain` / :func:`_wordpiece_chain`
    round loops — exact same double-pipe symbol encoding, the same
    left-to-right non-overlapping ``replace`` application (Python
    ``str.replace`` scans identically to Spark's ``replace``), the
    same (count DESC, lhs, rhs) / (score_q DESC, lhs, rhs) argmax, and
    the same empty-best quirk (a round with no adjacent pairs empties
    the vocabulary, exactly as the chain's crossJoin against an empty
    1-row best does). Returns ``(vocab_rows, merges_rows)`` with
    vocab rows as (word, s, freq).

    Rationale (optimization r10, guide §1.2 step 1, §5 — the unigram
    precedent, ledger change 11): after the corpus-sized word count,
    every merge round operates on the parameter-capped word table; the
    chain paid one eager-checkpoint Spark job per merge rank for
    in-memory-sized work."""
    words = [w for (w, _) in word_rows]
    freqs = [int(f) for (_, f) in word_rows]
    ss = ["||" + "".join(c + "||" for c in w) for w in words]
    merges: list = []
    for rank in range(1, num_merges + 1):
        if not words:
            break  # vocab emptied by an empty best — no further rows
        syms_list = [
            [x for x in s.split("||") if x] for s in ss
        ]
        pair_counts: dict = {}
        for syms, f in zip(syms_list, freqs):
            if len(syms) >= 2:
                for a, b in zip(syms, syms[1:]):
                    pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            # the chain's crossJoin(broadcast(empty best)) drops every
            # vocab row; later rounds then contribute nothing
            words, freqs, ss = [], [], []
            continue
        if wordpiece:
            sym_counts: dict = {}
            for syms, f in zip(syms_list, freqs):
                for x in syms:
                    sym_counts[x] = sym_counts.get(x, 0) + f
            best = min(
                (
                    (
                        -((pc * 1048576) // (sym_counts[a] * sym_counts[b])),
                        a,
                        b,
                    )
                    for (a, b), pc in pair_counts.items()
                ),
            )
            w1, w2 = best[1], best[2]
            merges.append(
                (rank, w1, w2, pair_counts[(w1, w2)], -best[0])
            )
        else:
            best = min(
                ((-pc, a, b) for (a, b), pc in pair_counts.items()),
            )
            w1, w2 = best[1], best[2]
            merges.append((rank, w1, w2, -best[0]))
        pat = "|" + w1 + "||" + w2 + "|"
        rep = "|" + w1 + w2 + "|"
        ss = [s.replace(pat, rep) for s in ss]
    return list(zip(words, ss, freqs)), merges


def _merge_driver_fast_path(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    top_words: int,
    wordpiece: bool,
) -> tuple[list, list] | None:
    """Collect the capped word table and run the merge loop driver-side
    — or None when ``top_words`` exceeds the fast-path bound (caller
    falls back to the distributed chain).

    WordPiece additionally falls back when total symbol instances could
    push the chain's int64 score arithmetic (``c_pair·2^20`` and
    ``c_lhs·c_rhs``) past 2^63: Python ints don't wrap, so agreement
    with the JVM plan is only guaranteed inside its documented
    int64-safe domain — outside it the chain itself runs, keeping
    results identical by construction."""
    if top_words > _MERGE_DRIVER_MAX_WORDS:
        return None
    word_rows = [
        (r["word"], r["freq"])
        for r in _merge_words(df, text_col, top_words).collect()
    ]
    if wordpiece:
        # symbol instances only shrink as merges apply, so round-1
        # totals bound every round's c_sym and pair_count
        s0 = sum(len(w) * int(f) for (w, f) in word_rows)
        if s0 * s0 >= 2**63:
            return None
    return _merge_loop_driver(word_rows, num_merges, wordpiece)


def _bpe_chain(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    top_words: int,
    checkpoint_rounds: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared BPE training loop: returns (vocab_final, merges).

    ``vocab_final`` is (word, s, freq) with ALL ``num_merges`` merges
    applied to the symbol encoding ``s`` — the lookup table the encode
    side broadcasts. It is left LAZY (no checkpoint after the last
    apply) so merge-only callers never pay for it.
    """
    words = _merge_words(df, text_col, top_words)
    if checkpoint_rounds:
        words = words.localCheckpoint(eager=True)
    vocab = words.select(
        "word",
        F.concat(
            F.lit("||"), F.expr("regexp_replace(word, '(.)', '$1||')")
        ).alias("s"),
        "freq",
    )

    merges = None
    for rank in range(1, num_merges + 1):
        syms = F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')")
        prs = F.expr(
            "transform(slice(syms, 1, size(syms) - 1),"
            " (x, i) -> struct(x AS w1, syms[i + 1] AS w2))"
        )
        best = (
            vocab.select(syms.alias("syms"), "freq")
            .where(F.size("syms") >= 2)
            .select(F.explode(prs).alias("p"), "freq")
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "w1", "w2")
            .limit(1)
        )
        ranked = best.select(
            F.lit(rank).alias("merge_rank"),
            F.col("w1").alias("lhs"),
            F.col("w2").alias("rhs"),
            "pair_count",
        )
        merges = ranked if merges is None else merges.unionByName(ranked)
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "word",
            F.expr(
                "replace(s, '|' || w1 || '||' || w2 || '|',"
                " '|' || w1 || w2 || '|')"
            ).alias("s"),
            "freq",
        )
        if checkpoint_rounds and rank < num_merges:
            vocab = vocab.localCheckpoint(eager=True)
    return vocab, merges


def bpe_encode_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 6,
    top_words: int = 20_000,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Apply the corpus-trained BPE vocab back to the corpus — the
    other half of the tokenizer lifecycle: train merges (see
    :func:`bpe_train_merges`), then answer "how many tokens is this
    corpus under MY tokenizer", per document.

    Per document: n_words ([a-z]+ runs), n_bpe_tokens (symbols after
    the learned merges; out-of-vocab words fall back to one token per
    character — byte-fallback's analogue), n_chars (word chars), and
    chars_per_token (the compression ratio the merges bought).

    Scale: training touches the corpus once (word-count top-K); the
    trained (word → symbol-count) table is top_words-capped, so
    encoding is one corpus scan + ONE BROADCAST JOIN + a map-side-
    combined groupBy(doc_id) — the text itself never shuffles.

    Training execution follows :func:`bpe_train_merges`: driver-side
    merge loop over the capped word table when the bound allows, the
    distributed chain otherwise — identical LUT either way.
    """
    fast = _merge_driver_fast_path(
        df, text_col, num_merges, top_words, wordpiece=False
    )
    if fast is not None:
        vocab_rows, _ = fast
        lut = df.sparkSession.createDataFrame(
            [
                (w, len([x for x in s.split("||") if x]))
                for (w, s, _freq) in vocab_rows
            ],
            "word string, n_syms int",
        )
    else:
        vocab, _ = _bpe_chain(
            df, text_col, num_merges, top_words, checkpoint_rounds
        )
        lut = vocab.select(
            "word",
            F.size(
                F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')")
            ).alias("n_syms"),
        )
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    per_word = doc_words.join(F.broadcast(lut), "word", "left").select(
        id_col,
        F.coalesce(F.col("n_syms"), F.length("word")).alias("n_toks"),
        F.length("word").alias("n_chars"),
    )
    return per_word.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
    )


def dsir_select(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    k: int = 200,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the likelihood ratio of its HASHED n-gram features under a
    target distribution vs the raw-corpus distribution, then keep the
    top-k — the standard recipe for skimming a web crawl for
    target-domain-looking documents.

    Features are bigrams hashed into ``n_buckets`` md5 buckets — the
    method's point: memory is O(n_buckets) regardless of vocabulary,
    so the two distribution tables stay broadcast-sized at ANY corpus
    size (DSIR's hashed n-gram trick, same role as in the paper).

    Exact integer contract (cross-engine): per-bucket score
    ``s_b = ⌊log2((cnt_target[b]+1) · 2^20 DIV (cnt_raw[b]+1))⌋``
    (add-one smoothing; the 2^20 scale keeps the ratio integral), doc
    score = Σ s_bucket over bigram instances, ranking by the
    length-normalized average (score DESC, id tie-break).

    Scale: one corpus scan explodes bigram instances; both
    distribution tables are ≤``n_buckets``-row map-side-combined aggs;
    scoring is ONE broadcast join + a per-doc rollup; selection is
    distributed top-K (TakeOrderedAndProject). Document text never
    shuffles.
    """
    tk = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    base = df.select(
        F.col(id_col), F.col(target_col).alias("__t"), tk.alias("tk")
    ).where(F.size("tk") >= 2)
    bgs = F.expr(
        "transform(slice(tk, 1, size(tk) - 1),"
        " (x, i) -> concat(x, ' ', tk[i + 1]))"
    )
    inst = base.select(
        id_col,
        "__t",
        F.explode(bgs).alias("bg"),
    ).select(
        id_col,
        "__t",
        (F.conv(F.substring(F.md5("bg"), 1, 8), 16, 10).cast("long")
         % n_buckets).alias("bucket"),
    )

    # both distributions in ONE conditional agg pass (one corpus scan,
    # one B-bounded exchange) — a raw/target join here would re-execute
    # the bigram lineage, i.e. a second full corpus scan at 100 TB
    lut = inst.groupBy("bucket").agg(
        F.count("*").alias("c_raw"),
        F.count(F.when(F.col("__t") == target_value, 1)).alias("c_tgt"),
    ).select(
        "bucket",
        (
            F.length(F.bin(F.expr("(c_tgt + 1) * 1048576 DIV (c_raw + 1)")))
            - 1
        ).cast("long").alias("s"),
    )

    # lang rides through the rollup (per-doc constant) — no third scan
    doc = (
        inst.join(F.broadcast(lut), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("s").alias("score"),
            F.min("__t").alias(target_col),
        )
        .withColumn(
            "avg_score",
            F.round(F.col("score").cast("double") / F.col("n_bigrams"), 6),
        )
    )
    return (
        doc.select(
            id_col, "n_bigrams", "score", "avg_score", target_col
        )
        .orderBy(F.desc("avg_score"), id_col)
        .limit(k)
    )


#: the canonical Gopher stopword list (Rae et al. 2021, appendix A1.1):
#: a document must contain >= 2 of these to pass the rules.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The published Gopher quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1) — the named filter set
    most open-corpus pipelines (MassiveText, RefinedWeb, Dolma) start
    from. Per document:

    * word count in [50, 100_000]
    * mean word length in [3, 10]
    * symbol-to-word ratio (# and ellipsis) < 0.1
    * > 80% of words contain at least one alphabetic character
    * >= 2 hits from the canonical 8-stopword list

    All five rules are narrow JVM expressions over the token array —
    zero shuffle, zero Python: the first-pass 100 TB filter shape, like
    ``linear_quality_score``. The mean-word-length bounds compare as
    integer cross-multiplications (3·n ≤ Σlen ≤ 10·n) so the contract
    is exact; the reported mean rides along rounded for humans.
    """
    tk = tokens_expr(text_col)
    base = df.select(F.col(id_col), tk.alias("tk"), F.col(text_col).alias("_t"))
    n = F.size("tk")
    total_len = F.aggregate(
        F.col("tk"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_symbol = F.size(
        F.filter(F.col("tk"), lambda x: x.isin("#", "...") | x.rlike("^…$"))
    )
    n_alpha = F.size(F.filter(F.col("tk"), lambda x: x.rlike("[a-zA-Z]")))
    n_stop = F.size(
        F.filter(F.col("tk"), lambda x: F.lower(x).isin(*GOPHER_STOPWORDS))
    )
    checks = {
        "ok_word_count": (n >= 50) & (n <= 100_000),
        "ok_mean_len": (total_len >= 3 * n) & (total_len <= 10 * n),
        "ok_symbol_ratio": n_symbol * 10 < n,
        "ok_alpha_words": n_alpha * 5 > n * 4,
        "ok_stopwords": n_stop >= 2,
    }
    out = base.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(total_len.cast("double") / n, 6).alias("mean_word_len"),
        n_stop.cast("long").alias("n_stop_hits"),
        *[c.alias(name) for name, c in checks.items()],
    )
    passed = None
    for name in checks:
        passed = F.col(name) if passed is None else passed & F.col(name)
    return out.withColumn("gopher_pass", passed)


def unimax_allocation(
    df: DataFrame,
    budget_tokens: int,
    epoch_cap: int = 3,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling"): split a total token
    budget across languages as evenly as possible, but cap every
    language at ``epoch_cap`` epochs of its available data — surplus
    from capped (low-resource) languages water-fills into the rest.

    Closed form instead of the paper's greedy loop: in capacity-
    ascending order, the capped languages form a PREFIX (the greedy's
    cap condition is monotone), so one cumulative window finds the
    boundary: language i is capped iff
    ``capacity_i · (k − i + 1) ≤ budget − Σ_{{j<i}} capacity_j``
    (integer cross-multiplication, exact); every uncapped language gets
    the floor of the remaining budget over the uncapped count.

    Scale: one corpus scan → per-language token totals (map-side
    combined); everything after runs on the k-row language table.
    """
    from pyspark.sql import Window

    tk = tokens_expr(text_col)
    per_lang = (
        df.select(F.col(lang_col).alias("lang"), F.size(tk).alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").cast("long").alias("tokens"))
        .withColumn("capacity", F.col("tokens") * epoch_cap)
    )
    w_ord = Window.orderBy("capacity", "lang")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    k = per_lang.count()  # k languages: constant-sized driver value
    ranked = per_lang.withColumn("idx", F.row_number().over(w_ord)).withColumn(
        "cum_prev", F.coalesce(F.sum("capacity").over(w_prev), F.lit(0))
    )
    B = F.lit(budget_tokens)
    capped = (F.col("capacity") * (F.lit(k) - F.col("idx") + 1)) <= (
        B - F.col("cum_prev")
    )
    ranked = ranked.withColumn("capped", capped)
    totals = ranked.agg(
        F.sum(F.when(F.col("capped"), F.col("capacity")))
        .cast("long").alias("s_capped"),
        F.count(F.when(F.col("capped"), 1)).alias("n_capped"),
    )
    uncapped_share = F.expr(
        f"({budget_tokens} - coalesce(s_capped, 0))"
        f" DIV greatest(1, {k} - n_capped)"
    )
    out = ranked.crossJoin(F.broadcast(totals)).withColumn(
        "alloc",
        F.when(F.col("capped"), F.col("capacity"))
        .otherwise(uncapped_share)
        .cast("long"),
    )
    return out.select(
        "lang",
        "tokens",
        "capacity",
        "capped",
        "alloc",
        F.round(F.col("alloc").cast("double") / F.col("tokens"), 6).alias(
            "epochs"
        ),
    )


def zipf_profile(
    df: DataFrame, text_col: str = "text", n_buckets: int = 12
) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary — the
    statistical fingerprint data-quality work reads first (natural
    language sits near slope −1; boilerplate-heavy or synthetic text
    bends the curve).

    Tokens → frequency → rank (count DESC, token tie-break) → dyadic
    rank buckets (⌊log2 rank⌋) → per-bucket token count, total
    occurrences, and mean ⌊log2 freq⌋ in integer bits. Everything is
    integer-exact cross-engine (the tf·idf ⌊log2⌋ trick applied to
    both axes); the slope between adjacent bucket means IS the Zipf
    exponent estimate, left to the analyst as exact data.

    Scale (two-pass, VERDICT r5 #4): no token is ever ranked. Every
    output depends only on HOW MANY types fall in each (frequency,
    rank-bucket) cell, and ranks inside a same-frequency group are an
    arithmetic interval — group g (ties broken by token) occupies
    ranks [offset+1, offset+n_g] where offset = Σ n_f over higher
    frequencies. So: one map-side-combined groupBy(token) → a
    frequency HISTOGRAM (freq, n_types-with-that-freq), one window
    over the histogram (distinct-frequency-sized, O(√corpus) by
    Zipf — never the vocabulary), and each histogram row explodes
    into the ≤ n_buckets dyadic buckets its rank interval overlaps,
    with overlap COUNTS, not rows. The previous form ranked the full
    distinct-token vocabulary in one partition — corpus-sized at
    100 TB.
    """
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    freq = (
        df.select(F.explode(toks).alias("tok"))
        .select(F.lower("tok").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    hist = freq.groupBy("freq").agg(F.count("*").alias("n_f"))
    w = Window.orderBy(F.desc("freq")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = hist.withColumn(
        "off", F.coalesce(F.sum("n_f").over(w), F.lit(0)).cast("long")
    )
    # dyadic buckets the group's rank interval [off+1, off+n_f] touches.
    # Groups that START beyond the last reported bucket must be dropped
    # BEFORE the explode: F.sequence(lo, hi) with lo > hi generates a
    # DESCENDING sequence, not an empty one, so an unguarded explode
    # emits out-of-range buckets and negative overlap counts the moment
    # the vocabulary exceeds 2^n_buckets types (round-6 review repro —
    # exactly the corpus size this two-pass form exists for).
    b_lo = F.length(F.bin(F.col("off") + 1)) - 1
    b_hi = F.length(F.bin(F.col("off") + F.col("n_f"))) - 1
    ex = hist.filter(b_lo <= F.lit(n_buckets - 1)).select(
        "freq",
        "n_f",
        "off",
        F.explode(
            F.sequence(b_lo, F.least(b_hi, F.lit(n_buckets - 1)))
        ).alias("bucket"),
    )
    lo = F.greatest(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"), F.col("off") + 1
    )
    hi = F.least(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1"),
        F.col("off") + F.col("n_f"),
    )
    n_in = (hi - lo + 1).alias("n_in")
    bits = (F.length(F.bin("freq")) - 1).cast("long")
    return (
        ex.select(
            F.col("bucket").cast("long").alias("bucket"),
            n_in,
            (F.col("freq") * (hi - lo + 1)).alias("occ"),
            (bits * (hi - lo + 1)).alias("bits_sum"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_in").cast("long").alias("n_types"),
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.round(
                F.sum("bits_sum").cast("double") / F.sum("n_in"), 6
            ).alias("mean_log2_freq"),
        )
        .orderBy("bucket")
    )


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    n: int = 3,
) -> DataFrame:
    """Per-group n-gram diversity — the distinct-over-total ratio
    (the corpus-level cousin of Self-BLEU): low values mean the group
    repeats itself (template/boilerplate-heavy or mode-collapsed
    synthetic data), high values mean fresh text.

    One explode + one two-level aggregation; the distinct count
    shuffles 16-byte digests, never text.
    """
    tk = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    grams = F.expr(
        f"transform(sequence(1, greatest(size(tk) - {n - 1}, 0)),"
        f" i -> md5(concat_ws(' ', slice(tk, i, {n}))))"
    )
    inst = (
        df.select(F.col(group_col).alias("grp"), tk.alias("tk"))
        .where(F.size("tk") >= n)
        .select("grp", F.explode(grams).alias("g"))
    )
    return (
        inst.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.countDistinct("g").cast("long").alias("n_distinct"),
        )
        .withColumn(
            "diversity",
            F.round(F.col("n_distinct").cast("double") / F.col("n_grams"), 6),
        )
        .orderBy("grp")
    )


def chat_render_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_tokens: int = 12,
) -> DataFrame:
    """SFT/chat-data preparation: split each document into fixed-size
    turns, assign roles, VALIDATE role alternation (starts with user,
    no two consecutive turns share a role — the malformed-conversation
    gate every SFT pipeline runs), render the ChatML-style template
    ``<|role|>text<|end|>``…, and account the loss mask (assistant
    characters / rendered length — what supervised fine-tuning
    actually trains on).

    Roles are an md5-derived function of (doc, turn) so the validator
    exercises both outcomes on real data. All narrow JVM expressions —
    one scan, no shuffle, no Python: the same first-pass shape as the
    quality filters; only valid conversations render (others carry
    NULL template stats).
    """
    tk = tokens_expr(text_col)
    base = df.select(F.col(id_col), tk.alias("tk")).where(F.size("tk") >= 1)
    n_turns = F.ceil(F.size("tk") / F.lit(turn_tokens)).cast("int")
    base = base.select(
        id_col, F.size("tk").alias("n_tokens"), n_turns.alias("n_turns"), "tk"
    )
    # the role hash references the doc id inside the lambda
    turns = F.expr(
        f"transform(sequence(1, cast(ceil(size(tk) / {turn_tokens}) as int)),"
        f" j -> struct(j AS j,"
        f" concat_ws(' ', slice(tk, (j - 1) * {turn_tokens} + 1,"
        f" {turn_tokens})) AS txt,"
        f" CASE WHEN conv(substring(md5(concat(cast({id_col} as string),"
        f" ':', cast(j as string))), 1, 4), 16, 10) % 2 = 0"
        f" THEN 'user' ELSE 'assistant' END AS role))"
    )
    wt = base.withColumn("turns", turns)
    ok = F.expr(
        "turns[0].role = 'user' AND forall("
        "slice(turns, 1, size(turns) - 1),"
        " t -> t.role != turns[t.j].role)"
    )
    rendered = F.expr(
        "aggregate(turns, cast('' as string),"
        " (acc, t) -> acc || '<|' || t.role || '|>' || t.txt || '<|end|>')"
    )
    a_chars = F.expr(
        "aggregate(turns, 0L, (acc, t) ->"
        " acc + CASE WHEN t.role = 'assistant'"
        " THEN length(t.txt) ELSE 0 END)"
    )
    out = wt.withColumn("alternation_ok", ok)
    return out.select(
        id_col,
        "n_tokens",
        "n_turns",
        "alternation_ok",
        F.when(F.col("alternation_ok"), F.length(rendered)).cast("long")
        .alias("rendered_len"),
        F.when(F.col("alternation_ok"), a_chars).cast("long")
        .alias("assistant_chars"),
        F.when(
            F.col("alternation_ok"),
            F.round(a_chars.cast("double") / F.length(rendered), 6),
        ).alias("mask_ratio"),
    )


# ------------------------------------------------------------- unigram LM
def unigram_compositions(
    max_word_len: int = 8, max_piece_len: int = 3
) -> list[tuple[int, int, list[int], list[int], int]]:
    """All ordered compositions of each word length 1..``max_word_len``
    into piece lengths 1..``max_piece_len`` — the closed segmentation
    lattice the unigram trainer joins against.

    Rows are ``(word_len, comp_id, starts, lens, n_parts)``; ``comp_id``
    is the 1-based ordinal of the composition in lexicographic order of
    its part-length tuple, deterministic so it can serve as the final
    Viterbi tie-break IDENTICALLY in Spark and in the DuckDB oracle
    (both sides are generated from this one function). Row count is the
    tribonacci prefix sum — 176 at the defaults — a driver-side literal
    like the IVF centroid tables (operators/similarity.py).
    """
    rows: list[tuple[int, int, list[int], list[int], int]] = []
    for length in range(1, max_word_len + 1):
        comps: list[list[int]] = []

        def rec(remaining: int, acc: list[int]) -> None:
            if remaining == 0:
                comps.append(list(acc))
                return
            for k in range(1, min(max_piece_len, remaining) + 1):
                acc.append(k)
                rec(remaining - k, acc)
                acc.pop()

        rec(length, [])
        for cid, lens in enumerate(comps, start=1):
            starts, pos = [], 1
            for k in lens:
                starts.append(pos)
                pos += k
            rows.append((length, cid, starts, lens, len(lens)))
    return rows


def _comps_by_len(spark, max_word_len: int, max_piece_len: int):
    """Per-length comps-array LocalRelation for the Viterbi — ONE
    source of truth for the grouping + schema (round-7 review: the
    chain and the encode LUT each held a verbatim copy)."""
    by_len: dict[int, list] = {}
    for (L, cid, starts, lens, n) in unigram_compositions(
        max_word_len, max_piece_len
    ):
        by_len.setdefault(L, []).append((cid, starts, lens, n))
    return spark.createDataFrame(
        sorted(by_len.items()),
        "word_len int, comps array<struct<comp_id:int,"
        "starts:array<int>,lens:array<int>,n_parts:int>>",
    )


def _unigram_with_costs(vocab: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cnt, cost) with the exact integer cost
    ``length(bin(total DIV cnt))`` = ⌊log2(total/cnt)⌋ + 1 bits — the
    add-nothing integer surrogate for -log p(piece) (same ⌊log2⌋ trick
    as tfidf / bigram_lm_score, so the whole EM chain stays int64-exact
    cross-engine)."""
    total = vocab.agg(F.sum("cnt").alias("total"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.length(F.bin(F.expr("total DIV cnt"))).cast("long").alias("cost"),
    )


def _validate_unigram_widths(max_word_len: int, max_piece_len: int) -> None:
    """Shared entry guard for both unigram execution paths: the lattice
    is tribonacci in ``max_word_len`` and the distributed Viterbi's
    position-key stride caps piece lengths at 63 (see
    :func:`_unigram_chain`)."""
    if max_word_len > 24:
        raise ValueError(
            f"max_word_len={max_word_len} > 24: the composition "
            "lattice grows ~1.84^len (tribonacci) — 24 is already "
            "~1.4M lattice rows"
        )
    if max_piece_len >= 64:
        raise ValueError(
            f"max_piece_len={max_piece_len} >= 64: the Viterbi "
            "position-key stride supports piece lengths up to 63"
        )


def _unigram_words(
    df: DataFrame, text_col: str, top_words: int, max_word_len: int
) -> DataFrame:
    """The ONLY corpus-sized stage of unigram training: word-frequency
    top-K (lowercase ``[a-z]+`` runs of length ≤ ``max_word_len``), one
    map-side-combined groupBy + distributed top-K — shared by the
    distributed chain and the driver-side EM fast path so both train on
    the byte-identical word table."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .where(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(top_words)
    )


# Fast-path bound: estimated (word × composition) rows the driver-side
# EM may materialize as its numpy lattice. The word table is capped by
# the ``top_words`` PARAMETER (not data size) so this is a
# configuration bound, not a data bound — same discipline as
# mmr_select's max_candidates and the star-contraction fast path.
# 20M rows × 8 parts × 4 B ≈ 640 MB worst case; defaults are ~1M rows.
_UNIGRAM_DRIVER_MAX_COMP_ROWS = 20_000_000


def _unigram_em_driver(
    word_rows: list,
    max_word_len: int,
    max_piece_len: int,
    top_pieces: int,
    budgets: tuple[int, ...],
) -> tuple[list, list]:
    """Driver-side hard-EM over the parameter-capped word table — the
    exact computation of :func:`_unigram_chain`'s EM rounds (same seed
    construction, same integer costs, same (cost, n_parts, comp_id)
    Viterbi tie-break, same (used DESC, piece) prune and Laplace +1),
    vectorized with numpy instead of round-per-round Spark jobs.

    Rationale (optimization r10, guide §1.2 step 1 + §5): after the
    corpus-sized word count, NOTHING in unigram training is data-sized
    — every EM round operates on ≤ top_words words × a tribonacci
    lattice, all bounded by operator parameters. The declarative chain
    paid ~5 eager-checkpoint Spark jobs (each with broadcast builds and
    20k-row exchanges) for tables that fit in driver memory by
    construction; this path computes them in-process. Agreement with
    the distributed chain is pinned by
    ``test_unigram_driver_em_agrees_with_chain``.

    Returns ``(vocab_rows, lut_rows)``: the final vocabulary as
    ``(piece, cnt, cost)`` and the final-vocab Viterbi segment counts
    as ``(word, n_parts)``.
    """
    import numpy as np

    words = [w for (w, _) in word_rows]
    n = len(words)
    if n == 0:
        return [], []
    freq = np.fromiter((f for (_, f) in word_rows), dtype=np.int64, count=n)

    # ---- substring interning + seed counts, one pass (the Python
    # twin of the chain's `subs` explode: every (start, len) substring
    # occurrence, weighted by word freq). slot = start*max_piece_len +
    # (len-1) indexes the per-word substring-id table the lattice
    # assembly below gathers from.
    pid: dict = {}
    pieces: list = [None]  # id 0 = padding (cost 0)
    seed_cnt: list = [0]
    nslots = max_word_len * max_piece_len
    sub = np.zeros((n, nslots), dtype=np.int32)
    for wi, w in enumerate(words):
        ln = len(w)
        f = int(freq[wi])
        base = 0
        for i in range(ln):
            top = min(max_piece_len, ln - i)
            for k in range(1, top + 1):
                p = w[i : i + k]
                j = pid.get(p)
                if j is None:
                    j = len(pieces)
                    pid[p] = j
                    pieces.append(p)
                    seed_cnt.append(0)
                seed_cnt[j] += f
                sub[wi, base + k - 1] = j
            base += max_piece_len

    def with_costs(cnt_by_piece: dict) -> dict:
        total = sum(cnt_by_piece.values())
        return {
            p: {"cnt": c, "cost": (total // c).bit_length()}
            for p, c in cnt_by_piece.items()
        }

    items = [(pieces[j], seed_cnt[j]) for j in range(1, len(pieces))]
    multi = sorted(
        (pc for pc in items if len(pc[0]) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:top_pieces]
    chars = [pc for pc in items if len(pc[0]) == 1]
    vocab = with_costs(dict(multi) | dict(chars))

    # ---- lattice assembly: word-major, comp_id-ordered rows so a
    # single minimum.reduceat per word realizes the struct-min
    # (comp rows within a word ascend by comp_id; the packed key's low
    # 32 bits are the global row index, monotone in comp_id per word)
    by_len: dict = {}
    for (L, cid, starts, lens, np_) in unigram_compositions(
        max_word_len, max_piece_len
    ):
        by_len.setdefault(L, []).append((cid, starts, lens, np_))
    wlen = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    blocks, wid_blocks, nparts_blocks = [], [], []
    for L, comps_L in sorted(by_len.items()):
        wids_L = np.flatnonzero(wlen == L)
        if wids_L.size == 0:
            continue
        nc = len(comps_L)
        # (nw, nc, max_parts) slab: per comp, gather its parts' slot
        # columns from the substring-id table
        slab = np.zeros((wids_L.size, nc, max_word_len), dtype=np.int32)
        for ci, (cid, starts, lens, np_) in enumerate(comps_L):
            slots = [
                (s - 1) * max_piece_len + (k - 1)
                for s, k in zip(starts, lens)
            ]
            slab[:, ci, : len(slots)] = sub[np.ix_(wids_L, slots)]
        blocks.append(slab.reshape(-1, max_word_len))
        wid_blocks.append(np.repeat(wids_L, nc))
        nparts_blocks.append(
            np.tile(
                np.fromiter((c[3] for c in comps_L), dtype=np.int64, count=nc),
                wids_L.size,
            )
        )
    P = np.concatenate(blocks)
    wid = np.concatenate(wid_blocks)
    nparts = np.concatenate(nparts_blocks)
    order = np.argsort(wid, kind="stable")
    P, wid, nparts = P[order], wid[order], nparts[order]
    bounds = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
    word_of_group = wid[bounds]  # == all words, each once

    _OOV = 1 << 20  # a valid piece cost is ≤ 64 bits — no collision
    stride = max_word_len + 1

    def viterbi(vocab_now: dict) -> np.ndarray:
        cost_arr = np.full(len(pieces), _OOV, dtype=np.int64)
        cost_arr[0] = 0
        for p, e in vocab_now.items():
            j = pid.get(p)
            if j is not None:
                cost_arr[j] = e["cost"]
        comp_cost = cost_arr[P].sum(axis=1)
        key = ((comp_cost * stride + nparts) << 32) | np.arange(
            len(P), dtype=np.int64
        )
        best = np.minimum.reduceat(key, bounds)
        if int((best >> 32).max()) // stride >= _OOV:
            raise AssertionError(
                "unigram driver EM: unsegmentable word (char coverage "
                "broken) — the chain invariant guarantees this cannot "
                "happen"
            )
        return (best & 0xFFFFFFFF).astype(np.int64)

    for budget in budgets:
        win = viterbi(vocab)
        usage = np.zeros(len(pieces), dtype=np.int64)
        np.add.at(
            usage,
            P[win].ravel(),
            np.repeat(freq[word_of_group], max_word_len),
        )
        used_ids = np.flatnonzero(usage)
        usage_items = [
            (pieces[j], int(usage[j])) for j in used_ids if j != 0
        ]
        multi_kept = sorted(
            (pc for pc in usage_items if len(pc[0]) >= 2),
            key=lambda pc: (-pc[1], pc[0]),
        )[:budget]
        chars_kept = [
            (p, int(usage[pid[p]]))
            for p in vocab
            if len(p) == 1
        ]
        vocab = with_costs(
            {p: u + 1 for p, u in multi_kept + chars_kept}
        )

    win = viterbi(vocab)
    lut_rows = [
        (words[int(word_of_group[g])], int(nparts[win[g]]))
        for g in range(len(word_of_group))
    ]
    vocab_rows = [(p, e["cnt"], e["cost"]) for p, e in vocab.items()]
    return vocab_rows, lut_rows


def _unigram_driver_fast_path(
    df: DataFrame,
    text_col: str,
    top_words: int,
    max_word_len: int,
    max_piece_len: int,
    top_pieces: int,
    budgets: tuple[int, ...],
) -> tuple[list, list] | None:
    """Run the word top-K in Spark, then the EM driver-side — or return
    None when the parameter-derived lattice bound exceeds
    ``_UNIGRAM_DRIVER_MAX_COMP_ROWS`` (the caller falls back to the
    distributed chain). The collect is ``top_words``-bounded — a
    parameter, never data size."""
    trib: dict[int, int] = {}
    for L in range(1, max_word_len + 1):
        trib[L] = sum(
            trib.get(L - k, 1 if L == k else 0)
            for k in range(1, min(max_piece_len, L) + 1)
        )
    if top_words * max(trib.values()) > _UNIGRAM_DRIVER_MAX_COMP_ROWS:
        return None
    word_rows = [
        (r["word"], r["freq"])
        for r in _unigram_words(
            df, text_col, top_words, max_word_len
        ).collect()
    ]
    return _unigram_em_driver(
        word_rows, max_word_len, max_piece_len, top_pieces, budgets
    )


def _unigram_chain(
    df: DataFrame,
    text_col: str,
    top_words: int,
    max_word_len: int,
    max_piece_len: int,
    top_pieces: int,
    budgets: tuple[int, ...],
    checkpoint_rounds: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared unigram-LM training loop → (words, final vocab, comps).

    SentencePiece's unigram trainer (Kudo 2018, arXiv:1804.10959), the
    OTHER tokenizer family next to BPE, re-expressed as a fully
    declarative hard-EM over a CLOSED segmentation lattice:

    * corpus → top-``top_words`` word-frequency table (words are
      lowercase ``[a-z]+`` runs of length ≤ ``max_word_len``; longer
      words take the per-char fallback at encode time) — the ONLY
      corpus-sized stage, one map-side-combined groupBy + distributed
      top-K, exactly like ``bpe_train_merges``;
    * seed vocabulary = the ``top_pieces`` most frequent multi-char
      substrings (length ≤ ``max_piece_len``, counted with multiplicity
      × word freq) ∪ ALL single chars — chars guarantee every word
      stays segmentable, SentencePiece's required-character set;
    * per EM round (one per entry in ``budgets``):
      E-step: Viterbi segmentation of every word = min total piece cost
      over the composition lattice — a broadcast join of the 176-row
      lattice against the capped word table, pieces sliced JVM-side
      (``substring``), costs joined from the broadcast vocab, invalid
      compositions (any piece out-of-vocab) dropped by the
      ``got = n_parts`` guard, winner per word by
      ``min(struct(cost, n_parts, comp_id))``;
      M-step: piece usage in winning segmentations weighted by word
      freq; PRUNE multi-char pieces to the round's budget by
      (usage DESC, piece) — unigram's defining vocabulary-shrink step —
      chars always retained; Laplace +1 on retained pieces, costs
      recomputed.

    Scale: after the word-count top-K NOTHING is corpus-sized — every
    round is (20k words × 176 comps) exploded to ≲2M piece rows, two
    broadcast joins and two vocab-sized aggregations; document text
    never shuffles and never enters Python (the lattice replaces the
    per-word DP loop SentencePiece runs in C++). ``localCheckpoint``
    per round truncates the O(2^rounds) lineage like the BPE/PageRank
    chains.
    """
    # validate BEFORE unigram_compositions: the lattice is tribonacci
    # in max_word_len (2^79 entries at 80 — a driver hang, round-7
    # review found the Viterbi-side guard fired too late), and the
    # Viterbi position-key stride caps piece lengths at 63
    _validate_unigram_widths(max_word_len, max_piece_len)
    words = _unigram_words(df, text_col, top_words, max_word_len)
    if checkpoint_rounds:
        words = words.localCheckpoint(eager=True)

    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i ->"
        f" transform(sequence(1, least({max_piece_len},"
        " length(word) - i + 1)),"
        " k -> substring(word, i, k))))"
    )
    seeds = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    # seeds feeds multi, chars AND the with_costs total — materialize
    # once (piece-table-sized) so the 420k-substring explode is not
    # re-evaluated 4x inside the seed-vocab checkpoint (round-7 audit)
    if checkpoint_rounds:
        seeds = seeds.localCheckpoint(eager=True)
    multi = (
        seeds.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(top_pieces)
    )
    chars = seeds.where(F.length("piece") == 1)
    vocab = _unigram_with_costs(multi.unionByName(chars))
    if checkpoint_rounds:
        vocab = vocab.localCheckpoint(eager=True)

    spark = df.sparkSession
    comps = spark.createDataFrame(
        unigram_compositions(max_word_len, max_piece_len),
        "word_len int, comp_id int, starts array<int>, "
        "lens array<int>, n_parts int",
    )
    # pre-grouped per-length LocalRelation: hands the Viterbi its comps
    # ARRAY without the runtime groupBy shuffle it would otherwise pay
    # per call (3 calls per train-and-encode; round-7 stage audit)
    comps_by_len = _comps_by_len(spark, max_word_len, max_piece_len)

    for budget in budgets:
        best = _unigram_viterbi(
            words, vocab, comps, max_piece_len, comps_by_len
        )
        usage = (
            best.join(
                F.broadcast(comps),
                (F.length("word") == F.col("word_len"))
                & (best["comp_id"] == comps["comp_id"]),
            )
            .select(
                "word",
                "freq",
                F.explode(F.arrays_zip("starts", "lens")).alias("z"),
            )
            .select(
                F.expr("substring(word, z.starts, z.lens)").alias("piece"),
                "freq",
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("used"))
        )
        multi_kept = (
            usage.where(F.length("piece") >= 2)
            .orderBy(F.desc("used"), "piece")
            .limit(budget)
        )
        chars_kept = (
            vocab.where(F.length("piece") == 1)
            .select("piece")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("used", F.lit(0)).alias("used"))
        )
        vocab = _unigram_with_costs(
            multi_kept.unionByName(chars_kept).select(
                "piece", (F.col("used") + 1).cast("long").alias("cnt")
            )
        )
        if checkpoint_rounds:
            vocab = vocab.localCheckpoint(eager=True)
    return words, vocab, comps


_VITERBI_SENTINEL = 1 << 62


def _unigram_viterbi(
    words: DataFrame,
    vocab: DataFrame,
    comps: DataFrame,
    max_piece_len: int | None = None,
    comps_by_len: DataFrame | None = None,
) -> DataFrame:
    """E-step: per word the min-cost in-vocab composition →
    (word, freq, comp_id, n_parts). Ties break on
    (cost, n_parts, comp_id) — lexicographic struct-min, mirrored by
    the oracle's ROW_NUMBER ordering.

    Round-7 shape (VERDICT r6 #5): the original form exploded
    (word × comp × piece) rows into a words×comps-group aggregate —
    ~3.5M groups shuffled, and this runs three times per
    train-and-encode (two EM rounds + the encode LUT). Now the lattice
    never explodes: per word, piece costs land in ONE position-keyed
    map (a single words-sized shuffle after a broadcast vocab join),
    and the min over compositions is a nested ``aggregate`` over the
    per-length comps ARRAY — interpreted HOF arithmetic over capped
    data, zero additional exchange. A composition with any
    out-of-vocab piece
    sums to NULL (``element_at`` miss) and is skipped by the merge,
    exactly the old ``got = n_parts`` guard."""
    # max piece length: passed by the chain (no per-call job); the
    # collect fallback covers direct callers (bounded: 176 lattice rows)
    max_piece = max_piece_len or comps.agg(
        F.max(F.array_max("lens")).alias("m")
    ).collect()[0]["m"]
    if max_piece >= 64:
        # the position key packs (start, len) as start*64+len —
        # collisions past 63 would silently mis-score compositions
        # (or raise Duplicate map key) instead of erroring here
        raise ValueError(
            f"max_piece_len={max_piece} >= 64: the Viterbi position "
            "key stride supports piece lengths up to 63"
        )
    # NOTE round-7 probe: inlining the vocab as a literal map (like
    # the IVF centroids) is a TRAP here — element_at on a literal map
    # is a linear scan of ArrayBasedMapData (no hash index), so a ~2k
    # entry vocab costs O(|vocab|) per piece lookup and the E-step got
    # ~1.3x SLOWER; the broadcast hash join below is the right lookup.
    # position key: start*64 + len (piece lengths < 64 —
    # collision-free by construction)
    pos_pairs = F.expr(
        "flatten(transform(sequence(1, length(word)), i ->"
        f" transform(sequence(1, least({max_piece},"
        " length(word) - i + 1)),"
        " k -> struct(i * 64 + k AS key,"
        " substring(word, i, k) AS piece))))"
    )
    cmapped = (
        words.select("word", "freq", F.explode(pos_pairs).alias("z"))
        .select("word", "freq", F.col("z.key").alias("key"), F.col("z.piece").alias("piece"))
        .join(F.broadcast(vocab.select("piece", "cost")), "piece")
        .groupBy("word")
        .agg(
            F.first("freq").alias("freq"),
            F.map_from_entries(
                F.collect_list(F.struct("key", "cost"))
            ).alias("cmap"),
        )
    )
    if comps_by_len is None:
        # fallback for direct callers; the chain passes a pre-grouped
        # LocalRelation so no per-call shuffle happens here
        comps_by_len = comps.groupBy("word_len").agg(
            F.collect_list(
                F.struct("comp_id", "starts", "lens", "n_parts")
            ).alias("comps")
        )
    sentinel = F.struct(
        F.lit(_VITERBI_SENTINEL).cast("long").alias("cost"),
        F.lit(2147483647).alias("n_parts"),
        F.lit(2147483647).alias("comp_id"),
    )

    def merge(acc, c):
        cost = F.aggregate(
            F.zip_with(
                c["starts"],
                c["lens"],
                lambda s, l: F.element_at(F.col("cmap"), s * 64 + l),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        cand = F.struct(
            cost.alias("cost"),
            c["n_parts"].alias("n_parts"),
            c["comp_id"].alias("comp_id"),
        )
        return F.when(cost.isNull(), acc).otherwise(F.least(acc, cand))

    return (
        cmapped.join(
            F.broadcast(comps_by_len), F.length("word") == F.col("word_len")
        )
        .select(
            "word",
            "freq",
            F.aggregate(F.col("comps"), sentinel, merge).alias("b"),
        )
        .where(F.col("b.cost") < F.lit(_VITERBI_SENTINEL))
        .select(
            "word",
            "freq",
            F.col("b.comp_id").alias("comp_id"),
            F.col("b.n_parts").alias("n_parts"),
            F.col("b.cost").alias("cost"),
        )
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    top_words: int = 20_000,
    max_word_len: int = 8,
    max_piece_len: int = 3,
    top_pieces: int = 2_000,
    budgets: tuple[int, ...] = (1_200, 800),
    top_out: int = 30,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Train a SentencePiece-style unigram-LM tokenizer vocabulary on
    the corpus (see :func:`_unigram_chain`) and return the ``top_out``
    pieces of the final vocabulary as
    (piece, piece_len, cnt, cost) by (cnt DESC, piece).

    Execution: the corpus-sized word count runs in Spark; the EM over
    the parameter-capped word table runs driver-side
    (:func:`_unigram_em_driver`) when the lattice bound allows,
    falling back to the distributed chain otherwise — identical
    results either way (agreement-tested)."""
    _validate_unigram_widths(max_word_len, max_piece_len)
    fast = _unigram_driver_fast_path(
        df, text_col, top_words, max_word_len, max_piece_len,
        top_pieces, budgets,
    )
    if fast is not None:
        vocab_rows, _ = fast
        out = sorted(vocab_rows, key=lambda r: (-r[1], r[0]))[:top_out]
        return df.sparkSession.createDataFrame(
            [(p, len(p), c, k) for (p, c, k) in out],
            "piece string, piece_len int, cnt long, cost long",
        ).orderBy(F.desc("cnt"), "piece")
    _, vocab, _ = _unigram_chain(
        df, text_col, top_words, max_word_len, max_piece_len,
        top_pieces, budgets, checkpoint_rounds,
    )
    return (
        vocab.select(
            "piece",
            F.length("piece").cast("int").alias("piece_len"),
            "cnt",
            "cost",
        )
        .orderBy(F.desc("cnt"), "piece")
        .limit(top_out)
    )


def unigram_encode_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_words: int = 20_000,
    max_word_len: int = 8,
    max_piece_len: int = 3,
    top_pieces: int = 2_000,
    budgets: tuple[int, ...] = (1_200, 800),
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Encode the corpus under its own trained unigram vocabulary —
    the unigram twin of :func:`bpe_encode_stats`: per document the
    word/token/char counts and compression ratio, where a word's token
    count is its final-vocab Viterbi segment count and out-of-table
    words (rare, or longer than ``max_word_len``) take the per-char
    fallback. One corpus scan + ONE broadcast join against the capped
    (word → n_parts) table + a map-side-combined groupBy(doc_id).

    Training/LUT execution follows :func:`unigram_train`: driver-side
    EM over the parameter-capped word table when the lattice bound
    allows, distributed chain otherwise — identical results."""
    _validate_unigram_widths(max_word_len, max_piece_len)
    fast = _unigram_driver_fast_path(
        df, text_col, top_words, max_word_len, max_piece_len,
        top_pieces, budgets,
    )
    if fast is not None:
        _, lut_rows = fast
        lut = df.sparkSession.createDataFrame(
            lut_rows, "word string, n_parts int"
        )
    else:
        words, vocab, comps = _unigram_chain(
            df, text_col, top_words, max_word_len, max_piece_len,
            top_pieces, budgets, checkpoint_rounds,
        )
        comps_by_len = _comps_by_len(
            df.sparkSession, max_word_len, max_piece_len
        )
        lut = _unigram_viterbi(
            words, vocab, comps, max_piece_len, comps_by_len
        ).select("word", "n_parts")
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    per_word = doc_words.join(F.broadcast(lut), "word", "left").select(
        id_col,
        F.coalesce(F.col("n_parts").cast("long"), F.length("word").cast("long"))
        .alias("n_toks"),
        F.length("word").cast("long").alias("n_chars"),
    )
    return per_word.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_toks").cast("long").alias("n_unigram_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
    )


def doremi_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "lang",
    ref_mod: int = 10,
    top_bigrams: int = 50_000,
    top_unigrams: int = 20_000,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    upweight the domains where a small proxy model's loss most EXCEEDS
    a reference baseline — the one-shot excess-loss form of the paper's
    Group-DRO loop (we take the first-round weights rather than
    iterating proxy retraining, and the proxy is the same add-one
    bigram LM :func:`bigram_lm_score` trains on the ``doc_id %
    ref_mod`` reference slice).

    Per domain d: n_d bigram instances, S_d total integer surprisal
    (⌊log2⌋ bits — exact, same quantization as the perplexity filter).
    Excess loss vs the corpus mean is kept EXACT by cross-
    multiplication instead of division:

        excess_d = S_d · n_tot − S_tot · n_d     (>0 ⟺ above-mean loss)
        weight_bp_d = (max(excess_d, 0) · 10000) DIV Σ max(excess, 0)

    i.e. integer basis points ∝ positive excess; if NO domain is above
    the mean (degenerate single-domain corpora), weights fall back to
    uniform 10000 DIV n_domains. int64-exact for corpora up to ~1e9
    bigrams (10·B² < 2^63); beyond that the same plan runs with DOUBLE
    ratios — the exact form is what the cross-engine oracle gates.

    Scale: identical shape to :func:`bigram_lm_score` — one corpus
    scan explodes bigrams, LM tables are top-K-capped broadcasts, and
    the ONLY additions are a domain-sized (handful of rows) rollup and
    two single-partition windows OVER THAT DOMAIN-SIZED FRAME (a
    5-row window, not a corpus-sized one). Document text never
    shuffles.
    """
    from pyspark.sql import Window

    tk = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    base = df.select(
        F.col(id_col), F.col(domain_col).alias("__d"), tk.alias("tk")
    ).where(F.size("tk") >= 2)
    bgs = F.expr(
        "transform(slice(tk, 1, size(tk) - 1),"
        " (x, i) -> struct(x AS w1, tk[i + 1] AS w2))"
    )
    pairs = base.select(
        F.col(id_col), "__d", F.explode(bgs).alias("bg")
    ).select(id_col, "__d", "bg.w1", "bg.w2")

    ref = pairs.where(F.col(id_col) % ref_mod == 0)
    c2k, c1k, vocab = _bigram_lm_tables(ref, top_bigrams, top_unigrams)

    scored = (
        pairs.join(F.broadcast(c2k), ["w1", "w2"], "left")
        .join(F.broadcast(c1k), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    quo = F.greatest(
        F.expr("(coalesce(c1, 0) + v) DIV (coalesce(c2, 0) + 1)"), F.lit(1)
    )
    surp = (F.length(F.bin(quo)) - 1).cast("long")
    dom = scored.groupBy(F.col("__d").alias(domain_col)).agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(surp).alias("surprisal"),
    )
    w = Window.partitionBy(F.lit(1))
    d2 = dom.select(
        domain_col,
        "n_docs",
        "n_bigrams",
        "surprisal",
        (
            F.col("surprisal") * F.sum("n_bigrams").over(w)
            - F.sum("surprisal").over(w) * F.col("n_bigrams")
        ).alias("excess"),
        F.count("*").over(w).alias("__nd"),
    )
    pos_tot = F.sum(F.greatest(F.col("excess"), F.lit(0))).over(w)
    return d2.select(
        domain_col,
        "n_docs",
        "n_bigrams",
        "surprisal",
        "excess",
        pos_tot.alias("__pt"),
        F.col("__nd"),
    ).select(
        domain_col,
        "n_docs",
        "n_bigrams",
        "surprisal",
        "excess",
        F.when(
            F.col("__pt") > 0,
            F.expr("(greatest(excess, 0) * 10000) DIV __pt"),
        )
        .otherwise(F.expr("10000 DIV __nd"))
        .cast("long")
        .alias("weight_bp"),
    ).orderBy(domain_col)


# ------------------------------------------------------------ WordPiece
def _wordpiece_chain(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    top_words: int,
    checkpoint_rounds: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared WordPiece training loop → (vocab_final, merges).

    Structurally :func:`_bpe_chain` (same capped word table, same
    provably-greedy double-pipe merge application), but merge SELECTION
    uses WordPiece's likelihood objective (Schuster & Nakajima 2012;
    the BERT tokenizer's trainer) instead of raw pair frequency:
    maximize  score = c(lhs,rhs) / (c(lhs) · c(rhs))  — the pair that
    most increases corpus likelihood under a unigram-of-symbols model.
    Quantized to the exact integer
    ``score_q = (c_pair << 20) DIV (c_lhs · c_rhs)`` so the argmax is
    int64-exact cross-engine (ties → lhs, rhs ascending); int64-safe
    while symbol counts stay under ~3e9 (c_pair·2^20 and the count
    product both < 2^63), which the top-20k word cap guarantees at any
    corpus size.

    Scale: identical to BPE training — corpus touched once for the
    word-count top-K; each round is two vocab-sized aggregations (pair
    counts + symbol counts), two broadcast joins, and a 1-row best.
    """
    words = _merge_words(df, text_col, top_words)
    if checkpoint_rounds:
        words = words.localCheckpoint(eager=True)
    vocab = words.select(
        "word",
        F.concat(
            F.lit("||"), F.expr("regexp_replace(word, '(.)', '$1||')")
        ).alias("s"),
        "freq",
    )

    merges = None
    for rank in range(1, num_merges + 1):
        syms = F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')")
        sym_rows = vocab.select(F.explode(syms).alias("sym"), "freq")
        c_sym = sym_rows.groupBy("sym").agg(
            F.sum("freq").cast("long").alias("c")
        )
        prs = F.expr(
            "transform(slice(syms, 1, size(syms) - 1),"
            " (x, i) -> struct(x AS w1, syms[i + 1] AS w2))"
        )
        pairs = (
            vocab.select(syms.alias("syms"), "freq")
            .where(F.size("syms") >= 2)
            .select(F.explode(prs).alias("p"), "freq")
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
        )
        best = (
            pairs.join(
                F.broadcast(c_sym.select(F.col("sym").alias("w1"),
                                         F.col("c").alias("c_lhs"))),
                "w1",
            )
            .join(
                F.broadcast(c_sym.select(F.col("sym").alias("w2"),
                                         F.col("c").alias("c_rhs"))),
                "w2",
            )
            .select(
                "w1",
                "w2",
                "pair_count",
                F.expr("(pair_count * 1048576) DIV (c_lhs * c_rhs)")
                .cast("long")
                .alias("score_q"),
            )
            .orderBy(F.desc("score_q"), "w1", "w2")
            .limit(1)
        )
        ranked = best.select(
            F.lit(rank).alias("merge_rank"),
            F.col("w1").alias("lhs"),
            F.col("w2").alias("rhs"),
            "pair_count",
            "score_q",
        )
        merges = ranked if merges is None else merges.unionByName(ranked)
        vocab = vocab.crossJoin(F.broadcast(best.select("w1", "w2"))).select(
            "word",
            F.expr(
                "replace(s, '|' || w1 || '||' || w2 || '|',"
                " '|' || w1 || w2 || '|')"
            ).alias("s"),
            "freq",
        )
        if checkpoint_rounds and rank < num_merges:
            vocab = vocab.localCheckpoint(eager=True)
    return vocab, merges


def wordpiece_train_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
    top_words: int = 20_000,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Train WordPiece merges (likelihood objective — see
    :func:`_wordpiece_chain`); returns the learned merge table
    (merge_rank, lhs, rhs, pair_count, score_q) in order.

    Execution follows :func:`bpe_train_merges`: driver-side merge loop
    over the parameter-capped word table when the fast-path bounds
    allow, the distributed chain otherwise — identical results either
    way (agreement-tested)."""
    fast = _merge_driver_fast_path(
        df, text_col, num_merges, top_words, wordpiece=True
    )
    if fast is not None:
        _, merges_rows = fast
        return df.sparkSession.createDataFrame(
            merges_rows,
            "merge_rank int, lhs string, rhs string, pair_count long,"
            " score_q long",
        ).orderBy("merge_rank")
    _, merges = _wordpiece_chain(
        df, text_col, num_merges, top_words, checkpoint_rounds
    )
    return merges.orderBy("merge_rank")


def _wordpiece_maxmatch_n_parts(word: str, pieces: set) -> int | None:
    """Driver-side MaxMatch (greedy longest-match-first with
    backtracking): part count of the segmentation whose part-length
    sequence is lexicographically largest among vocab-valid
    segmentations, or None when no valid segmentation exists — exactly
    the lattice path's ``max(struct(lens_key, n_parts))`` winner, for
    single-digit part lengths (``max_word_len`` ≤ 9, which the caller
    gates on: at ≥10 the lattice's DIGIT-STRING key order diverges
    from longest-first and the distributed path decides).

    Greedy-with-backtracking returns the lex-largest length sequence:
    at each position it takes the longest in-vocab piece whose
    remainder is segmentable; any other valid segmentation starts with
    a shorter (lex-smaller) piece there. Equal-sum sequences are never
    prefixes of each other, so elementwise comparison decides."""
    n = len(word)
    dead: set = set()

    def rec(pos: int) -> int | None:
        if pos == n:
            return 0
        if pos in dead:
            return None
        for ln in range(n - pos, 0, -1):
            if word[pos : pos + ln] in pieces:
                sub = rec(pos + ln)
                if sub is not None:
                    return 1 + sub
        dead.add(pos)
        return None

    return rec(0)


def wordpiece_encode_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 6,
    top_words: int = 20_000,
    max_word_len: int = 8,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Encode the corpus with WordPiece's OWN encoder: greedy
    longest-match-first (MaxMatch) against the trained piece vocabulary
    — NOT merge replay (that is BPE's apply). Expressed declaratively
    over the full composition lattice (parts up to ``max_word_len``):
    among the compositions whose pieces are all in the vocabulary, the
    MaxMatch segmentation is the one with lexicographically-largest
    part-length sequence — longest first piece, then longest second
    piece, … — with backtracking (the MaxMatch variant that always
    finds a valid segmentation when one exists, instead of emitting
    [UNK] like BERT's encoder; words with no valid segmentation, or
    longer than ``max_word_len``, take the per-char fallback).

    Per document: n_words, n_wordpiece_tokens, n_chars,
    chars_per_token — same contract as the BPE/unigram encode twins.
    Scale: training is the BPE shape; encoding is one corpus scan +
    ONE broadcast join against the capped (word → n_parts) table.

    Training/LUT execution follows :func:`wordpiece_train_merges`:
    driver-side merge loop + MaxMatch
    (:func:`_wordpiece_maxmatch_n_parts`) over the parameter-capped
    word table when the fast-path bounds allow, the distributed
    chain + composition lattice otherwise — identical results.
    """
    fast = (
        _merge_driver_fast_path(
            df, text_col, num_merges, top_words, wordpiece=True
        )
        if max_word_len <= 9
        else None
    )
    if fast is not None:
        vocab_rows, _ = fast
        piece_set: set = set()
        for (_w, s, _freq) in vocab_rows:
            piece_set.update(x for x in s.split("||") if x)
        lut_rows = []
        for (w, _s, _freq) in vocab_rows:
            if len(w) <= max_word_len:
                np_ = _wordpiece_maxmatch_n_parts(w, piece_set)
                if np_ is not None:
                    lut_rows.append((w, np_))
        lut = df.sparkSession.createDataFrame(
            lut_rows, "word string, n_parts int"
        )
    else:
        vocab, _ = _wordpiece_chain(
            df, text_col, num_merges, top_words, checkpoint_rounds
        )
        syms = F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')")
        pv = (
            vocab.select(F.explode(syms).alias("piece")).distinct()
        )
        words = vocab.select("word").where(F.length("word") <= max_word_len)

        spark = df.sparkSession
        comp_rows = [
            (L, cid, starts, lens, n, "".join(str(k) for k in lens))
            for (L, cid, starts, lens, n) in unigram_compositions(
                max_word_len, max_word_len
            )
        ]
        comps = spark.createDataFrame(
            comp_rows,
            "word_len int, comp_id int, starts array<int>, "
            "lens array<int>, n_parts int, lens_key string",
        )
        cand = (
            words.join(
                F.broadcast(comps), F.length("word") == F.col("word_len")
            )
            .select(
                "word",
                "comp_id",
                "n_parts",
                "lens_key",
                F.explode(F.arrays_zip("starts", "lens")).alias("z"),
            )
            .select(
                "word",
                "comp_id",
                "n_parts",
                "lens_key",
                F.expr("substring(word, z.starts, z.lens)").alias("piece"),
            )
        )
        valid = (
            cand.join(F.broadcast(pv), "piece")
            .groupBy("word", "comp_id")
            .agg(
                F.count("*").alias("got"),
                F.min("n_parts").alias("n_parts"),
                F.min("lens_key").alias("lens_key"),
            )
            .where(F.col("got") == F.col("n_parts"))
        )
        # MaxMatch: lexicographically-largest part-length key. Distinct
        # compositions have distinct keys (equal sums forbid prefixes),
        # so no further tie-break is needed.
        lut = (
            valid.groupBy("word")
            .agg(F.max(F.struct("lens_key", "n_parts")).alias("b"))
            .select("word", F.col("b.n_parts").alias("n_parts"))
        )
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    per_word = doc_words.join(F.broadcast(lut), "word", "left").select(
        id_col,
        F.coalesce(F.col("n_parts").cast("long"), F.length("word").cast("long"))
        .alias("n_toks"),
        F.length("word").cast("long").alias("n_chars"),
    )
    return per_word.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_toks").cast("long").alias("n_wordpiece_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
    )


# ------------------------------------------- Gopher repetition (A1.2)
GOPHER_TOP_NGRAM_PCT = {2: 20, 3: 18, 4: 16}
GOPHER_DUP_NGRAM_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def gopher_repetition_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The published Gopher REPETITION rules (Rae et al. 2021,
    appendix A1.2) — the second half of the named Gopher filter next
    to :func:`gopher_quality_filter` (A1.1). Per document:

    * duplicate line / paragraph fraction <= 30%
    * duplicate line / paragraph CHARACTER fraction <= 20%
    * top word-{2,3,4}-gram character fraction <= 20/18/16%
    * duplicate word-{5..10}-gram character fraction <= 15..10%

    Character-fraction convention (documented deterministic variant,
    the occurrence-weighted form most public reimplementations use):
    "characters in duplicated n-grams" = sum over grams with count>=2
    of count x gram-length; "characters in the top n-gram" =
    top-count x gram-length, counted only when the top gram occurs at
    least TWICE (a gram seen once is not repetition — without the
    guard every short document fails on its first 2-gram);
    denominator = length(text). Overlapping
    occurrences may double-count characters, so a fraction can exceed
    1 — thresholds compare as exact integer cross-multiplications
    (chars x 100 <= pct x n_chars) so the contract is int64-exact
    cross-engine; the reported fractions ride along rounded. Top-gram
    ties break to the lexicographically LARGEST gram (max over
    (count, gram) structs — deterministic both engines).

    Scale: line/paragraph stats are pure array expressions (zero
    shuffle, O(L^2) within-row on the handful of lines per doc). The
    n-gram stats are ONE explode producing ~9x-words (n, gram) rows,
    one map-side-combined groupBy(doc, n, gram), a tiny per-(doc, n)
    rollup, and a doc-keyed join back — no corpus text ever shuffles,
    only grams.
    """
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        tokens_expr(text_col).alias("tk"),
        F.length(text_col).cast("long").alias("n_chars"),
    )

    # ---- line / paragraph duplicate stats: array expressions only
    def _segs(sep: str) -> Column:
        return F.filter(
            F.split(F.col("_t"), sep), lambda x: F.trim(x) != ""
        )

    def _seg_cols(segs: Column, pfx: str) -> list[Column]:
        n = F.size(segs)
        nd = F.size(F.array_distinct(segs))
        tot = F.aggregate(
            segs, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        dup = F.aggregate(
            segs,
            F.lit(0).cast("long"),
            lambda a, x: a
            + F.when(
                F.size(F.filter(segs, lambda y: y == x)) >= 2, F.length(x)
            ).otherwise(F.lit(0)),
        )
        return [
            n.cast("long").alias(f"_{pfx}_n"),
            nd.cast("long").alias(f"_{pfx}_nd"),
            tot.alias(f"_{pfx}_tot"),
            dup.alias(f"_{pfx}_dup"),
        ]

    seg = base.select(
        F.col(id_col),
        "n_chars",
        *_seg_cols(_segs("\n"), "ln"),
        *_seg_cols(_segs("\n\n"), "pg"),
    )

    # ---- n-gram stats: ONE posexplode + lead(1..9) window builds all
    # nine gram widths per token position (the exploded_shingles
    # rationale: higher-order transform lambdas run interpreted per
    # element — this exact stage measured 12 s at sf0.1 as nested
    # HOFs, ~3 s as the codegen'd window form); a window gram is valid
    # only when its last lead is non-null (full windows only, matching
    # the size>=n contract)
    from pyspark.sql import Window

    max_n = max(GOPHER_DUP_NGRAM_PCT)
    pos = base.repartition(F.col(id_col)).select(
        F.col(id_col), F.posexplode("tk").alias("_pos", "_tok")
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    led = pos.select(
        F.col(id_col),
        "_tok",
        *[
            F.lead("_tok", j).over(w).alias(f"_l{j}")
            for j in range(1, max_n)
        ],
    )
    leads = [F.col(f"_l{j}") for j in range(1, max_n)]
    entries = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.when(
                    leads[n - 2].isNotNull(),
                    F.concat_ws(" ", F.col("_tok"), *leads[: n - 1]),
                ).alias("gram"),
            )
            for n in range(2, max_n + 1)
        ]
    )
    grams = (
        led.select(F.col(id_col), F.explode(entries).alias("g"))
        .select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .where(F.col("gram").isNotNull())
    )
    cnt = grams.groupBy(id_col, "n", "gram").agg(
        F.count("*").cast("long").alias("c")
    )
    # one conditional aggregation straight off the (doc, n, gram)
    # counts — (doc, n) is a refinement of (doc), so a separate per-n
    # rollup would only add an exchange
    def _top_chars(k: int) -> Column:
        best = F.max(F.when(F.col("n") == k, F.struct("c", "gram")))
        return F.when(
            best["c"] >= 2, best["c"] * F.length(best["gram"])
        ).otherwise(F.lit(0)).cast("long")

    wide = cnt.groupBy(id_col).agg(
        *[
            _top_chars(k).alias(f"_top{k}")
            for k in GOPHER_TOP_NGRAM_PCT
        ],
        *[
            F.sum(
                F.when(
                    (F.col("n") == k) & (F.col("c") >= 2),
                    F.col("c") * F.length("gram"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"_dup{k}")
            for k in GOPHER_DUP_NGRAM_PCT
        ],
    )

    j = seg.join(wide, id_col, "left")
    frac_cols: list[Column] = []
    checks: list[Column] = []

    def _frac(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, F.round(num.cast("double") / den, 6)
        ).otherwise(F.lit(0.0))

    for pfx, out in (("ln", "line"), ("pg", "para")):
        n, nd = F.col(f"_{pfx}_n"), F.col(f"_{pfx}_nd")
        tot, dup = F.col(f"_{pfx}_tot"), F.col(f"_{pfx}_dup")
        frac_cols.append(_frac(n - nd, n).alias(f"dup_{out}_frac"))
        frac_cols.append(_frac(dup, tot).alias(f"dup_{out}_char_frac"))
        checks.append((n - nd) * 100 <= 30 * n)
        checks.append(dup * 100 <= 20 * F.greatest(tot, F.lit(1)))
    for k, pct in GOPHER_TOP_NGRAM_PCT.items():
        chars = F.coalesce(F.col(f"_top{k}"), F.lit(0))
        frac_cols.append(_frac(chars, F.col("n_chars")).alias(f"top{k}_frac"))
        checks.append(chars * 100 <= pct * F.col("n_chars"))
    for k, pct in GOPHER_DUP_NGRAM_PCT.items():
        chars = F.coalesce(F.col(f"_dup{k}"), F.lit(0))
        frac_cols.append(_frac(chars, F.col("n_chars")).alias(f"dup{k}_frac"))
        checks.append(chars * 100 <= pct * F.col("n_chars"))

    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    return j.select(
        F.col(id_col), F.col("n_chars"), *frac_cols,
        passed.alias("gopher_rep_pass"),
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    **lm_kwargs,
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data")
    — the named step after language ID: score every document with a
    language-model perplexity (here :func:`bigram_lm_score`'s exact
    integer surprisal, the KenLM stand-in), then split EACH LANGUAGE
    into three equal-mass buckets by score; downstream pipelines keep
    ``head`` (and often ``middle``) and drop ``tail``.

    Cutoffs are VALUE-based, the paper's percentile-threshold form
    (CCNet computes p33/p67 cutoffs then assigns by comparison), not
    row-number NTILE: the per-language cutoff is the smallest
    quantized score ``ppl_q = surprisal*1_000_000 DIV n_bigrams`` at
    which the cumulative doc count reaches 1/3 (resp. 2/3) of the
    language — exact integer logic (cum*3 >= total), ties-by-value all
    land in the same bucket, so the contract needs no doc ordering.

    Scale: LM train/score is :func:`bigram_lm_score` (capped broadcast
    tables). Bucketing adds one map-side-combined histogram aggregate
    over (lang, ppl_q), a per-language cumulative window over the
    HISTOGRAM (|distinct scores| rows, not documents), and a broadcast
    join of the per-language cutoff row — no corpus-sized sort.
    Documents with fewer than 2 tokens have no bigrams and are absent,
    matching the scorer.
    """
    from pyspark.sql import Window

    scored = bigram_lm_score(df, text_col, id_col, **lm_kwargs)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # The scored table feeds BOTH the cutoff histogram and the final
    # bucket assignment; without materialization the whole LM
    # score pipeline (corpus bigram explode + broadcast probes +
    # per-doc rollup) is evaluated twice — Catalyst shares no common
    # subplans across the self-join (optimization r11, guide §2.4).
    # Five narrow columns per document: doc-count-sized, never
    # text-sized, so the checkpoint is scale-safe.
    j = scored.join(langs, id_col).select(
        id_col,
        "lang",
        "n_bigrams",
        "surprisal",
        F.expr("surprisal * 1000000 DIV n_bigrams").alias("ppl_q"),
    ).localCheckpoint()
    hist = j.groupBy("lang", "ppl_q").agg(F.count("*").alias("h"))
    w = Window.partitionBy("lang").orderBy("ppl_q")
    cum = hist.select(
        "lang",
        "ppl_q",
        F.sum("h").over(w).alias("cum"),
        F.sum("h").over(Window.partitionBy("lang")).alias("total"),
    )
    cuts = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("total"), F.col("ppl_q")))
        .alias("head_cut"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("total"), F.col("ppl_q")))
        .alias("tail_cut"),
    )
    return j.join(F.broadcast(cuts), "lang").select(
        F.col(id_col),
        "lang",
        "n_bigrams",
        "surprisal",
        "ppl_q",
        F.when(F.col("ppl_q") <= F.col("head_cut"), F.lit("head"))
        .when(F.col("ppl_q") <= F.col("tail_cut"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer-fertility comparison across all THREE
    trained tokenizer families — the selection table a tokenizer-
    choice pipeline produces before committing a vocabulary: train BPE
    (frequency argmax), unigram-LM (Viterbi under the EM-pruned
    vocab), and WordPiece (likelihood argmax + MaxMatch) each on the
    corpus itself, encode the corpus under each, and report per
    language the corpus mass and each family's chars-per-token
    compression (higher = fewer tokens for the same text = cheaper
    training/inference for that language).

    Scale: the three training chains each touch the corpus once for
    their capped word table; encoding is three broadcast-LUT joins;
    the final rollup groups by (lang) after a doc-level join of the
    three per-doc stat tables — record-level columns only, text never
    re-shuffles.
    """
    bpe = bpe_encode_stats(df, text_col, id_col).select(
        id_col, "n_words", "n_chars", "n_bpe_tokens"
    )
    uni = unigram_encode_stats(df, text_col, id_col).select(
        id_col, "n_unigram_tokens"
    )
    wp = wordpiece_encode_stats(df, text_col, id_col).select(
        id_col, "n_wordpiece_tokens"
    )
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    j = bpe.join(uni, id_col).join(wp, id_col).join(langs, id_col)

    def _cpt(tok_col: str) -> Column:
        return F.round(
            F.sum("n_chars").cast("double") / F.sum(tok_col), 6
        )

    return (
        j.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_bpe_tokens").cast("long").alias("bpe_tokens"),
            F.sum("n_unigram_tokens").cast("long").alias("unigram_tokens"),
            F.sum("n_wordpiece_tokens").cast("long").alias("wordpiece_tokens"),
            _cpt("n_bpe_tokens").alias("bpe_chars_per_token"),
            _cpt("n_unigram_tokens").alias("unigram_chars_per_token"),
            _cpt("n_wordpiece_tokens").alias("wordpiece_chars_per_token"),
        )
        .orderBy("lang")
    )


def nb_langid(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    ref_mod: int = 10,
    top_tokens: int = 20_000,
) -> DataFrame:
    """Multinomial Naive-Bayes language ID, TRAINED ON THE DATA — the
    fastText-supervised pattern behind CCNet/cc_net's lang-id stage,
    reduced to its exact-arithmetic core (a trained classifier, unlike
    :func:`lang_guess`'s frozen stopword lists). Train per-language
    token counts on the ``doc_id % ref_mod == 0`` reference slice;
    classify EVERY document as the language minimizing total token
    surprisal under add-one smoothing; return the language confusion
    matrix (actual x predicted with doc counts) — the classifier-
    quality readout a curation pipeline reviews before trusting the
    labels.

    Exactness: per-(token, lang) surprisal is the same integer-log2
    quantization as :func:`bigram_lm_score`:

        q    = (T_lang + V) DIV (c(token, lang) + 1)
        bits = floor(log2(q)) = length(bin(q)) - 1

    (uniform class prior — the argmin is over likelihoods only). The
    per-doc argmin breaks ties to the alphabetically first language —
    min over (bits, lang) structs, exact cross-engine.

    Scale: the model is a ``top_tokens``-capped (token, lang, count)
    table (distributed top-K on the token's total reference count) —
    broadcastable at any corpus size, like the bigram LM. Scoring
    explodes corpus tokens once, cross-joins the (tiny, broadcast)
    language list, left-joins the broadcast model, and rolls up
    (doc, lang) -> doc argmin -> (actual, predicted) counts: nothing
    corpus-sized shuffles except the token explode's doc-keyed
    aggregates, all map-side combined.

    Training-side shape (optimization r11, guide §2.4): the language
    list, per-language totals, vocabulary size, token top-K and model
    all derive from ONE vocab-bounded (token, lang, count) aggregate of
    the reference slice — formerly each was its own broadcast subtree
    re-tokenizing the slice (5 evaluations of the reference explode; at
    corpus scale that is 5 scans of the 1/ref_mod slice). The bounded
    table persists across the derivations, exactly the capped-table
    discipline of the tokenizer trainers; every derived value is
    identical (Σ per-(token,lang) counts ≡ the direct counts).
    """
    toks = df.select(
        F.col(id_col),
        F.col(lang_col).alias("actual"),
        F.explode(tokens_expr(text_col)).alias("token"),
    ).select(id_col, "actual", F.lower(F.col("token")).alias("token"))

    ref = toks.where(F.col(id_col) % ref_mod == 0)
    tok_lang = (
        ref.groupBy("token", F.col("actual").alias("lang"))
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    langs = tok_lang.select("lang").distinct()
    totals = tok_lang.groupBy("lang").agg(
        F.sum("c").cast("long").alias("t_lang")
    )
    by_tok = tok_lang.groupBy("token").agg(F.sum("c").alias("_tot"))
    vocab = by_tok.agg(F.count("*").alias("v"))
    kept = by_tok.orderBy(F.desc("_tot"), "token").limit(top_tokens)
    model = tok_lang.join(F.broadcast(kept.select("token")), "token").select(
        "token", "lang", "c"
    )

    scored = (
        toks.crossJoin(F.broadcast(langs))
        .join(F.broadcast(model), ["token", "lang"], "left")
        .join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "actual",
            "lang",
            (
                F.length(
                    F.bin(
                        F.expr("(t_lang + v) DIV (coalesce(c, 0) + 1)")
                    )
                )
                - 1
            )
            .cast("long")
            .alias("bits"),
        )
    )
    per_doc = (
        scored.groupBy(id_col, "actual", "lang")
        .agg(F.sum("bits").alias("total_bits"))
        .groupBy(id_col, "actual")
        .agg(F.min(F.struct("total_bits", "lang")).alias("best"))
        .select(id_col, "actual", F.col("best.lang").alias("predicted"))
    )
    return (
        per_doc.groupBy("actual", "predicted")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


def c4_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning...", §2.2 — the filter behind the most-used
    public pretraining corpus). Line level: keep only lines that end in
    terminal punctuation (. ! ? ") AND contain at least five words AND
    do not mention "javascript" (case-insensitive). Page level: drop
    the page when the kept text has fewer than 3 sentences (terminal
    punctuation marks), or mentions "lorem ipsum", or contains a curly
    brace (code).

    Per document: n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, kept_chars, kept_hash (md5 of the newline-joined kept
    lines — the cleaned page), c4_keep. Pure scan-stage array
    expressions — zero shuffle, zero Python, the same first-pass shape
    as the Gopher rules; runs unchanged on a stream.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != ""
    )
    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]\\s*$')
        & (F.size(F.split(F.trim(x), r"\s+")) >= 5)
        & ~F.lower(x).contains("javascript"),
    )
    kept_text = F.array_join(kept, "\n")
    # sentence count = terminal-punct chars in the KEPT text (translate
    # strips them; the length delta is the count — codegen, no split)
    n_sentences = F.length(kept_text) - F.length(
        F.translate(kept_text, ".!?", "")
    )
    lower = F.lower(F.col(text_col))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{") | F.col(text_col).contains("}")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        F.length(kept_text).cast("long").alias("kept_chars"),
        F.md5(kept_text).alias("kept_hash"),
        (
            (n_sentences >= 3) & ~has_lorem & ~has_brace
        ).alias("c4_keep"),
    )


def paragraph_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Cross-document paragraph deduplication — CCNet's preprocessing
    step (Wenzek et al. 2020 §3.1: paragraphs are hashed and every
    paragraph seen elsewhere in the corpus shard is removed — the
    boilerplate killer that deletes headers/footers/cookie banners).
    Per document: paragraph count, how many are corpus-level
    boilerplate (hash occurs >= ``min_count`` times across ALL docs),
    and the character fraction boilerplate removal would delete.

    Scale: paragraphs explode to (doc, md5, length) rows — the 32-byte
    hash is the ONLY text-derived value that shuffles (exact_dedup's
    rule); one map-side-combined count on the hash, one hash-keyed join
    back, one doc rollup.
    """
    paras = F.filter(
        F.split(F.col(text_col), "\n\n"), lambda x: F.trim(x) != ""
    )
    ex = df.select(F.col(id_col), F.explode(paras).alias("_p")).select(
        id_col,
        F.md5(F.trim(F.col("_p"))).alias("ph"),
        F.length(F.trim(F.col("_p"))).cast("long").alias("chars"),
    )
    counts = ex.groupBy("ph").agg(F.count("*").cast("long").alias("gc"))
    j = ex.join(counts, "ph")
    boiler = (F.col("gc") >= min_count).cast("long")
    return j.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(boiler).cast("long").alias("n_boiler"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum(F.col("chars") * boiler).cast("long").alias("boiler_chars"),
        F.round(
            F.sum(F.col("chars") * boiler).cast("double")
            / F.greatest(F.sum("chars"), F.lit(1)),
            6,
        ).alias("boiler_char_frac"),
    )


def temperature_sampling_weights(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based multilingual sampling weights — the
    exponential smoothing mT5 / XLM-R use to up-sample low-resource
    languages: p_l ∝ n_l^alpha with alpha = 1/2 (alpha is FIXED at 1/2
    here because IEEE-754 ``sqrt`` is correctly rounded and therefore
    bit-identical across engines, unlike ``pow`` with a fractional
    exponent, whose libm rounding may differ). Weights are reported in
    parts-per-``scale`` via floor division, summing to <= scale.

    Scale: one map-side-combined token count per language, then
    arithmetic over the |languages|-row table — nothing else moves.
    """
    per = (
        df.select(F.col(lang_col).alias("lang"), tokens_expr(text_col).alias("tk"))
        .groupBy("lang")
        .agg(F.sum(F.size("tk")).cast("long").alias("tokens"))
    )
    smoothed = per.select(
        "lang", "tokens", F.sqrt(F.col("tokens").cast("double")).alias("_s")
    )
    total = smoothed.agg(F.sum("_s").alias("_tot"))
    return (
        smoothed.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "tokens",
            F.floor(F.col("_s") * scale / F.col("_tot"))
            .cast("long")
            .alias("weight_ppm"),
        )
        .orderBy("lang")
    )


# ------------------------------------ content-defined chunking (CDC)
CDC_WINDOW = 8
CDC_BASE = 257
CDC_MOD = 1_000_003
CDC_DIVISOR = 64


def content_defined_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-defined chunking — the Rabin-fingerprint boundary rule
    of LBFS / FastCDC, the storage-dedup chunker: a chunk boundary
    falls after any ``CDC_WINDOW``-char window whose rolling hash is
    0 mod ``CDC_DIVISOR`` (expected chunk ≈ 64 chars + window). Unlike
    fixed-stride chunking (``doc_chunks``), boundaries move WITH the
    content: inserting a prefix shifts every fixed-stride chunk but
    leaves CDC boundaries after the edit point intact — the property
    that makes cross-document chunk dedup survive edits (test-pinned).

    Hash: Horner fold ``H = (H*257 + code(char)) mod 1_000_003`` over
    each window — all int64, exact in any engine (values stay under
    2^38).

    Shape: the SAME computation as nested higher-order lambdas ran
    66 s at sf0.1 (interpreted per element — the exploded_shingles /
    Gopher-A1.2 finding); this form posexplodes characters once, takes
    lead(1..7) over the doc-ordered window, computes each window hash
    as a plain codegen expression, and collects the per-doc boundary
    list (tiny) to cut chunk spans — a few seconds at the same scale.
    """
    from pyspark.sql import Window

    chars = df.repartition(F.col(id_col)).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "")).alias("_pos", "_ch"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    cols = [F.ascii("_ch")] + [
        F.ascii(F.lead("_ch", j).over(w)) for j in range(1, CDC_WINDOW)
    ]
    h = F.lit(0).cast("long")
    for c in cols:
        h = (h * CDC_BASE + c) % CDC_MOD
    led = chars.select(
        F.col(id_col),
        F.col("_pos"),
        F.lead("_ch", CDC_WINDOW - 1).over(w).isNotNull().alias("_full"),
        h.alias("_h"),
    )
    ends = (
        led.where(F.col("_full") & (F.col("_h") % CDC_DIVISOR == 0))
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.col("_pos") + CDC_WINDOW)
            ).alias("_ends")
        )
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("long").alias("_L"),
    ).join(ends, id_col, "left")
    endsc = F.coalesce(F.col("_ends"), F.array().cast("array<long>"))
    starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(endsc, lambda e: e + 1),
    )
    allends = F.concat(endsc, F.array(F.col("_L")))
    spans = F.filter(
        F.zip_with(
            starts, allends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda z: z["s"] <= z["e"],
    )
    chunks = F.transform(
        spans, lambda z: F.col("_t").substr(z["s"], z["e"] - z["s"] + 1)
    )
    ex = base.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    )
    return ex.select(
        id_col,
        "chunk_idx",
        F.md5(F.col("_c")).alias("chunk_md5"),
        F.length(F.col("_c")).cast("long").alias("chunk_len"),
    )


def cdc_chunk_dedup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Cross-document chunk dedup over content-defined chunks: per doc
    the chunk count and the character fraction covered by chunks whose
    hash occurs >= ``min_count`` times corpus-wide — the storage-dedup
    ratio readout. Only 32-byte chunk hashes shuffle."""
    from pyspark.sql import Window

    ex = content_defined_chunks(df, text_col, id_col)
    # corpus-wide chunk counts as a count window over the hash instead
    # of an aggregate + join-back (optimization r11, guide §2.4, the
    # remove_duplicated_spans adjudication): the join's probe side
    # re-evaluated the whole chunker — a per-character posexplode +
    # lead window, by far the operator's dominant cost — while the
    # window form runs it once and shuffles only the chunk rows
    # (hash + len + ids) it was shuffling anyway.
    j = ex.withColumn(
        "gc", F.count("*").over(Window.partitionBy("chunk_md5"))
    )
    shared = (F.col("gc") >= min_count).cast("long")
    return j.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(shared).cast("long").alias("n_shared_chunks"),
        F.sum("chunk_len").cast("long").alias("total_chars"),
        F.sum(F.col("chunk_len") * shared).cast("long").alias("shared_chars"),
        F.round(
            F.sum(F.col("chunk_len") * shared).cast("double")
            / F.greatest(F.sum("chunk_len"), F.lit(1)),
            6,
        ).alias("shared_char_frac"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: tuple[str, ...] = ("spamword", "casino", "viagra", "xxx"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocklist gating — the C4 §2.2 "bad words" step (C4 uses the
    LDNOOBW list; the list here is a CONFIGURABLE parameter with a
    spam-flavored default, since the mechanism — not the lexicon — is
    the operator). A document is dropped when any blocked word appears
    as a whole token (lowercased); per doc: hit count, distinct terms
    hit, and the keep flag.

    Scale: the list is a literal in the scan-stage expression (the
    broadcast-LUT degenerate case) — zero shuffle, zero Python,
    streaming-safe like every first-pass gate here.
    """
    toks = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    hits = F.filter(toks, lambda x: x.isin(*blocklist))
    return df.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_blocked_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_blocked_terms"),
        (F.size(hits) == 0).alias("blocklist_pass"),
    )


def _sql_str_lit(s: str) -> str:
    """Render a Python string as a SQL string literal (quote doubling)."""
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Quantized character entropy (gibberish / encoded-blob signal)

CHAR_ENTROPY_ALPHABET: tuple[str, ...] = tuple("abcdefghijklmnopqrstuvwxyz") + (" ",)


def char_entropy_fragments(
    s: str = "s", n: str = "n", cnts: str = "cnts"
) -> tuple[tuple[str, str], tuple[str, str]]:
    """SQL fragments for the quantized char-entropy computation:
    ``((spark_counts, spark_bits), (duck_counts, duck_bits))``. The
    counts expression yields the 27-bucket histogram array from columns
    ``s`` (lowered text) and ``n`` (its length, BIGINT, > 0); the bits
    expression yields per-doc ``surprisal_bits`` from ``cnts`` + ``n``.
    The column names are parameters (plain identifiers) so callers can
    pick collision-proof internal names.

    The per-character counts use the replace-length trick —
    ``length(s) - length(replace(s, c, ''))`` — so the whole 27-bucket
    histogram is ONE higher-order ``transform`` over a literal char
    array evaluated in the scan: no explode (a per-char explode would
    be n_chars rows per document), no shuffle, no Python — and no
    28-way CASE-tree blowup after projection collapse (the hand-rolled
    column-per-bucket form planned in tens of seconds; this form plans
    instantly). Entropy is quantized to integer bits with the module's
    ⌊log2⌋ contract (``length(bin(q)) - 1``): surprisal = Σ over
    buckets of cnt · ⌊log2(n ÷ cnt)⌋ — the add-nothing integer
    surrogate for -Σ cnt·log2(p), bit-exact across engines. The
    leftover "other" bucket (n − Σ counts) is appended so non-alphabet
    mass (digits, punctuation, CJK) is one bucket, not a crash.
    """
    lits = ", ".join(f"'{c}'" for c in CHAR_ENTROPY_ALPHABET)
    spark_counts = (
        f"transform(array({lits}),"
        f" ch -> CAST(length({s}) - length(replace({s}, ch, '')) AS BIGINT))"
    )
    spark_bits = (
        f"aggregate(filter(array_append({cnts},"
        f" {n} - aggregate({cnts}, CAST(0 AS BIGINT), (a, x) -> a + x)),"
        f" x -> x > 0),"
        f" CAST(0 AS BIGINT),"
        f" (a, x) -> a + x * (length(bin({n} div x)) - 1))"
    )
    duck_counts = (
        f"list_transform([{lits}],"
        f" ch -> CAST(length({s}) - length(replace({s}, ch, '')) AS BIGINT))"
    )
    duck_bits = (
        f"CAST(list_sum(list_transform(list_filter(list_append({cnts},"
        f" {n} - CAST(list_sum({cnts}) AS BIGINT)),"
        f" x -> x > 0),"
        f" x -> x * (length(bin({n} // x)) - 1))) AS BIGINT)"
    )
    return (spark_counts, spark_bits), (duck_counts, duck_bits)


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quantized character entropy — the cheap
    gibberish / encoded-blob / repeated-filler detector run before any
    tokenization (low entropy ⇒ repetitive filler, high entropy ⇒
    base64/binary spill; both are cut in C4/RefinedWeb-style cleaning).

    Output: ``id, keep_cols..., n_chars_measured, surprisal_bits,
    bpc_ppm`` where ``n_chars_measured`` is the full lowered-text
    length (same name/meaning as token_stats) and ``bpc_ppm`` is
    bits-per-char × 10⁶ (integer — engines can never disagree).
    Histogram buckets are the 26 ASCII letters + space over
    ``lower(text)``; everything else is one "other" bucket, so CJK
    text scores as high-"other" mass rather than crashing the alphabet.

    Scale: a pure scan-stage projection (27 replace passes + integer
    arithmetic) — zero shuffle, zero explode, streaming-safe; composes
    with the other first-pass gates in one text scan.
    """
    reserved = {"_ce_s", "_ce_n", "_ce_cnts", "surprisal_bits", "bpc_ppm",
                "n_chars_measured"}
    clash = reserved & ({id_col} | set(keep_cols))
    if clash:
        raise ValueError(
            f"char_entropy: column name(s) {sorted(clash)} collide with "
            "the operator's output/internal names"
        )
    (sp_counts, sp_bits), _ = char_entropy_fragments(
        s="_ce_s", n="_ce_n", cnts="_ce_cnts"
    )
    qid = _quote_ident(id_col)
    qkeep = [_quote_ident(c) for c in keep_cols]
    # F.col also parses backticks/dots, so the first projection must use
    # the SAME quoted spellings as the selectExpr stages — otherwise an
    # exotic column name fails here, before the escaping ever runs
    s0 = df.select(
        F.col(qid),
        *[F.col(q) for q in qkeep],
        F.lower(F.col(_quote_ident(text_col))).alias("_ce_s"),
    ).where(F.length("_ce_s") > 0)
    c = s0.selectExpr(
        qid, *qkeep, "CAST(length(_ce_s) AS BIGINT) AS _ce_n", "_ce_s"
    ).selectExpr(qid, *qkeep, "_ce_n", f"{sp_counts} AS _ce_cnts")
    return c.selectExpr(
        qid, *qkeep, "_ce_n", f"({sp_bits}) AS surprisal_bits"
    ).selectExpr(
        qid,
        *qkeep,
        "_ce_n AS n_chars_measured",
        "surprisal_bits",
        "surprisal_bits * 1000000 div _ce_n AS bpc_ppm",
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    min_chars: int = 16,
    fim_rate_per256: int = 128,
    pre: str = "<PRE>",
    suf: str = "<SUF>",
    mid: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): for a
    deterministic ~``fim_rate_per256``/256 fraction of documents, pick
    two md5-derived split points and emit PSM order —
    ``<PRE>prefix<SUF>suffix<MID>middle`` — so the model learns infill
    alongside left-to-right; the rest pass through unchanged. The FIM
    decision and both cut points derive from md5(doc_id) (the module's
    cross-engine determinism contract), so the SAME documents get the
    SAME transform in any engine and on any re-run — the
    reproducibility property training-data transforms need.

    Output: ``id, keep_cols..., fim_applied boolean, fim_text``.
    Docs shorter than ``min_chars`` are passed through untransformed
    (and marked fim_applied = false). Splits are character-based
    (1 ≤ lo ≤ hi ≤ n-1 ⇒ prefix and suffix non-empty, middle may be
    empty when lo == hi).

    Scale: pure scan-stage string arithmetic — zero shuffle, zero
    explode, streaming-safe; composes with the other per-doc transforms
    in one text scan.
    """
    reserved = {"fim_applied", "fim_text"}
    clash = reserved & ({id_col} | set(keep_cols))
    if clash:
        raise ValueError(
            f"fim_transform: column name(s) {sorted(clash)} collide with "
            "the operator's output names"
        )

    qid = _quote_ident(id_col)
    qkeep = [_quote_ident(c) for c in keep_cols]
    t = _quote_ident(text_col)
    pre, suf, mid = _sql_str_lit(pre), _sql_str_lit(suf), _sql_str_lit(mid)
    u32 = (
        lambda salt: f"CAST(conv(substring(md5(concat(CAST({qid} AS STRING),"
        f" '{salt}')), 1, 8), 16, 10) AS BIGINT)"
    )
    decide = (
        f"CAST(conv(substring(md5(concat(CAST({qid} AS STRING), ':fim')),"
        f" 17, 2), 16, 10) AS INT) < {int(fim_rate_per256)}"
    )
    n = f"length({t})"
    # greatest(n-1, 1): docs shorter than min_chars never take the FIM
    # branch, but the modulus must stay nonzero even if an optimizer
    # hoists the subexpression out of the CASE guard (ANSI mode errors
    # on % 0; the oracle carries the same guard)
    u = f"(1 + {u32(':u')} % greatest({n} - 1, 1))"
    v = f"(1 + {u32(':v')} % greatest({n} - 1, 1))"
    lo = f"least({u}, {v})"
    hi = f"greatest({u}, {v})"
    fim = (
        f"concat({pre}, substring({t}, 1, CAST({lo} AS INT)), "
        f"{suf}, substring({t}, CAST({hi} AS INT) + 1), "
        f"{mid}, substring({t}, CAST({lo} AS INT) + 1, CAST({hi} - {lo} AS INT)))"
    )
    applied = f"({n} >= {int(min_chars)} AND ({decide}))"
    return df.selectExpr(
        qid,
        *qkeep,
        f"{applied} AS fim_applied",
        f"CASE WHEN {applied} THEN {fim} ELSE {t} END AS fim_text",
    )


def mojibake_census(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document encoding-artifact counts — the census that decides
    whether a corpus needs the unicode-fixing pass (ftfy-style) every
    web pipeline (CCNet, Dolma) runs: UTF-8-bytes-read-as-Latin-1
    lead-ins ('Ã', 'Â'), mojibake'd smart punctuation ('â€¦' family),
    U+FFFD replacement chars (lossy prior transcode), and stray C0
    control characters. Pure scan-side regexp_count — zero shuffle,
    zero Python; detection, not repair (repair is a byte-level
    transcode, done once the census says it pays)."""
    t_ = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t_, F.lit("[ÃÂ]")).cast("long").alias("n_latin1"),
        F.regexp_count(t_, F.lit("â€")).cast("long").alias("n_smartpunct"),
        F.regexp_count(t_, F.lit("�")).cast("long").alias(
            "n_replacement"
        ),
        F.regexp_count(
            t_, F.lit("[\x01-\x08\x0b\x0c\x0e-\x1f]")
        ).cast("long").alias("n_ctrl"),
    ).withColumn(
        "mojibake_suspect",
        (F.col("n_latin1") + F.col("n_smartpunct") + F.col("n_replacement"))
        > 0,
    )
