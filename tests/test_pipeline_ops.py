"""Edge-case unit tests for the round-2 corpus operators (the oracle
parity tests cover the bulk path on driver data; these pin the corners).
"""

import pytest

from pg_logical_replication_spark.operators.dedup import contamination
from pg_logical_replication_spark.operators.packing import pack_sequences
from pg_logical_replication_spark.operators.text import pii_scrub, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail me at a.b+c@ex-ample.org or 10.0.0.1 acct 123456789"),
        (2, "clean text, digits 12345678 too short"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_long_digits"]) == (1, 1, 1)
    assert out[1]["n_chars_scrubbed"] != out[1]["n_chars_raw"]
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_long_digits"]) == (0, 0, 0)
    assert out[2]["n_chars_scrubbed"] == out[2]["n_chars_raw"]


def test_repetition_stats_short_doc_is_zero(spark):
    rows = [
        (1, "one two"),                      # < n tokens → no ngrams
        (2, "spam spam spam spam spam"),     # 3 identical trigrams
        (3, "all words here are different"),
    ]
    out = {r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()}
    assert out[1]["n_ngrams"] == 0 and out[1]["dup_ngram_ratio"] == 0.0
    assert out[2]["n_ngrams"] == 3 and out[2]["n_distinct_ngrams"] == 1
    assert abs(out[2]["dup_ngram_ratio"] - (1 - 1 / 3)) < 1e-6
    assert out[3]["dup_ngram_ratio"] == 0.0


def test_contamination_only_reports_hits(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over it")])
    corpus = _docs(spark, [
        (1, "prefix the quick brown fox jumps over it suffix"),  # shares 5-grams
        (2, "completely unrelated words in this one here"),
    ])
    out = {r["doc_id"]: r for r in contamination(corpus, bench, n=5).collect()}
    assert 1 in out and 2 not in out
    assert out[1]["n_benchmark_docs"] == 1
    assert out[1]["n_shared_shingles"] >= 1


def test_pack_sequences_greedy_rules(spark):
    # bucket 0: 3+4 fit an 8-budget bin, 5 starts the next; an oversized
    # doc (9 tokens) still gets its own bin
    rows = [
        (0, "a b c"),            # 3
        (1, "a b c d"),          # 4
        (2, "a b c d e"),        # 5
        (3, "a b c d e f g h i"),  # 9 > budget
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            _docs(spark, rows), budget=8, bucket_size=100
        ).collect()
    }
    assert out[0]["bin_id"] == out[1]["bin_id"]          # 3+4 <= 8
    assert out[2]["bin_id"] == out[0]["bin_id"] + 1      # 5 would overflow
    assert out[3]["bin_id"] == out[2]["bin_id"] + 1      # oversized → own bin
    assert (out[0]["bin_seq"], out[1]["bin_seq"]) == (0, 1)
    # bins are bucket-local: doc in another bucket restarts numbering
    far = pack_sequences(
        _docs(spark, rows + [(250, "x y z")]), budget=8, bucket_size=100
    )
    r250 = {r["doc_id"]: r for r in far.collect()}[250]
    assert r250["bucket"] == 2 and r250["bin_id"] == 2_000_000


def test_cms_heavy_hitters_invariants(spark):
    """CMS never underestimates; collisions only inflate. With width
    >> distinct tokens the estimate is exact; k bounds output."""
    from pg_logical_replication_spark.operators.text import cms_heavy_hitters

    docs = _docs(
        spark, [(1, "a a a a b b c"), (2, "a b c d"), (3, "  "), (4, "e")]
    )
    out = {r["token"]: r for r in cms_heavy_hitters(docs, k=100).collect()}
    assert out["a"]["exact_count"] == 5
    assert out["b"]["exact_count"] == 3
    assert all(r["est_count"] >= r["exact_count"] for r in out.values())
    assert all(r["overestimate_ok"] for r in out.values())
    # narrow sketch: estimates still >= exact (collisions overestimate)
    tight = cms_heavy_hitters(docs, width=2, depth=2, k=3).collect()
    assert len(tight) == 3
    assert all(r["est_count"] >= r["exact_count"] for r in tight)


def test_pagerank_join_loop_agrees_with_driver_loop(spark):
    """The distributed join-loop PageRank (operators/graph.py) must
    reproduce the driver-side replicated loop bit-for-bit at the query's
    1e-9 quantization (review r2 #7 done-criterion)."""
    from pg_logical_replication_spark.plans.analytics_extra import (
        q_graph_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    driver = {
        r["nationkey"]: r["rank"] for r in q_graph_pagerank(spark, sf)
        .collect()
    }
    cluster = {
        r["nationkey"]: r["rank"]
        for r in q_graph_pagerank(spark, sf, edges_in_cluster=True).collect()
    }
    assert driver == cluster


def test_register_tables_plain_sql_surface(spark):
    """A consumer of the reference who runs SQL against replicated PG
    tables can point spark.sql at the engine's views instead
    (session.register_tables) — joins, aggregates, the lot."""
    from pg_logical_replication_spark.session import register_tables

    names = register_tables(spark, "/root/testdata/sf0.001", prefix="sql_")
    assert "sql_lineitem" in names and "sql_documents" in names
    row = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_orders
        FROM sql_orders o
        JOIN sql_customer c ON c.c_custkey = o.o_custkey
        JOIN sql_nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name ORDER BY n_orders DESC, n.n_name LIMIT 1
        """
    ).first()
    assert row["n_orders"] > 0 and isinstance(row["n_name"], str)


# ------------------------------------------------- BPE encoding property
def test_double_pipe_replace_is_exact_greedy_bpe():
    """The correctness keystone of bpe_train_merges/bpe_encode_stats:
    on the ||s1||s2||…|| encoding, plain non-overlapping replace() of
    '|a||b|' -> '|ab|' must equal classic greedy left-to-right BPE
    merging (merge at the leftmost occurrence, never re-using a symbol
    consumed by the previous merge). Property-checked against a direct
    list-walk reference over adversarial alphabets (self-runs like
    'aaaaa', alternations, symbols that prefix each other)."""
    import itertools
    import random

    def greedy_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def pipe_merge(syms, a, b):
        s = "||" + "||".join(syms) + "||"
        s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
        return [x for x in s.split("||") if x]

    rng = random.Random(42)
    alphabet = ["a", "b", "ab", "ba", "aa", "c"]
    for trial in range(2000):
        n = rng.randint(1, 10)
        syms = [rng.choice(alphabet) for _ in range(n)]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        assert pipe_merge(syms, a, b) == greedy_merge(syms, a, b), (
            syms, a, b)
    # exhaustive over short sequences of a 2-symbol alphabet
    for n in range(1, 7):
        for syms in itertools.product("ab", repeat=n):
            for a, b in itertools.product("ab", repeat=2):
                syms_l = list(syms)
                assert pipe_merge(syms_l, a, b) == greedy_merge(
                    syms_l, a, b
                ), (syms_l, a, b)


# ------------------------------------------------- unigram-LM tokenizer
def test_unigram_composition_lattice():
    """The 176-row composition lattice is the Viterbi search space —
    pin that it is exhaustive (tribonacci counts), correctly offset
    (prefix-sum starts, parts covering the word exactly), and
    deterministic in its comp_id enumeration."""
    from pg_logical_replication_spark.operators.text import (
        unigram_compositions,
    )

    rows = unigram_compositions(8, 3)
    trib = {1: 1, 2: 2, 3: 4, 4: 7, 5: 13, 6: 24, 7: 44, 8: 81}
    by_len = {}
    for word_len, comp_id, starts, lens, n_parts in rows:
        by_len.setdefault(word_len, []).append((comp_id, starts, lens))
        assert n_parts == len(lens) == len(starts)
        assert sum(lens) == word_len
        assert all(1 <= k <= 3 for k in lens)
        pos = 1
        for s, k in zip(starts, lens):
            assert s == pos
            pos += k
    assert {k: len(v) for k, v in by_len.items()} == trib
    assert len(rows) == sum(trib.values())
    for word_len, comps in by_len.items():
        # comp_id dense 1..N, lexicographic by part tuple — the exact
        # tie-break order the oracle's VALUES literal replays
        assert [c[0] for c in comps] == list(range(1, len(comps) + 1))
        lens_seq = [tuple(c[2]) for c in comps]
        assert lens_seq == sorted(lens_seq)
    # deterministic across calls
    assert rows == unigram_compositions(8, 3)


def test_unigram_viterbi_is_min_cost_segmentation(spark):
    """The lattice-join E-step must equal a classic per-word DP: on a
    tiny corpus with a hand-set vocab, every word's chosen segmentation
    cost equals the DP minimum under the same (cost, n_parts, comp_id)
    tie-break, and every word is segmentable (char coverage)."""
    from pg_logical_replication_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(
            ["aba abab bab", "abab ab a", "bb aab abab baba", "a b ab"]
        )],
        "doc_id long, text string",
    )
    words, vocab, comps = TX._unigram_chain(
        docs, "text", top_words=100, max_word_len=8, max_piece_len=3,
        top_pieces=50, budgets=(), checkpoint_rounds=False,
    )
    best = {
        r["word"]: (r["cost"], r["n_parts"])
        for r in TX._unigram_viterbi(words, vocab, comps).collect()
    }
    costs = {r["piece"]: r["cost"] for r in vocab.collect()}
    corpus_words = {w for r in docs.collect() for w in r["text"].split()}
    assert set(best) == corpus_words  # coverage: every word segmented

    def dp(word):
        # min (cost, n_parts) over all segmentations into vocab pieces
        import functools

        @functools.lru_cache(None)
        def go(i):
            if i == len(word):
                return (0, 0)
            cands = []
            for k in (1, 2, 3):
                piece = word[i:i + k]
                if len(piece) == k and piece in costs:
                    c, n = go(i + k)
                    cands.append((costs[piece] + c, n + 1))
            return min(cands)

        return go(0)

    for w in corpus_words:
        assert best[w] == dp(w), w


def test_unigram_driver_em_agrees_with_chain(spark):
    """The r10 driver-side EM fast path (numpy over the parameter-
    capped word table) must reproduce the distributed lattice chain
    bit-for-bit: same trained vocabulary (pieces, counts, costs, tie
    order) and same per-document encode stats — on a corpus that
    exercises EM pruning (budgets force multi-piece drops), Laplace
    re-counting, Viterbi tie-breaks, and per-char fallback for long /
    out-of-table words."""
    from pg_logical_replication_spark.operators import text as TX

    rows = []
    # repeated short words (seed + survive pruning), rare words
    # (pruned at budget), and a >8-char word (per-char fallback)
    for i in range(30):
        rows.append((i, "abab abba baba bab ab ba extraordinarily "
                        f"zq{chr(97 + i % 7)} abcabc"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(top_words=50, max_word_len=8, max_piece_len=3,
              top_pieces=20, budgets=(10, 6))

    orig = TX._UNIGRAM_DRIVER_MAX_COMP_ROWS
    try:
        TX._UNIGRAM_DRIVER_MAX_COMP_ROWS = 0  # force distributed chain
        slow_train = [tuple(r) for r in TX.unigram_train(
            docs, checkpoint_rounds=False, **kw).collect()]
        slow_enc = sorted(tuple(r) for r in TX.unigram_encode_stats(
            docs, checkpoint_rounds=False, **kw).collect())
    finally:
        TX._UNIGRAM_DRIVER_MAX_COMP_ROWS = orig
    fast_train = [tuple(r) for r in TX.unigram_train(docs, **kw).collect()]
    fast_enc = sorted(tuple(r) for r in TX.unigram_encode_stats(
        docs, **kw).collect())
    assert slow_train == fast_train
    assert slow_enc == fast_enc
    assert len(slow_train) > 0 and len(slow_enc) == 30


def test_doremi_weights_semantics(spark):
    """Hard domains (above-mean proxy loss) get weight proportional to
    positive excess; easy domains get 0; Σ weight_bp ≤ 10000 (floor
    division); the excess column is exactly the cross-multiplied
    surplus S_d·n_tot − S_tot·n_d."""
    from pg_logical_replication_spark.operators.text import doremi_weights

    rows = []
    # domain 'easy': repetitive text the bigram LM predicts well;
    # domain 'hard': shuffled rare words (every doc_id % 10 == 0 doc
    # trains the LM, so 'easy' bigrams dominate the reference counts)
    for i in range(40):
        rows.append((i * 2, "easy", "the cat sat on the mat " * 4))
        rows.append((i * 2 + 1, "hard",
                     f"zx{i} qv{i * 7} wm{i * 13} kj{i * 3} pn{i * 11}"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in doremi_weights(df).collect()}
    assert set(out) == {"easy", "hard"}
    n_tot = sum(r["n_bigrams"] for r in out.values())
    s_tot = sum(r["surprisal"] for r in out.values())
    for r in out.values():
        assert r["excess"] == r["surprisal"] * n_tot - s_tot * r["n_bigrams"]
    assert out["hard"]["excess"] > 0 > out["easy"]["excess"]
    assert out["hard"]["weight_bp"] == 10000  # sole positive-excess domain
    assert out["easy"]["weight_bp"] == 0
    total_bp = sum(r["weight_bp"] for r in out.values())
    assert total_bp <= 10000


# ------------------------------------------------- WordPiece tokenizer
def test_wordpiece_maxmatch_matches_greedy_longest_first(spark):
    """The lattice max-lex rule must equal classic greedy
    longest-match-first wherever plain greedy succeeds (first piece is
    the longest vocab prefix, then recurse), and must still find a
    valid segmentation by backtracking where plain greedy dead-ends."""
    from pg_logical_replication_spark.operators import text as TX

    # vocab engineered so 'abcd' breaks plain greedy: longest prefix
    # 'abc' leaves 'd' ∉ V, but 'ab'+'cd' is valid -> backtracking
    docs = spark.createDataFrame(
        [(0, "ab cd abc abcd abab cdcd abcabc")],
        "doc_id long, text string",
    )
    vocab, _ = TX._wordpiece_chain(
        docs, "text", num_merges=4, top_words=100, checkpoint_rounds=False
    )
    pieces = {
        p
        for r in vocab.collect()
        for p in r["s"].split("||")
        if p
    }

    def greedy(word):
        toks, i = [], 0
        while i < len(word):
            for k in range(len(word) - i, 0, -1):
                if word[i:i + k] in pieces:
                    toks.append(word[i:i + k])
                    i += k
                    break
            else:
                return None
        return toks

    def maxmatch(word):
        # reference: max lexicographic part-length sequence over valid
        best = None
        def rec(i, lens):
            nonlocal best
            if i == len(word):
                if best is None or lens > best:
                    best = list(lens)
                return
            for k in range(len(word) - i, 0, -1):
                if word[i:i + k] in pieces:
                    rec(i + k, lens + [k])
        rec(0, [])
        return best

    enc = {
        r["doc_id"]: r
        for r in TX.wordpiece_encode_stats(
            docs, num_merges=4, top_words=100, checkpoint_rounds=False
        ).collect()
    }
    words = "ab cd abc abcd abab cdcd abcabc".split()
    expect = 0
    for w in words:
        mm = maxmatch(w)
        g = greedy(w)
        if g is not None:
            assert mm == [len(p) for p in g], (w, mm, g)
        expect += len(mm) if mm else len(w)
    assert enc[0]["n_wordpiece_tokens"] == expect
    assert enc[0]["n_words"] == len(words)


def test_wordpiece_score_prefers_cohesive_pairs(spark):
    """The likelihood objective must out-rank raw frequency: a pair
    whose parts appear ONLY together (q+u) beats a more frequent pair
    of individually-common symbols (t+h in 'the'/'that'/'th') — the
    defining difference from BPE's frequency argmax."""
    from pg_logical_replication_spark.operators import text as TX

    # ('this' avoided: its (i,s) pair would TIE (q,u) at 6/(6*6))
    text = " ".join(["the that thee then them"] * 6 + ["qu ququ"] * 2)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wp = TX.wordpiece_train_merges(
        docs, num_merges=1, top_words=100, checkpoint_rounds=False
    ).collect()
    bpe = TX.bpe_train_merges(
        docs, num_merges=1, top_words=100, checkpoint_rounds=False
    ).collect()
    assert (bpe[0]["lhs"], bpe[0]["rhs"]) == ("t", "h")
    assert (wp[0]["lhs"], wp[0]["rhs"]) == ("q", "u")


def test_merge_driver_fast_path_agrees_with_chain(spark):
    """The r10 BPE/WordPiece driver-side merge loop must reproduce the
    distributed chains bit-for-bit — merge tables (ranks, pairs,
    counts, scores), encode stats, and schemas — on a corpus that
    exercises self-runs ('aaaa' → greedy non-overlap), merge chains
    built on earlier merges, likelihood-vs-frequency argmax ties, and
    per-char fallback for out-of-table words."""
    from pg_logical_replication_spark.operators import text as TX

    rows = []
    for i in range(30):
        rows.append((i, "aaaa abab banana bandana extraordinarily "
                        f"qu{chr(97 + i % 5)} the theo theory band"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_merges=6, top_words=60)
    fns = dict(
        bpe_m=TX.bpe_train_merges,
        bpe_e=TX.bpe_encode_stats,
        wp_m=TX.wordpiece_train_merges,
        wp_e=TX.wordpiece_encode_stats,
    )

    def run():
        # checkpoint_rounds stays True: results are identical either
        # way, and False makes the forced-distributed arm pay the
        # O(2^num_merges) re-inlined lineage the chains checkpoint
        # away in production
        out = {}
        for key, fn in fns.items():
            d = fn(docs, **kw)
            rows_ = [tuple(r) for r in d.collect()]
            out[key] = (d.dtypes, sorted(rows_) if key.endswith("_e")
                        else rows_)
        return out

    orig = TX._MERGE_DRIVER_MAX_WORDS
    try:
        TX._MERGE_DRIVER_MAX_WORDS = 0   # force the distributed chains
        slow = run()
    finally:
        TX._MERGE_DRIVER_MAX_WORDS = orig
    fast = run()
    for key in fns:
        assert slow[key] == fast[key], key
    assert len(fast["bpe_m"][1]) == 6 and len(fast["wp_m"][1]) == 6
    assert len(fast["bpe_e"][1]) == 30


def test_wordpiece_maxmatch_driver_helper_is_lattice_max_lex():
    """_wordpiece_maxmatch_n_parts (greedy longest-first with
    backtracking) must equal the lattice rule — part count of the
    lexicographically-largest valid part-length sequence — on hand
    cases (backtracking dead-end, n_parts differing from greedy depth,
    unsegmentable) and on randomized word/vocab draws up to the
    single-digit length bound."""
    import itertools
    import random

    from pg_logical_replication_spark.operators.text import (
        _wordpiece_maxmatch_n_parts,
    )

    def lattice_best(word, pieces):
        best = None
        for n in range(1, len(word) + 1):
            for cut in itertools.combinations(range(1, len(word)), n - 1):
                bounds = (0,) + cut + (len(word),)
                parts = [word[bounds[i]:bounds[i + 1]]
                         for i in range(len(bounds) - 1)]
                if all(p in pieces for p in parts):
                    key = "".join(str(len(p)) for p in parts)
                    if best is None or key > best[0]:
                        best = (key, len(parts))
        return None if best is None else best[1]

    # plain greedy dead-ends ('abc' leaves 'd'), backtracking finds 2
    assert _wordpiece_maxmatch_n_parts("abcd", {"abc", "ab", "cd"}) == 2
    # [3,1] beats [2,1,1] lexicographically
    assert _wordpiece_maxmatch_n_parts("abcd", {"abc", "d", "ab", "c"}) == 2
    assert _wordpiece_maxmatch_n_parts("aba", {"ab"}) is None
    rng = random.Random(7)
    for trial in range(400):
        n = rng.randint(1, 9)
        word = "".join(rng.choice("ab") for _ in range(n))
        pool = {word[i:j] for i in range(n) for j in range(i + 1, n + 1)}
        pieces = {p for p in pool if rng.random() < 0.4}
        assert _wordpiece_maxmatch_n_parts(word, pieces) == lattice_best(
            word, pieces
        ), (word, sorted(pieces))


# ------------------------------------------- Gopher A1.2 / CCNet
def test_gopher_repetition_line_and_ngram_rules(spark):
    """Crafted docs pin each rule family: duplicate lines/paragraphs,
    top-n-gram coverage, duplicated-5-gram coverage."""
    from pg_logical_replication_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            # 3/5 duplicate lines (0.4 > 0.3) -> fails line rule
            (0, "dup line\ndup line\nunique one\n\npara\n\npara"),
            # one dominant bigram -> fails top-2-gram coverage
            (1, "a b a b a b a b a b c d e f g h"),
            # clean: no repetition anywhere
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           TX.gopher_repetition_filter(docs).collect()}
    assert not out[0]["gopher_rep_pass"]
    assert out[0]["dup_line_frac"] == 0.4
    assert out[0]["dup_para_frac"] == pytest.approx(0.333333)
    assert not out[1]["gopher_rep_pass"]
    assert out[1]["top2_frac"] > 0.2
    assert out[1]["dup5_frac"] > 0.15  # overlapping occurrences >1 ok
    assert out[2]["gopher_rep_pass"]
    assert out[2]["dup5_frac"] == 0.0


def test_ccnet_buckets_equal_mass_and_ordering(spark):
    """Per language: buckets are ordered by score (max(head) <=
    min(middle) <= ... value-wise) and each holds >= 1/3 of the docs
    up to value ties; every scored doc is assigned exactly once."""
    from pg_logical_replication_spark.operators import text as TX

    rows = []
    # two languages x 30 docs with varying repetition -> score spread
    for lang in ("en", "fr"):
        for i in range(30):
            doc_id = (0 if lang == "en" else 1000) + i
            words = ["w%d" % (j % (i + 1)) for j in range(40)]
            rows.append((doc_id, lang, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = TX.ccnet_perplexity_buckets(docs).collect()
    assert len(out) == 60
    for lang in ("en", "fr"):
        by_bucket = {}
        for r in out:
            if r["lang"] == lang:
                by_bucket.setdefault(r["bucket"], []).append(r["ppl_q"])
        assert set(by_bucket) == {"head", "middle", "tail"}
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
        # head reaches at least 1/3 of the language's mass
        assert len(by_bucket["head"]) * 3 >= 30


def test_c4_filter_rules(spark):
    """Each C4 rule pinned: terminal punctuation, >=5 words,
    javascript line drop, <3 sentences page drop, lorem/brace flags."""
    from pg_logical_replication_spark.operators.text import c4_filter

    docs = spark.createDataFrame(
        [
            # 3 good sentences -> keep
            (0, "one two three four five ok.\nsix seven eight nine ten!\n"
                "more words in this line here?"),
            # only 2 sentences -> drop
            (1, "one two three four five ok.\nanother good line right here!"),
            # javascript + brace page
            (2, "one two three four five ok.\nsix seven eight nine ten!\n"
                "call javascript now please sir.\nvar x = { }"),
            # lorem ipsum page
            (3, "one two three four five ok.\nsix seven eight nine ten!\n"
                "also lorem ipsum dolor sit amet."),
            # short lines / no punctuation -> nothing kept
            (4, "tiny line.\nno punct here at all ever"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_filter(docs).collect()}
    assert out[0]["c4_keep"] and out[0]["n_kept_lines"] == 3
    assert not out[1]["c4_keep"] and out[1]["n_sentences"] == 2
    assert not out[2]["c4_keep"] and out[2]["has_brace"]
    assert out[2]["n_kept_lines"] == 2  # javascript line dropped
    assert not out[3]["c4_keep"] and out[3]["has_lorem"]
    assert out[4]["n_kept_lines"] == 0 and not out[4]["c4_keep"]
    import hashlib
    assert out[4]["kept_hash"] == hashlib.md5(b"").hexdigest()


def test_gopher_repetition_matches_python_reference(spark):
    """Property: the distributed A1.2 stats equal a direct pure-Python
    reference over randomized multi-line documents (seeded) — pins the
    window-form gram builder, the line/paragraph array expressions, and
    the occurrence-weighted char-fraction convention in one sweep."""
    import random

    from pg_logical_replication_spark.operators.text import (
        GOPHER_DUP_NGRAM_PCT,
        GOPHER_TOP_NGRAM_PCT,
        gopher_repetition_filter,
    )

    rng = random.Random(7)
    vocab = ["aa", "bb", "ccc", "dd", "e", "ffff"]
    rows = []
    for did in range(40):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(0, 12)
            lines.append(" ".join(rng.choice(vocab) for _ in range(k)))
        if rng.random() < 0.4 and lines:
            lines.append(lines[0])  # plant a duplicate line
        sep = "\n\n" if rng.random() < 0.3 else "\n"
        rows.append((did, sep.join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_repetition_filter(docs).collect()}

    def ref(text):
        out = {}
        nch = len(text)
        import re as _re
        toks = _re.split(r"\s+", text.strip()) if text.strip() else [""]
        for pfx, segs in (
            ("line", [x for x in text.split("\n") if x.strip()]),
            ("para", [x for x in text.split("\n\n") if x.strip()]),
        ):
            n = len(segs)
            nd = len(set(segs))
            tot = sum(len(x) for x in segs)
            dup = sum(len(x) for x in segs if segs.count(x) >= 2)
            out[f"dup_{pfx}_frac"] = round((n - nd) / n, 6) if n else 0.0
            out[f"dup_{pfx}_char_frac"] = round(dup / tot, 6) if tot else 0.0
        for k in range(2, 11):
            grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
            from collections import Counter
            c = Counter(grams)
            if k in GOPHER_TOP_NGRAM_PCT:
                tops = [(v, g) for g, v in c.items()]
                chars = 0
                if tops:
                    v, g = max(tops)
                    if v >= 2:
                        chars = v * len(g)
                out[f"top{k}_frac"] = round(chars / nch, 6) if nch else 0.0
            else:
                dup = sum(v * len(g) for g, v in c.items() if v >= 2)
                out[f"dup{k}_frac"] = round(dup / nch, 6) if nch else 0.0
        return out

    for did, text in rows:
        want = ref(text)
        for col, val in want.items():
            assert got[did][col] == pytest.approx(val), (did, col, text)


def test_cdc_chunking_is_shift_resistant(spark):
    """The CDC selling point: an inserted prefix changes fixed-stride
    chunking everywhere but leaves content-defined boundaries after the
    edit intact — most chunk hashes survive."""
    import random

    from pg_logical_replication_spark.operators.text import (
        content_defined_chunks,
    )

    rng = random.Random(5)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lumen mossy quark rivet stone tiger umbra vexed wharf").split()
    base = " ".join(rng.choice(vocab) for _ in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, "ZZZ INSERT " + base)], "doc_id long, text string"
    )
    rows = content_defined_chunks(docs).collect()
    h1 = [r["chunk_md5"] for r in rows if r["doc_id"] == 1]
    h2 = [r["chunk_md5"] for r in rows if r["doc_id"] == 2]
    assert len(h1) >= 4, len(h1)  # varied text produces boundaries
    shared = set(h1) & set(h2)
    # everything after doc 2's first boundary realigns with doc 1
    assert len(shared) >= len(h1) - 1, (len(h1), len(h2), len(shared))
    # chunk lens cover the text exactly
    tot = sum(r["chunk_len"] for r in rows if r["doc_id"] == 1)
    assert tot == len(base)


def test_bloom_decontam_flags_superset_of_exact(spark):
    """Bloom flags can false-positive but never false-negative: every
    doc the exact broadcast-join contamination finds must be flagged
    (a truly shared shingle sets its own bits), and the planted
    verbatim copy is always caught."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.operators.dedup import (
        bloom_contamination_flags,
        contamination,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    # plant one verbatim benchmark copy into the corpus
    copy = bench.limit(1).select(
        (F.col("doc_id") + 7_000_001).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0).unionByName(copy)

    exact = {r["doc_id"] for r in contamination(corpus, bench, n=5).collect()}
    flags = bloom_contamination_flags(corpus, bench, n=5)
    flagged = {
        r["doc_id"] for r in flags.filter("bloom_flagged").collect()
    }
    assert exact <= flagged  # no false negatives, ever
    assert any(d > 7_000_000 for d in flagged)  # the planted copy


def test_bloom_decontam_refuses_corpus_sized_benchmark(spark):
    import pyspark.sql.functions as F
    import pytest

    from pg_logical_replication_spark.operators.dedup import (
        bloom_contamination_flags,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="exceeds 10 distinct shingles"):
        bloom_contamination_flags(
            docs, docs, n=5, max_benchmark_shingles=10
        )


def test_incremental_dedup_flags(spark):
    """dedup_new_against_index: exact hits (digest in history), near
    hits (band collision, disjoint from exact), clean passes; the
    historical side contributes digests/bands only."""
    from pg_logical_replication_spark.operators.dedup import (
        build_dedup_index,
        dedup_new_against_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hist = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                   # exact dup
            (11, base + " lambda"),                       # near dup (shingle overlap)
            (12, "totally different words with zero overlap at all here"),
        ],
        "doc_id long, text string",
    )
    digests, bands = build_dedup_index(hist)
    got = {
        r["doc_id"]: (r["exact_dup"], r["near_dup"])
        for r in dedup_new_against_index(new, digests, bands).collect()
    }
    assert got[10] == (True, False)   # exact wins; categories disjoint
    assert got[11] == (False, True)
    assert got[12] == (False, False)


def test_zipf_profile_vocabulary_beyond_bucket_range(spark):
    """Round-6 review CONFIRMED bug: with > 2^n_buckets distinct tokens,
    F.sequence(b_lo, hi) with b_lo > hi generated a DESCENDING sequence
    — out-of-range buckets and negative overlap counts. The histogram
    form must equal the explicit rank-window reference on a 9000-type
    vocabulary with frequency ties straddling the last bucket."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.text import zipf_profile

    rows = []
    for i in range(9000):
        reps = 3 if i < 1000 else (2 if i < 3000 else 1)
        rows.append((i, " ".join([f"tok{i:05d}"] * reps)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["n_types"], r["n_occurrences"], r["mean_log2_freq"])
        for r in zipf_profile(df, n_buckets=12).collect()
    }
    toks = df.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    freq = (
        toks.select(F.lower("tok").alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("freq"))
    )
    ranked = (
        freq.withColumn(
            "rank", F.row_number().over(W.orderBy(F.desc("freq"), "tok"))
        )
        .withColumn("bucket", (F.length(F.bin("rank")) - 1).cast("long"))
        .where(F.col("bucket") < 12)
    )
    want = {
        r["bucket"]: (r["n_types"], r["n_occurrences"], r["mean_log2_freq"])
        for r in ranked.groupBy("bucket").agg(
            F.count("*").cast("long").alias("n_types"),
            F.sum("freq").cast("long").alias("n_occurrences"),
            F.round(
                F.avg((F.length(F.bin("freq")) - 1).cast("double")), 6
            ).alias("mean_log2_freq"),
        ).collect()
    }
    assert got == want
    assert max(got) == 11 and 12 not in got


def test_unigram_chain_rejects_unsupported_widths(spark):
    """Round-7 review: the Viterbi position key packs (start, len) as
    start*64+len (collisions past len 63), and unigram_compositions is
    tribonacci in max_word_len (2^79 lattice rows at 80 hung the
    driver). Both limits must raise AT THE CHAIN ENTRY, before any
    lattice enumeration."""
    import pytest

    from pg_logical_replication_spark.operators import text as TX

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_piece_len.*64"):
        TX.unigram_train(
            docs, max_word_len=8, max_piece_len=70, budgets=(),
            checkpoint_rounds=False,
        )
    with pytest.raises(ValueError, match="max_word_len.*24"):
        TX.unigram_train(
            docs, max_word_len=80, max_piece_len=3, budgets=(),
            checkpoint_rounds=False,
        )
