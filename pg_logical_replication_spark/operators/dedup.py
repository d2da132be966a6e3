"""Deduplication operators for 100 TB-scale corpus curation.

BASELINE.json mandates these beyond the reference's own surface: exact
dedup, MinHash-LSH near-dup, SimHash, n-gram Jaccard. All are built from
JVM-side expressions (split / transform / md5 / aggregate) — no Python
UDFs — so whole-stage codegen applies and the only shuffles are the
candidate-pair joins.

Cross-engine determinism (DuckDB oracle): hashes whose VALUES the oracle
replays (minhash signatures, winnowing fingerprints, band keys) are md5
hex strings compared lexicographically — fixed-width lowercase hex means
string order == numeric order, and md5 is identical everywhere. No
engine-specific hash (xxhash/murmur) reaches any oracle-compared value.
Digests that only GROUP rows engine-internally and never leave the
operator (the ExactSubstr window digests) use structural xxhash64 —
which window contents are repeated is a function of the content itself,
identical in both engines regardless of which collision-free digest
groups them.

Scale design:
* exact dedup — one hash shuffle on the digest, not the full text;
* MinHash-LSH — signature is computed per-row (narrow), candidates come
  from equality joins on band keys: the classic sub-quadratic path; the
  full O(n²) pair join never materializes;
* SimHash — per-row signature; near-dup = signature equality (or small
  Hamming distance via band splits);
* n-gram Jaccard — candidate pairs restricted to docs sharing a shingle
  (inverted-index join), exact Jaccard only on candidates.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quote_ident(name: str) -> str:
    """Backtick-quote an identifier for SQL interpolation, escaping
    embedded backticks — shared (via re-export in operators.text) by
    every operator that interpolates caller column names into SQL."""
    return "`" + name.replace("`", "``") + "`"


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization (matches oracle string_split_regex)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def word_shingles_expr(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as strings.

    n-grams over words (not chars): with LLM-corpus vocabularies the
    shingle space is large enough that the inverted-index join stays
    sub-quadratic (SNIPPETS/MinHash literature), unlike raw words.
    """
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]))
    )


def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sh): distinct word n-gram shingles, one row each.

    Semantically ``explode(word_shingles_expr(...))``, but built from
    ``posexplode`` + ``lead()`` windows instead of a higher-order
    ``transform`` lambda: HOFs are interpreted per element (outside
    whole-stage codegen) and re-evaluate the token array per access —
    8-10× slower on the bench. Two traps this shape dodges, measured:

    * any non-generator expression selected NEXT TO ``posexplode`` lands
      in the projection above Generate and is re-evaluated per OUTPUT
      row (size(split(text)) × 260k cost ~2.3 s at sf0.1) — so the
      end-of-document filter derives from lead() nullability, never from
      a token-count column;
    * the upfront repartition by doc shuffles raw documents once, and
      the window AND the per-doc distinct both reuse that partitioning
      (one Exchange total) — strictly less shuffled data than letting
      the window shuffle exploded token rows.

    Window partitions are bounded by tokens-per-document, so the shape
    scales flat: a 100 TB corpus means more partitions, never bigger
    ones.
    """
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    base = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.posexplode(toks).alias("_pos", "_tok")
    )
    if n == 1:
        return base.select(F.col(id_col), F.col("_tok").alias("sh")).distinct()
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.lead("_tok", j).over(w) for j in range(1, n)]
    sh = base.select(
        F.col(id_col),
        F.concat_ws(" ", F.col("_tok"), *leads).alias("sh"),
        # full n-gram, or the single truncated shingle a <n-token doc
        # yields at index 0 (concat_ws skips the null leads) — the same
        # index domain as the array form: 0 .. max(len-n, 0).
        (leads[-1].isNotNull() | (F.col("_pos") == 0)).alias("_keep"),
    )
    return sh.filter("_keep").select(id_col, "sh").distinct()


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing (Schleimer/Wilkerson/Aiken): rolling k-gram
    hashes, keep the MINIMUM hash of every overlapping window of
    ``window`` consecutive grams, fingerprint = the distinct kept set.
    Guarantees any shared run of ≥ window+k-1 tokens between two docs
    shares a fingerprint — positional near-dup detection that's robust
    where the order-insensitive md5-of-token-set fingerprint is not.

    The "rolling hash" is the first 8 md5 hex chars per gram compared
    lexicographically (fixed-width lowercase hex ⇒ string order ==
    numeric order — the module's cross-engine determinism contract).

    Shape: one repartition on doc serves BOTH sequence windows (gram
    assembly via lead() and the sliding min) — partitions are bounded by
    tokens-per-document, so the operator scales flat like
    ``exploded_shingles``. Output: id, n_fp, min_fp.
    """
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    base = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.posexplode(toks).alias("_pos", "_tok")
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.lead("_tok", j).over(w) for j in range(1, k)]
    # k=1: every token is a full unigram — no lead columns to demand
    full = leads[-1].isNotNull() if leads else F.lit(True)
    grams = base.select(
        F.col(id_col),
        F.col("_pos"),
        F.substring(
            F.md5(F.concat_ws(" ", F.col("_tok"), *leads)), 1, 8
        ).alias("_h"),
        full.alias("_full"),
    ).filter("_full")
    sw = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    fps = grams.select(
        F.col(id_col),
        F.min("_h").over(sw).alias("fp"),
        # only full windows fingerprint (MOSS definition)
        F.lead("_h", window - 1).over(Window.partitionBy(id_col).orderBy("_pos"))
        .isNotNull()
        .alias("_full_w"),
    ).filter("_full_w")
    return (
        fps.select(id_col, "fp")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_fp"), F.min("fp").alias("min_fp"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    iterations: int = 6,
    until_converged: bool = False,
    max_iterations: int = 50,
) -> DataFrame:
    """Duplicate clusters from a candidate-pair graph: rounds of
    min-label propagation. Returns (doc_id, label) where label = the
    smallest id reachable.

    Two modes (review r3 #7):

    * fixed rounds (default): label = smallest id within ``iterations``
      hops — for near-dup graphs (small dense cliques from LSH bands)
      6 rounds is past any real diameter, and because the round count
      is FIXED the result is deterministic whether or not it converged,
      which is what makes an exact cross-engine oracle possible for an
      iterative graph algorithm. Chains deeper than ``iterations`` hops
      split into multiple labels.
    * ``until_converged=True``: keep propagating while ANY label
      changed (one extra count() action per round on the changed set),
      capped at ``max_iterations`` with a loud error — correct for
      chain-shaped duplicate graphs of unknown diameter (e.g.
      transitive near-dup chains), at the cost of a data-dependent
      round count. Convergence needs at most the graph diameter + 1
      rounds; min-label propagation halves long chains slowly, so the
      cap guards pathological inputs, not normal ones.

    Scale: one shuffle per round on the vertex id (the join and the min
    re-use the same key); labels are (long, long) pairs, never payloads.
    Rounds are driver-coordinated like every Pregel-style loop — the
    per-round plan is truncated with a localCheckpoint so the lineage
    (and the Catalyst plan) doesn't grow round-count deep. The
    convergence check compares consecutive label sets with a join on
    doc_id — a count over (long, long) rows, no payload movement.
    """
    from pyspark.sql import functions as F

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    # self-loop so a vertex's own label participates in every min
    edges = edges.unionByName(
        nodes.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    )
    # materialize once: `edges` is referenced in EVERY round — without
    # this the candidate-generation lineage (the whole MinHash pipeline
    # when called from LSH) re-executes per iteration (measured 6× cost)
    edges = edges.localCheckpoint()
    labels = nodes.withColumn("label", F.col("doc_id"))

    def one_round(lbls):
        return (
            edges.join(lbls, edges["dst"] == lbls["doc_id"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "doc_id")
        )

    if not until_converged:
        for _ in range(iterations):
            labels = one_round(labels).localCheckpoint(eager=False)
        return labels

    labels = labels.localCheckpoint()
    for _ in range(max_iterations):
        nxt = one_round(labels).localCheckpoint()
        changed = (
            nxt.alias("n")
            .join(labels.alias("p"), "doc_id")
            .filter(F.col("n.label") != F.col("p.label"))
            .limit(1)
            .count()
        )
        labels = nxt
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds — pathological graph; raise max_iterations explicitly"
    )


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 32,
    stats: dict | None = None,
    local_max_edges: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the published O(log n)-round algorithm for graphs whose DIAMETER is
    too large for per-hop label propagation.

    Where :func:`connected_components` needs one round per hop (a
    10,000-link duplicate chain = 10,000 shuffles), star operations
    contract chains geometrically: each round rewires every node toward
    the minimum of its neighborhood, so even pathological chains close
    in ~log₂(n) rounds. Per round: two groupBys on the node id over
    (long, long) edges — no payloads — plus a limit(1) convergence
    probe; lineage truncated per round like every Pregel-style loop.

    Returns (doc_id, label) with label = component minimum — the same
    contract as :func:`connected_components`, agreement-tested.

    ``stats``, if given, receives ``rounds`` (contraction rounds
    executed to convergence) and ``edges_per_round`` — observability
    for the O(log n)-round claim (SCALE.md records measured counts).

    ``local_max_edges`` (optimization r10, guide §2.4 "remove shuffles
    outright"): when the DISTINCT edge count is at or below this bound,
    the component labels are computed with a driver-side union-find
    over the collected (long, long) edges instead of the iterative
    contraction — the labels are identical (label = component minimum,
    pure integer semantics; agreement-tested), but ~rounds × 4 shuffle
    jobs collapse into one bounded collect. The edge count is already
    computed in both paths, so the probe is free. Spark itself makes
    the same size-adaptive call when it broadcasts a small join side;
    a million 16-byte edges is a few tens of MB on the driver. At
    corpus scale the candidate-pair set exceeds the bound and the
    published contraction runs unchanged. Default from
    ``$PLRS_CC_LOCAL_MAX_EDGES`` (1,000,000); 0 disables the fast path.
    """
    import os

    from pyspark.sql import functions as F

    if local_max_edges is None:
        local_max_edges = int(os.environ.get("PLRS_CC_LOCAL_MAX_EDGES", "1000000"))

    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # Fast-path type guard (ADVICE r10 medium): the driver union-find
    # must (a) return the INPUT id type, not a hardcoded long — the
    # distributed contraction preserves it — and (b) only run where
    # Python's `<` agrees with Spark's ordering: integral types and
    # strings (UTF-8 byte order == code-point order == Python str
    # order). Anything else falls through to the contraction, so the
    # same call never changes output type or crashes depending on edge
    # count.
    from pyspark.sql import types as T

    _u_t, _v_t = edges.schema["u"].dataType, edges.schema["v"].dataType
    _local_ok = _u_t == _v_t and isinstance(
        _u_t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.StringType)
    )
    n_edges_initial = edges.count()
    if _local_ok and n_edges_initial <= local_max_edges:
        edge_rows = [(r[0], r[1]) for r in edges.collect()]
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in edge_rows:
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict = {}
        for node in parent:
            r = find(node)
            m = comp_min.get(r)
            if m is None or node < m:
                comp_min[r] = node
        if stats is not None:
            stats["rounds"] = 0
            stats["edges_per_round"] = [n_edges_initial]
            stats["local"] = True
        return pairs.sparkSession.createDataFrame(
            [(node, comp_min[find(node)]) for node in parent],
            T.StructType([
                T.StructField("doc_id", _u_t, True),
                T.StructField("label", _u_t, True),
            ]),
        )

    nodes = (
        edges.select(F.col("u").alias("doc_id"))
        .unionByName(edges.select(F.col("v").alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e):
        # both orientations; per node u: m = min(neighborhood ∪ {u});
        # connect every STRICTLY LARGER neighbor to m
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            bidir.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e):
        # canonical orientation u > v; per node u: m = min(smaller
        # neighbors ∪ {u}); connect u and every smaller neighbor to m
        canon = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = canon.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        with_m = canon.join(m, "u")
        rewired = with_m.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        return rewired.filter(F.col("u") != F.col("v")).distinct()

    n_edges = n_edges_initial
    rounds = 0
    edges_per_round: list[int] = [n_edges]
    for _ in range(max_rounds):
        nxt = small_star(large_star(edges)).localCheckpoint()
        # convergence probe, cheapest test first: both sides are
        # distinct sets, so equal counts + empty one-sided difference ⇔
        # set equality. Counts on localCheckpointed frames are near-free
        # and differ on every non-final round, so the expensive
        # exceptAll probe runs ~once per call instead of twice per round
        n_nxt = nxt.count()
        changed = (
            1
            if n_nxt != n_edges
            else nxt.exceptAll(edges).limit(1).count()
        )
        edges, n_edges = nxt, n_nxt
        rounds += 1
        edges_per_round.append(n_nxt)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["edges_per_round"] = edges_per_round
        stats["local"] = False
    # converged star graph: every non-root points directly at its
    # component minimum; roots map to themselves
    labels = edges.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("doc_id"), "label"
    )
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("label")
        )
    )


def split_assign_expr(
    label_col: str = "label", val_cut: str = "0d", test_cut: str = "1a"
) -> Column:
    """Cluster-atomic train/val/test assignment: md5 over the CLUSTER
    label (not the doc id), first-two-hex-chars thresholds (each hex
    pair = 1/256 of mass: '0d' ⇒ ~5% val, '1a' ⇒ the next ~5% test).
    Because the split is a pure function of the label, every member of
    a duplicate cluster lands in the same split — the leakage-free
    property. Shared by q_corpus_leakage_split and its tests so the
    shipped expression is the tested expression.

    ``val_cut``/``test_cut`` must each be two lowercase hex chars — md5
    output is lowercase hex, so an uppercase or non-hex cut would
    compare as a plain string and silently mis-assign fractions."""
    for name, cut in (("val_cut", val_cut), ("test_cut", test_cut)):
        if not re.fullmatch(r"[0-9a-f]{2}", cut):
            raise ValueError(
                f"{name} must be two lowercase hex chars, got {cut!r}"
            )
    if not val_cut <= test_cut:
        raise ValueError(
            f"val_cut must not exceed test_cut, got {val_cut!r} > {test_cut!r}"
        )
    h2 = F.substring(F.md5(F.col(label_col).cast("string")), 1, 2)
    return (
        F.when(h2 < val_cut, "val").when(h2 < test_cut, "test").otherwise("train")
    )


def soft_weight_expr(size_col: str = "sz", scale: int = 1_000_000) -> Column:
    """SoftDeDup sampling weight as a scaled integer: ``scale div
    cluster_size`` (NULL size = singleton = full weight). Integer so
    reweighted totals are bit-exact in any engine and any summation
    order — a float Σ1/k is order-dependent. ``size_col`` is backtick-
    quoted before interpolation into the SQL expression, so exotic
    column names (spaces, dashes, keywords) are safe."""
    return F.expr(f"{int(scale)} div coalesce({_quote_ident(size_col)}, 1)")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Representative (min id) per exact text; adds group size.

    Scale: group on md5(text) — 32-byte keys shuffle instead of full
    documents; at 100 TB this is the difference between shuffling 100 TB
    and shuffling ~3% of it.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("representative_id"), F.count("*").alias("n_dups"))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: minhash_i = min(md5('<i>:'||shingle)).

    md5-as-string min is the permutation-free MinHash estimator (hash
    family indexed by seed prefix). Output: id, minhash_0..num_hashes-1.

    Shape: explode shingles (codegen'd posexplode/lead path, see
    ``exploded_shingles``) → groupBy(min × K). MIN is partial-
    aggregatable, so the per-doc signatures combine map-side — at 100 TB
    the shuffle carries K×32-byte partial minima per doc, not shingles.
    """
    ex = exploded_shingles(df, text_col, id_col, shingle_n)
    return ex.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"minhash_{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_bands(sig: DataFrame, id_col: str = "doc_id", band_size: int = 2) -> DataFrame:
    """Fold a signature into LSH band keys: band_b = md5(mh_2b || mh_2b+1).

    Output: id, band_idx, band_key — the inverted index for candidate
    generation.
    """
    mh_cols = [c for c in sig.columns if c.startswith("minhash_")]
    if len(mh_cols) % band_size:
        raise ValueError(
            f"minhash_bands: {len(mh_cols)} minhashes do not fold into "
            f"bands of {band_size} — trailing hashes would be silently "
            "dropped (computed but contributing zero recall)"
        )
    bands = len(mh_cols) // band_size
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat(*[F.col(f"minhash_{b * band_size + j}") for j in range(band_size)])
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(entries).alias("e")).select(
        id_col, "e.band_idx", "e.band_key"
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs (a < b) — docs agreeing on ≥1 band.

    Scale: the join key is (band_idx, band_key); hot buckets (boilerplate
    docs) are the classic skew case — AQE skew-join splits them. Never
    computes all-pairs.
    """
    # materialize-or-pay (round-6 review #5): Spark plans no
    # ReusedExchange across renamed self-join sides, so without this the
    # ENTIRE shingle-explode + groupBy(min x K) signature pipeline runs
    # twice — once per side (the _candidate_pair_stats measurement).
    # One executor-local write of the (id, band_idx, band_key) triples
    # feeds both sides.
    bands = minhash_bands(
        minhash_signature(df, text_col, id_col, num_hashes, shingle_n), id_col, band_size
    ).localCheckpoint()
    a = bands.select(
        F.col("band_idx"), F.col("band_key"), F.col(id_col).alias("a_id")
    )
    b = bands.select(
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_key").alias("band_key_b"),
        F.col(id_col).alias("b_id"),
    )
    return (
        a.join(
            b,
            (a["band_idx"] == b["band_idx_b"])
            & (a["band_key"] == b["band_key_b"])
            & (a["a_id"] < b["b_id"]),
        )
        .select("a_id", "b_id")
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash signature (default 16 bits from the first 4 md5 hex chars).

    Per token: md5 hex char c (value v = strpos('0123..f', ch)-1) carries
    4 bits; each bit votes +1/-1; the sign of the per-bit sum over all
    tokens sets the signature bit. Pure integer arithmetic → identical in
    any engine.
    """
    assert bits % 4 == 0
    tok = F.explode(tokens_expr(text_col)).alias("tok")
    base = df.select(F.col(id_col), tok).withColumn("h", F.md5(F.col("tok")))
    # expressions assembled as SQL strings: ONE parse instead of ~5×bits
    # py4j Column round trips per plan build (the SCALE.md round-3
    # plan-build finding; measured ~0.4 s/build at bits=16)
    bit_votes = []
    for c in range(bits // 4):
        v = f"(instr('0123456789abcdef', substring(h, {c + 1}, 1)) - 1)"
        for j in range(4):
            bit = f"(floor({v} / {2 ** j}) % 2)"
            bit_votes.append(
                F.expr(f"sum({bit} * 2 - 1)").alias(f"vote_{c * 4 + j}")
            )
    votes = base.groupBy(id_col).agg(*bit_votes)
    sig = " + ".join(
        f"(CASE WHEN vote_{i} > 0 THEN {2 ** i}L ELSE 0L END)"
        for i in range(bits)
    )
    return votes.select(
        F.col(id_col), F.expr(f"CAST(({sig}) AS BIGINT)").alias("simhash")
    )


def _candidate_pair_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    df_cap: int | None = None,
) -> DataFrame:
    """Shared inverted-index candidate pipeline for the exact pairwise
    measures: docs sharing ≥1 shingle → (a_id, b_id, inter, sz_a, sz_b).
    One definition serves Jaccard and containment (review r2 folded the
    two identical 25-line pipelines).

    ``df_cap`` is the scale valve (review r2 #1): a shingle present in
    > df_cap documents contributes df² rows to the candidate self-join —
    one boilerplate 3-gram shared by k docs is k² pairs, quadratic on the
    hot keys of any real web corpus. Capping drops those posting lists
    BEFORE the join (standard MinHash/CCNet practice). Semantics: the
    intersection is counted over surviving shingles only, while sz_a/sz_b
    stay full-document shingle counts — so a capped measure is a
    conservative LOWER bound (a dropped shingle can only remove evidence,
    never fabricate a pair), and a genuinely near-duplicate pair is still
    witnessed by its rarer shingles."""
    from pyspark.sql import Window

    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    # Carry |doc| along each shingle row (window count, constant per
    # doc — shuffle-free: exploded_shingles leaves rows partitioned by
    # doc) so the measure denominators ride the candidate join — no
    # post-hoc size-lookup joins.
    sized = sh.withColumn("sz", F.count("*").over(Window.partitionBy(id_col)))
    if df_cap is not None:
        # Capped path: SINGLE-LINEAGE posting-list explosion instead of
        # a self-join. The naive a⋈b self-join re-executes the whole
        # shingle pipeline per side (Spark plans no ReusedExchange
        # across renamed self-join sides — measured: 2× scans + an
        # extra Exchange + a broadcast at sf0.001); here the plan is
        # scan → Exchange(doc) → Exchange(sh) → Exchange(a,b), each
        # stage once. The count-only window filters hot shingles
        # WITHOUT materializing their posting lists (sort-based window
        # spills; collect_list would OOM on a million-doc shingle), and
        # the groupBy(sh) that builds the surviving lists reuses the
        # window's partitioning — its collect_list is bounded by df_cap
        # (≤ cap structs per key), so the pair explosion is ≤ cap²/2
        # rows per shingle, generated JVM-side by array HOFs over ≤ 20
        # elements (interpreted HOF cost is irrelevant at that size).
        kept = (
            sized.withColumn("_df", F.count("*").over(Window.partitionBy("sh")))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
        posting = kept.groupBy("sh").agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("sz").alias("sz"))
            ).alias("docs")
        )
        pair_arrays = F.flatten(
            F.transform(
                F.col("docs"),
                lambda x, i: F.transform(
                    F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                    lambda y: F.when(
                        x["id"] < y["id"],
                        F.struct(
                            x["id"].alias("a_id"),
                            y["id"].alias("b_id"),
                            x["sz"].alias("sz_a"),
                            y["sz"].alias("sz_b"),
                        ),
                    ).otherwise(
                        F.struct(
                            y["id"].alias("a_id"),
                            x["id"].alias("b_id"),
                            y["sz"].alias("sz_a"),
                            x["sz"].alias("sz_b"),
                        )
                    ),
                ),
            )
        )
        pairs = posting.select(F.explode(pair_arrays).alias("p")).select(
            "p.a_id", "p.b_id", "p.sz_a", "p.sz_b"
        )
        return pairs.groupBy("a_id", "b_id").agg(
            F.count("*").alias("inter"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    a = sized.select(F.col(id_col).alias("a_id"), "sh", F.col("sz").alias("sz_a"))
    b = sized.select(
        F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b")
    )
    return (
        a.join(b, (a["sh"] == b["sh_b"]) & (a["a_id"] < b["b_id"]))
        .groupBy("a_id", "b_id")
        .agg(
            F.count("*").alias("inter"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from an inverted-index
    join (docs sharing ≥1 shingle). Returns a_id, b_id, jaccard
    (rounded 6 — double division of exact ints, engine-stable).
    ``df_cap`` bounds posting-list length (see _candidate_pair_stats) —
    capped Jaccard is a conservative lower bound.
    """
    return (
        _candidate_pair_stats(df, text_col, id_col, shingle_n, df_cap)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    df_cap: int | None = None,
) -> DataFrame:
    """Shingle CONTAINMENT |A∩B| / min(|A|,|B|) over the same inverted-
    index candidates as :func:`jaccard_pairs` — the asymmetric near-dup
    measure Jaccard misses: a short document wholly embedded in a long
    one scores ~1 here but near 0 on Jaccard (the union is dominated by
    the long doc). That is exactly the quote/boilerplate/sub-document
    duplication case a training-corpus dedup pass needs to catch.
    Same scale shape: candidates from equality joins, exact measure on
    candidates only, double division of exact ints (engine-stable);
    ``df_cap`` bounds posting-list length (see _candidate_pair_stats).
    """
    return (
        _candidate_pair_stats(df, text_col, id_col, shingle_n, df_cap)
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("a_id", "b_id", "containment")
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: which corpus docs share word n-grams
    with a held-out evaluation set.

    The standard pre-training hygiene pass (an eval example whose
    n-grams appear in the training corpus is 'contaminated'). Exact
    containment over distinct word n-grams:

    * benchmark side → distinct shingles, ``F.broadcast`` — real eval
      sets are thousands of documents, so their shingle set fits every
      executor and the corpus side never shuffles (at 100 TB the scan
      stays embarrassingly parallel; only the per-doc groupBy shuffles,
      and only for docs with ≥1 hit — a vanishing fraction);
    * corpus side → ``exploded_shingles`` (posexplode + lead, codegen-
      friendly; see that docstring for why not a HOF transform).

    Output: one row per contaminated corpus doc with the number of
    distinct shared shingles and distinct benchmark docs hit.
    """
    corpus_sh = exploded_shingles(
        df, text_col=text_col, id_col=id_col, n=n
    ).withColumnRenamed(id_col, "_corpus_id")
    bench_sh = (
        exploded_shingles(benchmark, text_col=text_col, id_col=id_col, n=n)
        .select(F.col(id_col).alias("_bench_id"), "sh")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(F.col("_corpus_id").alias(id_col))
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("_bench_id").alias("n_benchmark_docs"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: banded candidate generation + exact
    Hamming filter — completes the SimHash path (``simhash`` emits only
    signatures) into a pair producer like the MinHash/LSH families.

    Pigeonhole guarantee: splitting ``bits`` into ``bands`` equal bands,
    two signatures with Hamming distance < ``bands`` agree on ≥1 whole
    band, so with the default 4×4-bit bands every pair with distance ≤ 3
    is a candidate (no recall loss at the default threshold; distance ==
    bands can straddle all bands and is the standard residual miss).

    Scale shape: signature is one long per doc; candidates come from an
    equality join on (band_idx, band_key) — the banded inverted index —
    and the exact ``bit_count(xor)`` filter runs on candidate rows only.
    All integer arithmetic end-to-end: the DuckDB oracle replays it
    bit-for-bit. Output: a_id, b_id, hamming.
    """
    assert bits % bands == 0
    # pigeonhole bound: banding only guarantees a candidate band for
    # pairs with hamming < bands; allowing max_hamming >= bands would
    # return an input-dependent SUBSET of qualifying pairs (round-6
    # review #4 — silent recall loss)
    assert max_hamming < bands, (
        f"simhash_pairs: max_hamming={max_hamming} must be < bands="
        f"{bands} for the pigeonhole recall guarantee"
    )
    w = bits // bands
    sig = simhash(df, text_col, id_col, bits)
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * w)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(entries).alias("e")
    ).select(id_col, "simhash", "e.band_idx", "e.band_key").localCheckpoint()
    # (localCheckpoint: the renamed self-join would re-run the full
    # per-token vote aggregation per side — round-6 review #5)
    a = banded.select(
        F.col(id_col).alias("a_id"),
        F.col("simhash").alias("sig_a"),
        "band_idx",
        "band_key",
    )
    b = banded.select(
        F.col(id_col).alias("b_id"),
        F.col("simhash").alias("sig_b"),
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_key").alias("band_key_b"),
    )
    return (
        a.join(
            b,
            (a["band_idx"] == b["band_idx_b"])
            & (a["band_key"] == b["band_key_b"])
            & (a["a_id"] < b["b_id"]),
        )
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 20,
    df_cap: int | None = None,
) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every ``gram``-token window that occurs more than once in the
    corpus (any repeat — across documents or within one), and report
    per document how many of its tokens are covered by at least one
    such repeated span. The dup_ratio is the signal ExactSubstr cuts
    on; the span bounds are what a remover would splice out.

    Pipeline (all JVM expressions): one scan explodes stride-1
    ``gram``-token window digests with their positions → repeated
    digests found by a count ≥ 2 aggregate → positions of repeated
    windows rejoin on the digest → per-doc interval-union via a
    running-max window (spans [pos, pos+gram) overlap heavily; the
    union length is Σ max(0, end − max(start, prev_max_end))) —
    integer-exact cross-engine.

    Scale: the digest explosion is ~n_tokens rows per doc but carries
    (8-byte digest, doc_id, pos) only — text never shuffles. The
    rejoin is digest-equality (shuffle join on the hash, co-partitioned
    both sides). A pathologically common window (boilerplate) fans out
    its posting list; ``df_cap`` drops digests hotter than the cap
    (their docs are boilerplate-dominated and get flagged by the
    repetition/quality filters instead) — the same valve as
    ``jaccard_pairs``. The interval-union window partitions by doc_id:
    embarrassingly parallel.
    """
    tk = F.transform(tokens_expr(text_col), lambda x: F.lower(x))
    base = df.select(F.col(id_col), tk.alias("tk")).where(
        F.size("tk") >= gram
    )
    wins = F.expr(
        f"transform(sequence(1, size(tk) - {gram - 1}),"
        f" i -> struct(i AS pos,"
        # window digest: structural xxhash64 over the token slice
        # (optimization r10, guide §2.3 "shuffle fewer bytes" /
        # §4 built-ins) — no 20-token string is materialized and the
        # shuffled key is 8 bytes, not a 32-char hex string. The digest
        # never reaches the output (it only groups repeated windows), so
        # only collision behavior matters: 64-bit space on honest inputs,
        # the CCNet-class width every hash-based dedup heuristic uses —
        # at 10^12 windows a handful of false-hot windows splice a
        # vanishing token mass, the same order as md5's non-adversarial
        # guarantees effectively bought.
        f" xxhash64(slice(tk, i, {gram})) AS h))"
    )
    inst = base.select(
        id_col, F.size("tk").alias("n_tokens"), F.explode(wins).alias("w")
    ).select(id_col, "n_tokens", "w.pos", "w.h")

    # Coverage KEEPS the count>=2 aggregate + join-back (adjudicated
    # r11): its digest explosion is cheap (one lowercased token array,
    # no original-case twin), so re-evaluating it for the join's probe
    # side costs less than shuffling every (doc_id, n_tokens, pos, h)
    # instance row through the count-window alternative — the window
    # form measured 1.04 -> 1.26 s here while WINNING on the removal
    # twin (whose explode builds both token arrays; see
    # remove_duplicated_spans).
    hot = inst.groupBy("h").agg(F.count("*").alias("c")).where(
        F.col("c") >= 2
    )
    if df_cap is not None:
        hot = hot.where(F.col("c") <= df_cap)

    dup = inst.join(hot.select("h"), "h")
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + gram).over(w_prev)
    delta = F.greatest(
        F.lit(0),
        (F.col("pos") + gram)
        - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos"))),
    )
    return (
        dup.withColumn("_d", delta)
        .groupBy(id_col)
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count("*").cast("long").alias("n_dup_windows"),
            F.sum("_d").cast("long").alias("n_dup_tokens"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_tokens").cast("double") / F.col("n_tokens"), 6),
        )
    )


def bloom_contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 3,
    max_benchmark_shingles: int = 5_000_000,
) -> DataFrame:
    """Benchmark decontamination WITHOUT a corpus-side join: the
    held-out set's shingles build an ``m_bits`` Bloom filter whose
    words inline as ~``m_bits/64`` long literals, and every corpus doc
    is flagged by a pure per-row expression — the scan stays
    embarrassingly parallel, no shuffle, no broadcast table, nothing
    but a filter in the projection. The Dolma-BFF shape, Spark-first.

    vs :func:`contamination` (exact, broadcast shingle join): the
    Bloom pass can FALSE-POSITIVE with rate ≈ (1−e^(−k·n/m))^k per
    shingle (never false-negative — every truly shared shingle sets
    its own bits), so flags are a SUPERSET of true contamination. The
    production pattern is two-phase: Bloom-flag at scan speed over
    100 TB, then run the exact join only on the flagged sliver.

    Engine-portable by construction: positions are
    ``int(md5(sh + '#' + i)[:15 hex], 16) % m`` (the
    ``q_join_bloom_prune`` idiom), so DuckDB replays the whole filter
    — including its false positives — bit-for-bit, which is what lets
    the oracle hash-check an approximate operator exactly.

    The benchmark shingle set is driver-collected (eval sets are small
    by nature); ``max_benchmark_shingles`` guards the collect with a
    bounded ``limit`` probe — a 'benchmark' that big is a corpus, and
    the exact broadcast-join form is the right tool there.
    """
    import hashlib

    if k > 3:
        raise ValueError("bloom_contamination_flags: k <= 3 (one md5 "
                         "yields three 40-bit position chunks)")
    sh_df = exploded_shingles(
        benchmark, text_col=text_col, id_col=id_col, n=n
    ).select("sh").distinct()
    # ONE job guards and builds: collect limit(cap+1) — if the extra
    # row came back, the benchmark is over the cap (round-6 review #8:
    # the separate count() probe ran the whole shingle pipeline twice)
    rows = sh_df.limit(max_benchmark_shingles + 1).collect()
    if len(rows) > max_benchmark_shingles:
        raise ValueError(
            f"bloom_contamination_flags: benchmark exceeds "
            f"{max_benchmark_shingles} distinct shingles — use "
            "contamination() (broadcast join) for corpus-sized sets"
        )
    words = [0] * ((m_bits + 63) // 64)
    for r in rows:
        h = hashlib.md5(r["sh"].encode()).hexdigest()
        for i in range(k):
            pos = int(h[10 * i : 10 * i + 10], 16) % m_bits
            words[pos // 64] |= 1 << (pos % 64)
    # SQL long literals are signed two's-complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    warr = "array(" + ",".join(f"{w}L" for w in words) + ")"

    # Probe shape (measured, the exploded_shingles rule): a per-row
    # `exists(shingles, sh -> md5...)` HOF is INTERPRETED per element —
    # ~20 µs/probe, 14 s at sf0.1 — while the same arithmetic over
    # exploded (id, sh) rows is whole-stage codegen. ONE md5 per
    # shingle feeds all k positions (10-hex-char chunks); the words
    # array is a constant-folded literal; the per-doc OR is a
    # map-side-combined groupBy — only (id, bool) pairs shuffle,
    # at most one per doc per partition.
    sh = exploded_shingles(df, text_col=text_col, id_col=id_col, n=n)
    sh = sh.withColumn("_h", F.md5("sh"))
    bits = []
    for i in range(k):
        pos = (
            f"pmod(CAST(conv(substring(_h, {10 * i + 1}, 10), 16, 10) "
            f"AS BIGINT), {m_bits})"
        )
        bits.append(
            f"(shiftright(element_at({warr}, "
            f"CAST({pos} DIV 64 AS INT) + 1), "
            f"CAST({pos} % 64 AS INT)) & 1L) = 1L"
        )
    hit = F.expr(" AND ".join(bits))
    return sh.groupBy(id_col).agg(F.max(hit).alias("bloom_flagged"))


def build_dedup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTED dedup index of a corpus — what continuous ingestion
    writes once per historical document so later batches never re-read
    historical text:

      * ``digests``: distinct md5(text) (32 bytes/doc — exact dedup),
      * ``bands``: (band_idx, band_key) LSH entries (num_hashes/band_size
        × 32 bytes/doc — near-dup candidates, same hash family as
        :func:`minhash_bands` so the index is append-compatible with
        every other minhash op here).

    At 100 TB the index is ~3% the corpus size; materialize both frames
    partitioned/bucketed on their join key (digest; band_key) so the
    incremental gate's joins co-locate without a historical-side shuffle.
    """
    digests = df.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    bands = minhash_bands(
        minhash_signature(df, text_col, id_col, num_hashes, shingle_n),
        id_col,
        band_size,
    ).select("band_idx", "band_key").distinct()
    return digests, bands


def dedup_new_against_index(
    new_docs: DataFrame,
    index_digests: DataFrame,
    index_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental dedup: gate a NEW ingestion batch against a persisted
    corpus index (:func:`build_dedup_index`) — the continuous-pipeline
    shape, where yesterday's 100 TB is never rescanned to admit today's
    1 TB.

    Adds two flags to ``new_docs``:
      * ``exact_dup``  — md5(text) already in ``index_digests``;
      * ``near_dup``   — ≥1 LSH band key collides with ``index_bands``
        AND not an exact duplicate (categories are disjoint, so
        downstream quotas can treat them differently — near-dups are
        candidates at the index's Jaccard operating point, exact dups
        are certainties).

    Scale: both probes are LEFT SEMI joins keyed on 32-byte values —
    the historical side contributes digests/band keys only (no text),
    the joins co-partition on the key (no broadcast assumption: the
    index is corpus-sized), and the new batch's text never shuffles
    (flags join back to ``new_docs`` on ``id_col``).
    """
    digest = F.md5(F.col(text_col))
    d = new_docs.withColumn("_digest", digest)
    exact_ids = (
        d.select(F.col(id_col), "_digest")
        .join(index_digests, F.col("_digest") == F.col("digest"), "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_exact", F.lit(True))
    )
    new_bands = minhash_bands(
        minhash_signature(new_docs, text_col, id_col, num_hashes, shingle_n),
        id_col,
        band_size,
    )
    near_ids = (
        new_bands.join(index_bands, ["band_idx", "band_key"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return (
        d.join(exact_ids, id_col, "left")
        .join(near_ids, id_col, "left")
        .withColumn("exact_dup", F.coalesce("_exact", F.lit(False)))
        .withColumn(
            "near_dup",
            F.coalesce("_near", F.lit(False)) & ~F.col("exact_dup"),
        )
        .drop("_digest", "_exact", "_near")
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 20,
    df_cap: int | None = None,
) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. 2022) — the action
    :func:`duplicated_span_coverage` only measures: splice every token
    covered by a corpus-repeated ``gram``-token window out of every
    document (the aggressive variant: all copies cut; the keep-one
    policy is a doc-level choice layered on q_dedup_keep_best).

    Same machinery as the coverage operator (window digests → count
    window ≥ 2, one hash shuffle), then covered positions compact into
    MERGED
    intervals per doc (a new interval starts where pos exceeds the
    running max end; running count of starts = interval id), the
    interval list joins back (left — untouched docs pass through), and
    the output tokens are filtered by an EXISTS over that per-doc
    interval array. Output text is the kept ORIGINAL-case tokens joined
    by single spaces (windows hash lowercased, the output keeps case) —
    byte-deterministic, so an oracle can checksum every output byte.

    Returns (id, out_text, n_tokens_before, n_tokens_after, spliced).

    Scale: digests/positions shuffle, text never does (the interval
    array per doc is tiny after compaction); the token filter is one
    scan-side HOF pass, O(n_tokens × n_intervals) per doc.
    """
    from pyspark.sql import Window

    tk_orig = tokens_expr(text_col)
    tk_low = F.transform(tk_orig, lambda x: F.lower(x))
    base = df.select(
        F.col(id_col), tk_orig.alias("tko"), tk_low.alias("tk")
    )
    wins = F.expr(
        f"transform(sequence(1, size(tk) - {gram - 1}),"
        f" i -> struct(i AS pos,"
        # window digest: structural xxhash64 over the token slice
        # (optimization r10, guide §2.3 "shuffle fewer bytes" /
        # §4 built-ins) — no 20-token string is materialized and the
        # shuffled key is 8 bytes, not a 32-char hex string. The digest
        # never reaches the output (it only groups repeated windows), so
        # only collision behavior matters: 64-bit space on honest inputs,
        # the CCNet-class width every hash-based dedup heuristic uses —
        # at 10^12 windows a handful of false-hot windows splice a
        # vanishing token mass, the same order as md5's non-adversarial
        # guarantees effectively bought.
        f" xxhash64(slice(tk, i, {gram})) AS h))"
    )
    inst = (
        base.where(F.size("tk") >= gram)
        .select(id_col, F.explode(wins).alias("w"))
        .select(id_col, "w.pos", "w.h")
    )
    # Repeated-window selection as ONE pass (optimization r11, guide
    # §2.4): a count window over the digest replaces the count>=2
    # aggregate + join-back — the join's probe side re-evaluated the
    # whole digest explosion (no common-subtree sharing across a
    # self-join), and here the explosion is expensive (BOTH token
    # arrays: original case + lowercased). Byte-identical output;
    # isolated A/B 1.88-2.06 -> 1.37-1.40 s, full query 2.01 -> 1.90 s,
    # funnel 3.11 -> 2.95 s (warm min-of-5). No unbounded hot-set
    # broadcast anywhere; a degenerate single hot digest lands in one
    # window partition — df_cap is the valve, as it was for the old
    # join's posting-list fan-out. duplicated_span_coverage keeps the
    # aggregate form: its cheaper explode made the window form a
    # measured regression there (1.04 -> 1.26 s).
    _c = F.count("*").over(Window.partitionBy("h"))
    dup_pred = _c >= 2
    if df_cap is not None:
        dup_pred = dup_pred & (_c <= df_cap)
    dup = inst.withColumn("_hc", dup_pred).where(F.col("_hc")).drop("_hc")
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + gram).over(w_prev)
    marks = dup.withColumn(
        "new_grp",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(
            0
        ),
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grps = marks.withColumn("g", F.sum("new_grp").over(w_run))
    ivals = (
        grps.groupBy(id_col, "g")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + gram).alias("e"),
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("iv")
        )
    )
    joined = base.join(ivals, id_col, "left")
    kept = F.expr(
        "filter(transform(tko, (x, i) -> struct(x AS x, i + 1 AS i)),"
        " t -> iv IS NULL OR NOT exists(iv,"
        " v -> t.i >= v.s AND t.i < v.e))"
    )
    out_text = F.array_join(F.transform(kept, lambda t: t.getField("x")), " ")
    # Degenerate-doc normalization (ADVICE r8): split('') yields [''],
    # so a whitespace-only doc would count 1 "kept token" whose joined
    # text is '' — an empty OUTPUT counts 0 tokens, and spliced derives
    # from the token counts, matching the oracle's
    # CASE WHEN out_text = '' THEN 0 semantics on both engines.
    n_after = F.when(out_text == "", F.lit(0)).otherwise(
        F.size(kept)
    ).cast("long")
    return joined.select(
        F.col(id_col),
        F.size("tko").cast("long").alias("n_tokens_before"),
        n_after.alias("n_tokens_after"),
        out_text.alias("out_text"),
        (n_after < F.size("tko")).alias("spliced"),
    )
