"""Similarity search over embedding columns (array<float>).

BASELINE.json mandates ANN over ``embeddings.parquet``. Two paths:

* ``cosine_topk`` — brute-force exact top-k: queries broadcast against
  the corpus, dot products via ``zip_with``+``aggregate`` (JVM-side,
  sequential summation order — matches DuckDB's list_dot_product for the
  oracle). The right baseline, and the right answer when |queries| is
  small: one corpus scan, no shuffle of the corpus.
* ``lsh_cosine_topk`` — random-hyperplane LSH bucketing (signs of
  md5-derived ±1 projections): candidates share a bucket, exact cosine
  re-ranks. Sub-linear candidate sets at 100 TB; deterministic
  (hash-derived hyperplanes, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    Rank on (rounded cosine desc, neighbor id asc) — the rounding makes
    rank deterministic across engines; id breaks residual ties.

    Scale: broadcast(queries) ⋈ corpus = one pass over the corpus,
    per-partition partial top-k via the row_number window on the
    (small) query partition count.
    """
    # norms hoisted BELOW the join: computed once per query row (in the
    # broadcast build) and once per corpus row (stream-side projection)
    # instead of once per (q, n) PAIR — at k-NN fan-out that removes
    # 2/3 of the higher-order-function work from the hot loop
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("n_norm", _norm(F.col("n_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def hyperplane_signs(vec_col: str, dims: int, planes: int, table: int = 0) -> Column:
    """LSH bucket key: sign bits of `planes` pseudo-random projections.

    Hyperplane p's weight for dimension d is ±1 from the parity of the
    first hex char of md5('p:d') — deterministic, no RNG, reproducible in
    SQL for the oracle. ``table`` offsets the plane indices so multiple
    independent hash tables draw disjoint hyperplane sets.
    """
    # Assembled as ONE SQL string parsed by a single F.expr: building
    # planes × (zip_with + aggregate) through the py4j Column DSL costs
    # ~1.7 s of driver round trips PER PLAN BUILD for an 8-table
    # signature set (lambda-bearing HOFs are the chattiest constructs);
    # string assembly is microseconds and the parsed expressions — and
    # therefore every float result — are identical.
    parts = [
        # loud guard, EXACT length: a vector shorter than `dims` would
        # null-pad the zip_with (review r2) — and a vector LONGER than
        # `dims` null-pads the WEIGHTS side instead, which nulls every
        # projection the same way and collapses all signatures to one
        # all-'0' bucket (round-6 review #1: silent brute-force for any
        # corpus whose embedding width exceeds the configured dims)
        f"CASE WHEN size(`{vec_col}`) = {dims} THEN '' ELSE "
        f"raise_error('hyperplane_signs: embedding length must equal "
        f"dims={dims}') "
        "END"
    ]
    for p in range(planes):
        ws = ",".join(
            "1.0D"
            if int(hashlib_md5_hex(f"{table * planes + p}:{d}")[0], 16) % 2 == 0
            else "-1.0D"
            for d in range(dims)
        )
        proj = (
            f"aggregate(zip_with(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
            f"array({ws}), (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x)"
        )
        parts.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(parts) + ")")


def hashlib_md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine re-rank within hyperplane buckets.

    ``tables`` independent hash tables (disjoint hyperplane sets) each
    contribute the candidates sharing the query's bucket; a true
    neighbor is missed only if it splits from the query in EVERY table
    — recall 1-(1-r)^L vs the single-table r. Recall < 1 by
    construction (that's the point); candidate set ~L·N/2^planes per
    query. At 100 TB: bucket the corpus once per table (write-time
    partitioning, L× storage of 8-byte keys, not of vectors), probe per
    query.
    """
    sigs = lambda: F.array(  # noqa: E731
        *[hyperplane_signs(vec_col, dims, planes, table=t) for t in range(tables)]
    )
    # norms hoisted BELOW the join, once per row before the table
    # explode (round-6 review #6 — the cosine_topk:52 finding applied
    # here too: computing the interpreted-HOF norm per CANDIDATE pays
    # it B times for a corpus row matching B queries; same doubles,
    # evaluated once)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
        sigs().alias("_sigs"),
    ).select("n_id", "n_vec", "n_norm", F.posexplode("_sigs").alias("tbl", "bucket"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        sigs().alias("_sigs"),
    ).select("q_id", "q_vec", "q_norm", F.posexplode("_sigs").alias("q_tbl", "q_bucket"))
    scored = (
        c.join(
            F.broadcast(q),
            (c["tbl"] == q["q_tbl"]) & (c["bucket"] == q["q_bucket"]),
        )
        .filter(F.col("n_id") != F.col("q_id"))
        # union of per-table candidates: dedupe BEFORE the exact re-rank
        .dropDuplicates(["q_id", "n_id"])
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def _ivf_cells_sql(cent_rows: list, round_to: int) -> str:
    """Per-centroid cosine cells as ONE SQL string over the pre-projected
    (_v, _nv) — array<struct<cos, neg_id>>, struct order = the tie-break
    (highest cosine, then lowest cent_id). Assembled as a string and
    parsed by a single F.expr: composing 16 centroids × (zip_with +
    aggregate + round + struct) through the py4j DSL costs ~2 s of
    driver round trips PER PLAN BUILD (measured; lambdas are the
    chattiest constructs), while string assembly is microseconds.
    repr(float) is shortest-roundtrip, so the SQL literals parse to
    bit-identical doubles. The vector's own norm (_nv) is computed once
    in the projection and referenced once per centroid."""

    def _cos_sql(cv: list, cid: int) -> str:
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in cv) + ")"
        dot = (
            f"aggregate(zip_with(_v, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        norm_c = repr(sum(float(x) * float(x) for x in cv) ** 0.5) + "D"
        return (
            f"named_struct('cos', round({dot} / (_nv * {norm_c}), {round_to}), "
            f"'neg_id', {-cid})"
        )

    return "array(" + ",".join(_cos_sql(cv, cid) for cid, cv in cent_rows) + ")"


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns each corpus
    vector to its nearest of ``n_centroids`` cells; each query probes
    its ``n_probe`` nearest cells and re-ranks exactly inside them —
    the classic FAISS-style sub-linear index, recall < 1 by design.

    ``centroids`` defaults to the vectors with id < n_centroids — a
    deterministic quantizer so the whole operator has an exact SQL twin;
    production trains centroids (e.g. ``pyspark.ml.clustering.KMeans``)
    and passes them in, nothing else changes.

    Scale: cells are a write-time property — at 100 TB the assignment
    runs once per ingest and the corpus is PARTITIONED BY cell on disk,
    so a probe is partition pruning: each query reads
    n_probe/n_centroids of the data. The assignment here is a PER-ROW
    expression: the (bounded, schema-registry-sized) centroid table is
    collected and inlined as literals, and each vector picks its cell
    by an ``array_max`` argmax over the per-centroid cosines — ZERO
    shuffle (the earlier row_number-window form exchanged
    corpus × n_centroids rows, a 16×-amplified shuffle of the vectors
    themselves). The only remaining shuffle is the per-query top-k
    window over probed candidates, which is the query's output.
    Tie-break identical to the window form: highest cosine, then lowest
    cent_id (struct max over (cos, -cent_id)).
    """
    cent = (
        centroids if centroids is not None else corpus.filter(F.col(id_col) < n_centroids)
    ).select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec"))
    cent_rows = sorted(
        ((r["cent_id"], list(r["c_vec"])) for r in cent.collect()),
        key=lambda x: x[0],
    )
    if not cent_rows:
        raise ValueError("ivf_cosine_topk: empty centroid set")

    cells_sql = _ivf_cells_sql(cent_rows, round_to)

    def with_norm(df: DataFrame, vid: str) -> DataFrame:
        return df.select(
            F.col(vid), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_nv")
        )

    # The argmax can never BE null (literal-built non-empty array), but
    # the optimizer marks array_max nullable — which makes the join
    # below push an IsNotNull(cent_id) filter INTO THE SCAN carrying the
    # whole 16-centroid expression, evaluating it twice per row
    # (measured 3× query cost). coalesce with an unreachable fallback
    # makes the column provably non-null so that filter folds away.
    argmax_cell = F.expr(
        f"coalesce(-array_max({cells_sql}).neg_id, {cent_rows[0][0]})"
    )
    assign = with_norm(corpus.withColumnRenamed(id_col, "n_id"), "n_id").select(
        F.col("n_id"),
        F.col("_v").alias("n_vec"),
        argmax_cell.alias("cent_id"),
    )
    probe_cells = F.expr(
        f"transform(slice(reverse(array_sort({cells_sql})), 1, {n_probe}), "
        "s -> -s.neg_id)"
    )
    probes = with_norm(queries.withColumnRenamed(id_col, "q_id"), "q_id").select(
        F.col("q_id"),
        F.col("_v").alias("q_vec"),
        F.explode(probe_cells).alias("cent_id"),
    )
    scored = (
        assign.join(F.broadcast(probes), "cent_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def ivf_recall_grid(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probes: tuple[int, ...] = (1, 2, 4, 8, 16),
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Every grid point of an IVF n_probe sweep in ONE shared pass
    (optimization r10, guide §2.4 "two operations keyed the same way
    share one exchange"): the cell assignment and the query's full
    probe ranking do not depend on n_probe, so instead of one
    ``ivf_cosine_topk`` plan per grid point (each with its own centroid
    collect, scored join and top-k window), score each (query,
    candidate) pair ONCE tagged with the rank of the candidate's cell
    in the query's probe order, and derive every grid point's top-k
    membership from one window: a running count of pairs whose
    cell-rank ≤ p (ordered cosine DESC, n_id — the ivf_cosine_topk
    order) equals the row_number ivf_cosine_topk computes over the
    rank ≤ p subset, so membership is ``rank ≤ p AND running_count_p
    ≤ k``. Agreement-tested row-for-row against per-point
    ivf_cosine_topk. Returns (n_probe, q_id, n_id, cosine, rnk)."""
    cent = (
        centroids if centroids is not None else corpus.filter(F.col(id_col) < n_centroids)
    ).select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec"))
    cent_rows = sorted(
        ((r["cent_id"], list(r["c_vec"])) for r in cent.collect()),
        key=lambda x: x[0],
    )
    if not cent_rows:
        raise ValueError("ivf_recall_grid: empty centroid set")
    if not n_probes:
        raise ValueError("ivf_recall_grid: empty n_probes grid")
    cells_sql = _ivf_cells_sql(cent_rows, round_to)
    max_probe = max(n_probes)

    def with_norm(df: DataFrame, vid: str) -> DataFrame:
        return df.select(
            F.col(vid), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_nv")
        )

    # same non-null coalesce trick as ivf_cosine_topk (see there)
    argmax_cell = F.expr(
        f"coalesce(-array_max({cells_sql}).neg_id, {cent_rows[0][0]})"
    )
    assign = with_norm(corpus.withColumnRenamed(id_col, "n_id"), "n_id").select(
        F.col("n_id"),
        F.col("_v").alias("n_vec"),
        argmax_cell.alias("cent_id"),
    )
    ranked_cells = F.expr(
        f"transform(slice(reverse(array_sort({cells_sql})), 1, {max_probe}), "
        "s -> -s.neg_id)"
    )
    probes = with_norm(queries.withColumnRenamed(id_col, "q_id"), "q_id").select(
        F.col("q_id"),
        F.col("_v").alias("q_vec"),
        F.posexplode(ranked_cells).alias("_pos", "cent_id"),
    ).select("q_id", "q_vec", "cent_id", (F.col("_pos") + 1).alias("cell_rank"))
    scored = (
        assign.join(F.broadcast(probes), "cent_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            "cell_rank",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))),
                round_to,
            ).alias("cosine"),
        )
    )
    w = (
        Window.partitionBy("q_id")
        .orderBy(F.col("cosine").desc(), F.col("n_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    counted = scored.select(
        "q_id",
        "n_id",
        "cosine",
        "cell_rank",
        *[
            F.sum(
                F.when(F.col("cell_rank") <= p, 1).otherwise(0)
            ).over(w).alias(f"_cnt_{p}")
            for p in n_probes
        ],
    )
    tagged = counted.select(
        "q_id",
        "n_id",
        "cosine",
        F.explode(
            F.array(
                *[
                    F.when(
                        (F.col("cell_rank") <= p) & (F.col(f"_cnt_{p}") <= k),
                        F.struct(
                            F.lit(p).cast("int").alias("n_probe"),
                            F.col(f"_cnt_{p}").cast("int").alias("rnk"),
                        ),
                    )
                    for p in n_probes
                ]
            )
        ).alias("_g"),
    ).filter(F.col("_g").isNotNull())
    return tagged.select(
        F.col("_g").getField("n_probe").alias("n_probe"),
        "q_id",
        "n_id",
        "cosine",
        F.col("_g").getField("rnk").alias("rnk"),
    )


def hyperplane_band_pairs(
    df: DataFrame,
    n_bands: int = 2,
    band_bits: int = 8,
    dim: int = 64,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded random-hyperplane LSH candidate pairs with EXACT integer
    re-scoring — the fully-oracle-checkable ANN path.

    Pipeline (one corpus scan → one per-band shuffle → candidate join):

    1. quantize: ``q[i] = floor(emb[i]·quant)`` as int64 — every later
       step is integer arithmetic, so Spark and any SQL engine agree
       bit-for-bit (float dot products only agree if summation order
       matches; integers remove the question entirely);
    2. sign bits: hyperplane ``p``'s weight for dim ``i`` is ±1 from an
       LCG parity ``(1103515245·(p·dim+i)+12345) mod 2³¹ < 2³⁰`` —
       deterministic, RNG-free, one-line SQL twin;
    3. band signatures: ``band_bits`` sign bits pack into an int per
       band; two vectors are CANDIDATES if any band matches (classic
       OR-amplification: match prob 1-(1-s^r)^b for similarity s);
    4. exact quantized dot re-scores candidates only.

    Scale: signatures are a write-time column; candidates come from a
    hash shuffle on (band, sig) whose fan-in per bucket is the tunable
    knob (more bands/bits → smaller buckets); the quadratic work is
    confined inside buckets. Returns ``id_a < id_b, dot`` (deduped
    across bands).
    """
    LCG_A, LCG_C, LCG_M, LCG_H = 1103515245, 12345, 2**31, 2**30
    qv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * quant).cast("long")
    )
    # loud exact-length guard (round-6 review #3): element_at past a
    # short vector returns null, which nulls every plane_dot and band
    # signature — null join keys never match, so short rows would
    # silently VANISH from the candidate set instead of erroring.
    # Evaluated as the WHEN condition of the output column — NOT inside
    # a transform() lambda, which never runs for empty arrays and
    # yields null for NULL arrays, the exact silent-loss modes the
    # guard exists to close (size(NULL) = -1 also trips it here).
    guard = F.expr(
        f"CASE WHEN size(`{vec_col}`) = {dim} THEN 0 ELSE "
        f"raise_error('hyperplane_band_pairs: embedding length must "
        f"equal dim={dim}') END"
    ).cast("long")
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(guard == F.lit(0), qv).alias("qv"),
    )

    def plane_dot(p: int) -> Column:
        def sgn(i: Column) -> Column:
            lcg = (
                F.lit(LCG_A).cast("long") * (F.lit(p * dim).cast("long") + i)
                + F.lit(LCG_C)
            ) % F.lit(LCG_M).cast("long")
            return F.when(lcg < F.lit(LCG_H).cast("long"), F.lit(1).cast("long")).otherwise(
                F.lit(-1).cast("long")
            )

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc + F.element_at(F.col("qv"), (i + 1).cast("int")) * sgn(i),
        )

    def band_sig(b: int) -> Column:
        sig = F.lit(0).cast("long")
        for j in range(band_bits):
            bit = (plane_dot(b * band_bits + j) > 0).cast("long")
            sig = sig + F.shiftleft(bit, j)
        return sig

    # materialize-or-pay (round-6 review #5): the renamed self-join
    # would otherwise run the planes x band_bits LCG dot products twice
    sigs = base.select(
        "id",
        "qv",
        F.posexplode(F.array(*[band_sig(b) for b in range(n_bands)])).alias(
            "band", "sig"
        ),
    ).localCheckpoint()
    a = sigs.select(
        F.col("id").alias("id_a"), F.col("qv").alias("qv_a"), "band", "sig"
    )
    b = sigs.select(
        F.col("id").alias("id_b"), F.col("qv").alias("qv_b"), "band", "sig"
    )
    cand = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv_a"), F.col("qv_b"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return cand.select("id_a", "id_b", dot.alias("dot"))


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_collect_rows: int = 1_000_000,
    dims: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b) with cosine ≥ threshold.

    Routing (review r2 #2 — no unguarded full-corpus collect):

    * corpus ≤ ``max_collect_rows`` → :func:`_near_dup_pairs_global`,
      the exact driver-broadcast matmul (64 MB at 1M×64d float64 —
      comfortably a broadcast, and exact);
    * larger → :func:`cosine_near_dup_pairs_bucketed`, the distributed
      per-LSH-bucket kernel — nothing corpus-sized ever reaches the
      driver; recall < 1 by construction (a pair hiding from all
      ``tables`` hash tables is missed), which is the standard trade
      at the scale where exact all-pairs stops existing.

    The size probe is ``limit(max+1).count()`` — a cheap bounded scan,
    not a full count, so the guard itself is O(max) at 100 TB.
    """
    probe = df.select(id_col).limit(max_collect_rows + 1).count()
    if probe > max_collect_rows:
        return cosine_near_dup_pairs_bucketed(
            df,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            dims=dims,
            planes=planes,
            tables=tables,
        )
    return _near_dup_pairs_global(df, threshold, id_col, vec_col)


def _near_dup_pairs_global(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact all-pairs near-dup, computed as a BLOCKED MATRIX PRODUCT:
    the corpus is materialized once as an (n × d) float64 matrix and
    broadcast; each Arrow batch of rows then scores against it with one
    numpy matmul (m×d @ d×n). An interpreted `aggregate`-HOF pair join
    did the same work 80× slower at sf0.1 (107 s → 1.3 s) — per-element
    lambdas never touch SIMD.

    Only reachable below the row-count guard in
    :func:`cosine_near_dup_pairs`; above it the bucketed kernel runs
    the same matmul per LSH bucket instead.
    """
    import numpy as np

    spark = df.sparkSession
    b_rows = df.select(id_col, vec_col).collect()
    b_ids = np.array([r[0] for r in b_rows], dtype=np.int64)
    B = np.array([list(r[1]) for r in b_rows], dtype=np.float64)
    b_norm = np.sqrt((B * B).sum(axis=1))
    bc = spark.sparkContext.broadcast((b_ids, B, b_norm))

    def block(batches):
        import pandas as pd

        ids_b, Bm, nb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids_a = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            na = np.sqrt((A * A).sum(axis=1))
            # dot/(|a||b|), rounded like the declarative form & the oracle
            C = np.round((A @ Bm.T) / np.outer(na, nb), 6)
            keep = (C >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"a_id": ids_a[ai], "b_id": ids_b[bj], "cosine": C[ai, bj]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        block, schema="a_id long, b_id long, cosine double"
    )


def bucket_sub_salt_expr(
    id_col: str = "_id", tbl_col: str = "tbl", count_col: str = "_bn",
    cap: int = 4096,
) -> str:
    """Deterministic sub-bucket assignment for oversized LSH buckets:
    16-bit value from the first 4 md5 hex chars of ``id:tbl``, modulo
    ``n_sub = ceil(bucket_count / cap)``. Including the TABLE in the
    hash input decorrelates the split across hash tables — with a
    table-independent salt (e.g. ``id % n_sub``) a pair separated in
    one table would be separated in ALL of them and recall would not
    recover; with per-table salts a hot-bucket pair survives with
    ~1-(1-1/s)^T. Engine-portable: md5 + STRPOS arithmetic replays
    bit-identically in DuckDB (the SimHash-oracle idiom)."""
    h = (
        f"md5(concat(CAST({id_col} AS STRING), ':', "
        f"CAST({tbl_col} AS STRING)))"
    )
    h16 = " + ".join(
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (3 - i)}"
        for i in range(4)
    )
    n_sub = (
        f"greatest(CAST(1 AS BIGINT), "
        f"CAST(ceil({count_col} / {float(cap)}) AS BIGINT))"
    )
    return f"pmod(CAST({h16} AS BIGINT), {n_sub})"


def cosine_near_dup_pairs_bucketed(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int | str = 4,
    tables: int = 8,
    bucket_cap: int | None = 4096,
    sig_col: str | None = None,
    auto_target_bucket: int = 512,
) -> DataFrame:
    """Distributed near-dup pairs: the exact matmul kernel of
    :func:`_near_dup_pairs_global`, run INSIDE each random-hyperplane
    LSH bucket (``hyperplane_signs`` — the same deterministic md5-parity
    hyperplanes as ``lsh_cosine_topk``), unioned over ``tables``
    independent hash tables and deduped.

    Scale shape: one corpus scan computes all table signatures
    (write-time column in production), one shuffle groups by
    (table, bucket), and the quadratic work is confined to buckets of
    ~n/2^planes rows — nothing corpus-sized touches the driver. A true
    pair is missed only if it splits in EVERY table (recall
    1-(1-r)^L); near-dup thresholds (≥0.95 cosine) put r near 1, which
    the sf0.001 agreement test pins.

    ``bucket_cap`` is the hot-bucket valve (the ``df_cap`` precedent
    from ``dedup._candidate_pair_stats``): a dense duplicate cluster —
    the NORMAL case in a web corpus — lands k near-identical
    signatures in ONE bucket of EVERY table, making one task O(k²)
    regardless of ``planes``. When a (table, bucket) group holds more
    than ``bucket_cap`` rows it is split into ``s = ceil(k/cap)``
    sub-buckets by a deterministic per-table md5 salt
    (:func:`bucket_sub_salt_expr`), bounding every task's pair work at
    ~cap². Semantics: reported pairs are still EXACT cosines; only
    recall inside oversized buckets drops — a hot-bucket pair is
    co-bucketed per table with probability ~1/s, surviving any of the
    ``tables`` tables with ~1-(1-1/s)^T (and a 10k-identical cluster
    still links into one connected component through its surviving
    pairs, which is what dedup consumes). The bucket-size census is a
    ≤ tables·2^planes-row aggregate, broadcast back — no extra
    full-width shuffle. ``bucket_cap=None`` disables the valve.

    The per-bucket cosine arithmetic is identical to the global kernel
    (same float64 matmul, same round-6), so any pair found by both
    paths carries the same score — what makes the agreement test an
    equality check, not an approximation bound.
    """
    import numpy as np

    # ``sig_col`` names a WRITE-TIME signature column (array<string>,
    # one bucket key per table — :func:`ann_signature_col`): the
    # production path at 100 TB, where signatures are materialized at
    # ingest and neither the bucketing pass nor the census computes a
    # single dot product. It also makes planes/dims irrelevant (they
    # are baked into the stored keys), so the "auto" sizing count is
    # skipped entirely — ADVICE r5: a corpus-sized count on the exact
    # path the feature exists to keep scan-free would be pure waste.
    if sig_col is not None:
        sig_arr = F.col(sig_col)
    else:
        if planes == "auto":
            # The round-5 10× probe's finding: at FIXED planes,
            # per-bucket occupancy grows linearly with the corpus, so
            # the in-bucket matmul grows QUADRATICALLY until bucket_cap
            # bites. planes must track ~log2(n / target-occupancy);
            # "auto" sizes it from a metadata-cheap count (parquet
            # row-count pushdown — no data scan). More planes = smaller
            # buckets = lower per-table recall for near-but-not-
            # identical pairs (exact duplicates always collide); the
            # `tables` OR-amplification compensates.
            import math

            n = df.count()
            planes = max(
                4, math.ceil(math.log2(max(n, 1) / auto_target_bucket))
            )
        assert isinstance(planes, int)
        sig_arr = F.array(
            *[
                hyperplane_signs(vec_col, dims, planes, table=t)
                for t in range(tables)
            ]
        )

    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        sig_arr.alias("_sigs"),
    )
    if sig_col is None and bucket_cap is not None:
        # materialize-or-pay (SCALE.md r5): with the valve on, BOTH the
        # census and the pair stage consume the signatures; computing
        # them in-plan would run the tables·planes dot products per row
        # TWICE (the measured ×1.72 bench regression, VERDICT r5 #2).
        # One executor-local materialization of (id, vec, sigs) — the
        # same bytes a write-time sig_col would have stored — feeds both
        # stages from disk instead.
        src = src.localCheckpoint()
    ex = src.select(
        "_id", "_vec", F.posexplode("_sigs").alias("tbl", "bucket")
    )

    group_cols = ["tbl", "bucket"]
    if bucket_cap is not None:
        # Bucket census: at most tables·2^planes distinct keys, so the
        # aggregate is map-side-combined to a handful of rows and the
        # join back is a broadcast — the valve costs a second corpus
        # scan, never a second full-width shuffle.
        census = F.broadcast(
            ex.groupBy("tbl", "bucket").agg(F.count("*").alias("_bn"))
        )
        # md5 sub-salt only where a bucket actually exceeds the cap —
        # on a healthy corpus (no bucket over cap) the valve costs the
        # census pass and nothing per-row (n_sub=1 ⇒ sub=0 anyway)
        ex = ex.join(census, ["tbl", "bucket"]).withColumn(
            "sub",
            F.when(
                F.col("_bn") > bucket_cap,
                F.expr(bucket_sub_salt_expr(cap=bucket_cap)),
            ).otherwise(F.lit(0).cast("bigint")),
        )
        group_cols = ["tbl", "bucket", "sub"]

    def bucket_pairs(pdf):
        import pandas as pd

        ids = pdf["_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
            )
        A = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
        n = np.sqrt((A * A).sum(axis=1))
        C = np.round((A @ A.T) / np.outer(n, n), 6)
        keep = (C >= threshold) & (ids[:, None] < ids[None, :])
        ai, bj = np.nonzero(keep)
        return pd.DataFrame({"a_id": ids[ai], "b_id": ids[bj], "cosine": C[ai, bj]})

    pairs = ex.groupBy(*group_cols).applyInPandas(
        bucket_pairs, schema="a_id long, b_id long, cosine double"
    )
    # same pair may surface from several tables with an identical score
    return pairs.dropDuplicates(["a_id", "b_id"])


def sq8_codebook_stats(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """The SQ8 codebook as a 1-row (mn, mx) aggregate over ``df`` —
    factored out (optimization r11) so a caller that needs the codebook
    AND the coded table references ONE subtree: identical aggregate
    subplans dedupe under ReuseExchange, where the former
    ``coded.limit(1)`` derivation re-ran the full min/max corpus scan
    per reference."""
    # ONE SQL-string parse instead of 2×dims py4j Column round trips —
    # the plan-build cost finding from SCALE.md round 3 (measured ~1 s
    # of driver time per build at dims=64)
    mn_expr = "array(" + ",".join(
        f"min(element_at({vec_col}, {i + 1}))" for i in range(dims)
    ) + ")"
    mx_expr = "array(" + ",".join(
        f"max(element_at({vec_col}, {i + 1}))" for i in range(dims)
    ) + ")"
    return df.agg(
        F.expr(mn_expr).cast("array<double>").alias("mn"),
        F.expr(mx_expr).cast("array<double>").alias("mx"),
    )


def sq8_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Scalar 8-bit quantization (SQ8): per-dimension min/max codebook.

    ``code_i = floor((x_i - mn_i) * 255 / (mx_i - mn_i))`` (0 when the
    dimension is constant), so each float32 dimension compresses to one
    byte — 4× smaller vectors, and candidate scoring can run on integer
    codes (SIMD-friendly) with exact re-rank on the survivors. The
    codebook is two d-length arrays from ONE aggregate scan
    (partial-aggregated map-side), broadcast everywhere — at 100 TB the
    quantized table is materialized once and every search scans 1/4 the
    bytes. ``floor`` (not round) keeps the code arithmetic replayable
    bit-for-bit by any IEEE-double engine, which is what lets the
    DuckDB oracle hash-check the whole pipeline (same trick as
    ``hyperplane_band_pairs``).

    Output: (id, codes array<int>, mn array<double>, mx array<double>)
    — mn/mx ride along as literal-like broadcast columns for
    dequantization downstream.
    """
    if dims is None:
        # dims probe: one action per plan BUILD — callers that know
        # their embedding schema (dims is a pipeline contract) pass it
        # and skip the job entirely
        head = df.filter(F.col(vec_col).isNotNull()).select(vec_col).take(1)
        if not head or not head[0][0]:
            raise ValueError("sq8_quantize: corpus has no non-null embeddings")
        # fixed-dims contract: every vector must carry exactly this many
        # dimensions (element_at beyond a short vector yields null codes)
        dims = len(head[0][0])
    if stats is None:
        stats = sq8_codebook_stats(df, vec_col=vec_col, dims=dims)
    coded = df.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(stats)
    )
    code = _sq8_code(F.col(vec_col), F.col("mn"), F.col("mx"))
    return coded.select(
        F.col(id_col), code.alias("codes"), F.col("mn"), F.col("mx")
    )


def _sq8_code(vec: Column, mn: Column, mx: Column) -> Column:
    """Per-row SQ8 coding of ``vec`` against an (mn, mx) codebook."""
    idx = F.transform(mn, lambda _, i: i)
    return F.transform(
        idx,
        lambda i: F.when(
            F.element_at(mx, i + 1) > F.element_at(mn, i + 1),
            F.floor(
                (F.element_at(vec, i + 1).cast("double") - F.element_at(mn, i + 1))
                * 255.0
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )


def sq8_dequantize(codes: Column, mn: Column, mx: Column) -> Column:
    """Reconstruct doubles from SQ8 codes: ``mn_i + c_i*(mx_i-mn_i)/255``."""
    return F.zip_with(
        codes,
        F.zip_with(mn, mx, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda c, s: s["mn"] + c.cast("double") * (s["mx"] - s["mn"]) / 255.0,
    )


def sq8_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    dims: int | None = None,
) -> DataFrame:
    """Top-k by cosine over SQ8-RECONSTRUCTED vectors (self excluded).

    The search never touches the original floats: both sides quantize
    with the corpus codebook, dequantize to doubles, and score — i.e.
    exactly what an index serving 8-bit codes can compute. Quantization
    error shifts cosines by O(1/255) per dim, so recall vs the exact
    float path stays near 1 (contract-gated in q_ann_sq8_recall).

    Scale: same shape as cosine_topk — broadcast(queries+codebook) ⋈
    one corpus scan (reading int8 codes, 1/4 the bytes), window top-k.
    """
    if dims is None:
        head = corpus.filter(F.col(vec_col).isNotNull()).select(vec_col).take(1)
        if not head or not head[0][0]:
            raise ValueError("sq8_cosine_topk: corpus has no non-null embeddings")
        dims = len(head[0][0])
    # ONE codebook subtree shared by the coded corpus and the query
    # coder (optimization r11): the former codebook = coded.limit(1)
    # was a DIFFERENT subplan, so the corpus-wide min/max aggregate
    # scan re-ran for it; the shared aggregate dedupes under
    # ReuseExchange
    stats = sq8_codebook_stats(corpus, vec_col=vec_col, dims=dims)
    coded = sq8_quantize(
        corpus, id_col=id_col, vec_col=vec_col, dims=dims, stats=stats
    )
    c = coded.select(
        F.col(id_col).alias("n_id"),
        sq8_dequantize(F.col("codes"), F.col("mn"), F.col("mx")).alias("n_vec"),
    ).withColumn("n_norm", _norm(F.col("n_vec")))
    # queries quantize THEIR OWN vectors with the corpus codebook
    # (review r2: an id-lookup in the corpus silently dropped novel
    # queries and scored stale vectors for clashing ids); for
    # queries ⊆ corpus the codes — and therefore the ranks — are
    # identical to the lookup form
    codebook = stats
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col))
        .crossJoin(F.broadcast(codebook))
        .select(
            "q_id",
            sq8_dequantize(
                _sq8_code(F.col(vec_col), F.col("mn"), F.col("mx")),
                F.col("mn"),
                F.col("mx"),
            ).alias("q_vec"),
        )
        # norm hoisted below the join, same as cosine_topk: once per
        # query row in the broadcast build, not once per pair
        .withColumn("q_norm", _norm(F.col("q_vec")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def bq_code_words(vec_col: str, dims: int = 64) -> tuple[Column, Column]:
    """Sign binary quantization: bit i set iff x_i > 0, packed into two
    32-bit halves carried as longs (no int64 sign-bit hazard, and the
    pack is a SUM of distinct powers of two — no carries, so any
    engine replays it exactly)."""

    def word(lo: int, hi: int) -> Column:
        if hi <= lo:
            # empty range: sequence(lo, hi-1) with lo > hi-1 generates a
            # DESCENDING sequence, not an empty one (round-6 review #2 —
            # for dims <= 32 the second word re-tested the last
            # dimension and shiftleft(1L, -1) masked to bit 63,
            # double-weighting it in every Hamming distance)
            return F.lit(0).cast("long")
        return F.expr(
            f"aggregate(sequence({lo}, {hi - 1}), 0L, (a, i) -> a + "
            f"(CASE WHEN element_at({vec_col}, i + 1) > 0 "
            f"THEN shiftleft(1L, i - {lo}) ELSE 0L END))"
        )

    return word(0, min(dims, 32)), word(min(dims, 32), dims)


def bq_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    oversample: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    dims: int = 64,
) -> DataFrame:
    """Binary-quantization ANN (the faiss/weaviate "BQ" recipe, 1 bit
    per dimension): sign-quantize every vector (64 dims → 8 BYTES, a
    32× compression over float32), shortlist ``k*oversample``
    (default 100) candidates per query by Hamming distance over the packed words
    (XOR + popcount — the cheapest distance a vector index can
    compute), then re-rank ONLY the shortlist with exact float cosine.
    Completes the quantization family next to SQ8 (4×) and PQ4x8
    (16×).

    Exactness: the sign rule compares each float to 0 (order-
    independent, no trained codebook), the pack is a carry-free sum of
    distinct powers of two, and Hamming is integer XOR/popcount — the
    whole shortlist is bit-exact cross-engine; the re-rank reuses the
    proven cosine contract (round to ``round_to``). Ties: shortlist
    (hamming, n_id), final (cosine DESC, n_id).

    Scale: ONE corpus scan reading 8-byte codes (the float vectors are
    touched only for the ≤ k·oversample·|Q| shortlist join), queries
    broadcast twice (codes, then floats), two window top-Ks on
    query-keyed partitions. At 100 TB the code table is 1/32 the scan
    bytes and the exact-cosine cost is independent of corpus size.
    """
    w0, w1 = bq_code_words(vec_col, dims)
    c_codes = corpus.select(
        F.col(id_col).alias("n_id"), w0.alias("cw0"), w1.alias("cw1")
    )
    q_codes = queries.select(
        F.col(id_col).alias("q_id"), w0.alias("qw0"), w1.alias("qw1")
    )
    ham = (
        F.bit_count(F.expr("cw0 ^ qw0")) + F.bit_count(F.expr("cw1 ^ qw1"))
    ).alias("hamming")
    cand = (
        c_codes.crossJoin(F.broadcast(q_codes))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", ham)
    )
    w_short = Window.partitionBy("q_id").orderBy("hamming", "n_id")
    short = (
        cand.withColumn("_r", F.row_number().over(w_short))
        .filter(F.col("_r") <= k * oversample)
        .drop("_r")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("n_norm", _norm(F.col("n_vec")))
    q_vec = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    rer = (
        short.join(c_vec, "n_id")
        .join(F.broadcast(q_vec), "q_id")
        .select(
            "q_id",
            "n_id",
            "hamming",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                round_to,
            ).alias("cosine"),
        )
    )
    w_final = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id")
    )
    return (
        rer.withColumn("rnk", F.row_number().over(w_final))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "hamming", "cosine", F.col("rnk").cast("long"))
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Public wrapper over :func:`_kmeans_core` returning only the
    assignment DataFrame; :func:`kmeans_centroids` returns the trained
    means. Distributed Lloyd's k-means over an embedding column — the
    domain-discovery primitive of a data-mixing pipeline (cluster a
    corpus into k pseudo-domains, then weight/sample per cluster the
    way DoReMi/UniMax weight named domains; also the trained-quantizer
    upgrade path :func:`ivf_cosine_topk` points at). Returns one row
    per vector: (id, cluster, n_iters).

    Engine-portable by construction, like ``hyperplane_band_pairs``:

    * vectors are INTEGERIZED once (``floor(x·scale)`` per dimension),
      so per-cluster sums — the only multi-row reduction — are exact
      integer arithmetic, immune to float summation order;
    * centroids stay exact ``(sum, count)`` pairs; the per-row distance
      ``Σ (x_i − s_i/c)²`` divides the same int64s into IEEE doubles in
      any engine and folds over a fixed 64-step order, so every
      assignment (argmin with cluster-id tie-break) is bit-reproducible
      in DuckDB — full ``iters``-deep hash parity, not rows-only;
    * seeds are the k first vectors in md5(id) order — the same
      reproducible engine-portable shuffle ``q_corpus_quota_sample``
      uses (seeded rand() is engine-specific, md5 is not).

    Scale shape: each iteration is ONE corpus scan. The assignment is a
    per-row expression over broadcast-inlined centroid literals (k·d
    doubles — bytes, the IVF precedent), ZERO shuffle; the centroid
    update shuffles only map-side-combined partials (≤ k·d rows per
    partition) and collects k·d rows to the driver — constant-sized,
    like the IVF centroid collect. Nothing corpus-sized moves: at
    100 TB the cost is iters × (scan + k·d·n multiply-adds), the
    textbook distributed-k-means profile. ``k``/``iters`` stay small
    and explicit because every +1 iteration is +1 full scan — the
    caller budgets scans, not the operator.
    """
    return _kmeans_core(df, k, iters, id_col, vec_col, dims, scale)[0]


def _kmeans_core(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    dims: int,
    scale: int,
) -> tuple[DataFrame, list[list[float]]]:
    """(assignments, final means) — see :func:`kmeans_assign`."""
    if k < 1 or iters < 1:
        raise ValueError("kmeans_assign: k and iters must be >= 1")
    xq = (
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )
    base = df.select(F.col(id_col).alias("_id"), F.expr(xq).alias("_xq"))

    # deterministic seeds: first k in md5(id) order (ties by id)
    seed_rows = (
        base.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_assign: k={k} > corpus size {len(seed_rows)}")
    means = [[float(v) for v in r["_xq"]] for r in seed_rows]
    # dims is a declared contract, not dead surface (round-6 review #9):
    # a mismatched embedding width would null-poison the zip_with
    # distances silently — validate it against the seeds we just read
    if any(len(m) != dims for m in means):
        raise ValueError(
            f"kmeans_assign: dims={dims} but seed vectors have length "
            f"{sorted({len(m) for m in means})}"
        )

    def _assign(m: list[list[float]]) -> DataFrame:
        # ONE SQL string per plan build (the IVF lesson: py4j lambda
        # composition costs seconds per plan; string assembly does not)
        structs = []
        for j, mj in enumerate(m):
            arr = "array(" + ",".join(repr(x) + "D" for x in mj) + ")"
            d = (
                f"aggregate(zip_with(_xq, {arr}, "
                "(x, mm) -> (CAST(x AS DOUBLE) - mm) * (CAST(x AS DOUBLE) - mm)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            # round-6 before the argmin: the repo-wide float-oracle
            # discipline (both engines fold the same 64 doubles in
            # order; rounding absorbs any last-ULP divergence)
            structs.append(f"named_struct('d', round({d}, 6), 'cl', {j})")
        argmin = f"array_min(array({', '.join(structs)})).cl"
        return base.withColumn("cluster", F.expr(argmin))

    assigned = _assign(means)
    for _ in range(iters - 1):
        # exact integer partial sums; k·d rows reach the driver
        sums = (
            assigned.select("cluster", F.posexplode("_xq").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        by_cl: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            by_cl.setdefault(r["cluster"], []).append((r["pos"], r["s"], r["c"]))
        nxt = []
        for j in range(k):
            if j in by_cl:
                row = sorted(by_cl[j])
                nxt.append([s / c for _, s, c in row])
            else:  # empty cluster keeps its previous centroid
                nxt.append(means[j])
        means = nxt
        assigned = _assign(means)

    out = assigned.select(
        F.col("_id").alias(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.lit(iters).cast("int").alias("n_iters"),
    )
    return out, means


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """The TRAINED coarse quantizer: run :func:`kmeans_assign` and
    return the final centroid means as a k-row DataFrame
    (``id_col``, ``vec_col`` double arrays in the floor(x·scale)
    space) — exactly the shape :func:`ivf_cosine_topk` accepts as
    ``centroids=``, closing its docstring's "production trains
    centroids and passes them in" loop. Cosine is scale-invariant, so
    the scaled-space centroids quantize raw vectors directly; the
    values are the same exact int-sum/count divisions the oracle
    replays, so a trained-IVF query stays hash-checkable end-to-end.
    """
    _, means = _kmeans_core(df, k, iters, id_col, vec_col, dims, scale)
    return df.sparkSession.createDataFrame(
        [(j, m) for j, m in enumerate(means)],
        f"{id_col} long, {vec_col} array<double>",
    )


def ann_signature_col(
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> Column:
    """The write-time ANN signature column: one hyperplane bucket key
    per hash table (``array<string>``), exactly what
    :func:`cosine_near_dup_pairs_bucketed` / :func:`lsh_cosine_topk`
    compute in-plan. Materialize it at INGEST (one projection in the
    write pipeline, ~tables·planes dot products per row, bytes per
    row on disk) and pass ``sig_col=`` downstream: dedup/search then
    never touch the float vectors for bucketing, the hot-bucket census
    becomes a column scan, and the bucketing is stable across runs
    because the hyperplanes are deterministic md5-parity literals —
    re-signing after an engine upgrade is a no-op diff."""
    return F.array(
        *[
            hyperplane_signs(vec_col, dims, planes, table=t)
            for t in range(tables)
        ]
    )


def mmr_select(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 5,
    lam_milli: int = 700,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidates: int = 1_000_000,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR'98): greedily pick k items maximizing ``λ·rel(d) −
    (1−λ)·max_{s∈S} sim(d, s)`` — relevance to the query balanced
    against redundancy with what's already selected. THE diverse-subset
    primitive for eval-set curation and dedup-aware retrieval.

    Determinism contract: cosines round to 6 decimals (the ANN-family
    convention), λ is an integer in milli; the per-step objective
    ``lam·rel − (1000−lam)·maxsim`` combines identical doubles with
    integer coefficients, so an SQL oracle unrolling the same k steps
    reproduces every pick bit-for-bit (ties break on id).

    Scale: greedy MMR is sequential BY DEFINITION (pick i depends on
    picks 1..i−1) — the k-step driver loop is the published algorithm,
    not a distribution failure. Per step the work IS distributed: one
    corpus-partitioned pass scoring every candidate against the ≤k
    broadcast selected vectors, then a TakeOrdered(1). rel() is
    computed once and localCheckpointed; total cost = one scan + k
    passes over the checkpointed (id, vec, rel) projection.

    Returns (rnk, vec_id, rel, max_sim) — max_sim NULL for the first
    pick (no selected set yet to be redundant with).

    ``max_candidates`` (VERDICT r8 #6): MMR is a RE-RANKER — its input
    is a retrieved shortlist, not a raw corpus — and this implementation
    localCheckpoints the whole (id, vec, rel) projection so the k greedy
    passes don't recompute it. Pointing it at a 100 TB corpus would
    materialize that projection; the same bounded ``limit(max+1).count()``
    probe ``cosine_near_dup_pairs`` uses (O(max), never a full count)
    refuses with a pointer at the ANN-shortlist-then-MMR composition.
    """
    import os

    probe = corpus.select(id_col).limit(max_candidates + 1).count()
    if probe > max_candidates:
        raise ValueError(
            f"mmr_select: candidate set exceeds max_candidates="
            f"{max_candidates:,}. MMR re-ranks a retrieved shortlist — "
            "narrow the corpus first (e.g. ivf_cosine_topk / "
            "cosine_topk with a generous k), then MMR-select from those "
            "candidates; or raise max_candidates deliberately if the "
            "projection genuinely fits your cluster's storage."
        )
    # Bounded driver-side greedy (optimization r10, guide §2.4/§5): a
    # shortlist at or below PLRS_MMR_LOCAL_MAX_CANDIDATES (default
    # 4096) is collected once and the k greedy steps run on the driver
    # — 3 narrow jobs total instead of a checkpointed corpus pass plus
    # one shuffle + TakeOrdered job PER STEP. Float semantics reproduce
    # the distributed plan exactly: dots/norms are sequential left
    # folds over float32→float64 upcasts (the zip_with/aggregate order)
    # and rounding is shortest-repr decimal HALF_UP (what Spark's
    # round() does via BigDecimal.valueOf). Any None/NaN/Inf or
    # dimension mismatch falls through to the distributed path, which
    # is unchanged and remains the scale path. Agreement-tested
    # row-for-row against the distributed path.
    local_max = int(os.environ.get("PLRS_MMR_LOCAL_MAX_CANDIDATES", "4096"))
    if probe <= local_max:
        result = _mmr_select_local(
            corpus, query, k, lam_milli, id_col, vec_col
        )
        if result is not None:
            return result
    q = query.select(F.col(vec_col).alias("q_vec")).limit(1)
    cand = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            F.round(
                _dot(F.col(vec_col), F.col("q_vec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("q_vec"))),
                6,
            ).alias("rel"),
        )
        .localCheckpoint()
    )
    spark = corpus.sparkSession
    selected: list = []  # rows: (rnk, vec_id, v, rel, max_sim)
    for rnk in range(1, k + 1):
        remaining = cand.filter(
            ~F.col("vec_id").isin([r[1] for r in selected])
            if selected
            else F.lit(True)
        )
        if not selected:
            pick = remaining.orderBy(
                F.col("rel").desc(), F.col("vec_id")
            ).limit(1).collect()
            if not pick:
                break
            r = pick[0]
            selected.append((rnk, r.vec_id, r.v, r.rel, None))
            continue
        sel_df = F.broadcast(
            spark.createDataFrame(
                [(rid, v) for _, rid, v, _, _ in selected],
                "s_id long, s_vec array<float>",
            )
        )
        scored = (
            remaining.crossJoin(sel_df)
            .select(
                "vec_id",
                "v",
                "rel",
                F.round(
                    _dot(F.col("v"), F.col("s_vec"))
                    / (_norm(F.col("v")) * _norm(F.col("s_vec"))),
                    6,
                ).alias("s_sim"),
            )
            .groupBy("vec_id", "v", "rel")
            .agg(F.max("s_sim").alias("max_sim"))
        )
        pick = scored.orderBy(
            (
                F.lit(lam_milli) * F.col("rel")
                - F.lit(1000 - lam_milli) * F.col("max_sim")
            ).desc(),
            F.col("vec_id"),
        ).limit(1).collect()
        if not pick:
            break
        r = pick[0]
        selected.append((rnk, r.vec_id, r.v, r.rel, r.max_sim))
    return spark.createDataFrame(
        [(rnk, rid, rel, ms) for rnk, rid, _v, rel, ms in selected],
        "rnk long, vec_id long, rel double, max_sim double",
    )


def _mmr_round6(x: float) -> float:
    """Spark round(col, 6) for DoubleType: BigDecimal.valueOf(x)
    (shortest round-trip decimal) .setScale(6, HALF_UP), NaN/Inf passed
    through. Python's repr is the same shortest round-trip decimal."""
    from decimal import ROUND_HALF_UP, Decimal

    if x != x or x in (float("inf"), float("-inf")):
        return x
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _mmr_select_local(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    lam_milli: int,
    id_col: str,
    vec_col: str,
):
    """Driver-side MMR over a collected shortlist. Returns None when
    the data trips a guard (missing/ragged/NaN vectors or degenerate
    norms) — the caller then uses the distributed path, whose SQL
    semantics (null cosines, NaN ordering) this fast path does not
    reproduce."""
    spark = corpus.sparkSession
    qrows = query.select(vec_col).limit(1).collect()
    rows = corpus.select(id_col, vec_col).collect()

    def _fold_dot(a, b):  # sequential left fold, the zip_with order
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    if qrows and qrows[0][0] is None:
        # NULL query vector (ADVICE r10): the distributed path still
        # selects k rows with NULL rel (nulls-last ordering) — an
        # ungoverned case this fold does not reproduce, so fall through
        return None
    cands = []  # (vec_id, vec, norm, rel)
    if qrows and qrows[0][0] is not None:
        qv = [float(x) for x in qrows[0][0]]
        qn = _fold_dot(qv, qv) ** 0.5
        dim = len(qv)
        for r in rows:
            vid, vec = r[0], r[1]
            if vid is None or vec is None or len(vec) != dim:
                return None
            v = [float(x) for x in vec]
            vn = _fold_dot(v, v) ** 0.5
            denom = vn * qn
            if denom == 0.0:
                return None
            rel = _mmr_round6(_fold_dot(v, qv) / denom)
            if rel != rel or rel in (float("inf"), float("-inf")):
                return None
            cands.append((int(vid), v, vn, rel))

    selected = []  # (rnk, vec_id, rel, max_sim)
    chosen: set = set()
    max_sims: dict = {}  # vec_id -> running max over selected picks
    for rnk in range(1, k + 1):
        best = None
        for vid, v, vn, rel in cands:
            if vid in chosen:
                continue
            if not selected:
                key = (-rel, vid)
            else:
                ms = max_sims[vid]
                if ms != ms:
                    return None
                key = (-(lam_milli * rel - (1000 - lam_milli) * ms), vid)
            if best is None or key < best[0]:
                best = (key, vid, rel)
        if best is None:
            break
        _, bid, brel = best
        chosen.add(bid)
        selected.append(
            (rnk, bid, brel, None if rnk == 1 else max_sims[bid])
        )
        bvec = next(v for vid, v, _, _ in cands if vid == bid)
        bnorm = next(vn for vid, _, vn, _ in cands if vid == bid)
        for vid, v, vn, _rel in cands:
            if vid in chosen:
                continue
            denom = vn * bnorm
            if denom == 0.0:
                return None
            s = _mmr_round6(_fold_dot(v, bvec) / denom)
            prev = max_sims.get(vid)
            max_sims[vid] = s if prev is None or s > prev else prev
    return spark.createDataFrame(
        selected, "rnk long, vec_id long, rel double, max_sim double"
    )
