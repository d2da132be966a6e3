"""Plan-level scan hygiene for the query layer: predicates must reach
the parquet reader (PushedFilters) and projections must prune columns
(ReadSchema) — the two properties that price a 100 TB scan by what the
query needs instead of what the table holds.
"""

from pg_logical_replication_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _scans(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def _scan_of(df, table: str) -> str:
    for ln in _scans(df):
        if f"{table}.parquet" in ln:
            return ln
    raise AssertionError(f"no parquet scan of {table}")


def test_q6_filters_push_to_lineitem_scan(spark):
    """q6 is scan+agg only — every predicate must be in PushedFilters."""
    df = QUERIES["q6_forecast_revenue"].builder(spark, SF)
    scan = _scan_of(df, "lineitem")
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan.split("PushedFilters:")[1], scan


def test_q6_reads_only_needed_columns(spark):
    df = QUERIES["q6_forecast_revenue"].builder(spark, SF)
    scan = _scan_of(df, "lineitem")
    read_schema = scan.split("ReadSchema:")[1]
    assert "l_extendedprice" in read_schema
    # untouched wide columns must be pruned from the parquet read
    for col in ("l_returnflag", "l_orderkey", "l_suppkey", "l_tax"):
        assert col not in read_schema, scan


def test_asof_bound_pushes_to_events_scan(spark):
    df = QUERIES["q_cdc_asof_snapshot"].builder(spark, SF)
    scan = _scan_of(df, "events")
    assert "ts" in scan.split("PushedFilters:")[1], scan
    assert "props" not in scan.split("ReadSchema:")[1], scan


def test_q1_prunes_lineitem_to_aggregated_columns(spark):
    df = QUERIES["q1_pricing_summary"].builder(spark, SF)
    scan = _scan_of(df, "lineitem")
    read_schema = scan.split("ReadSchema:")[1]
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        assert col not in read_schema, scan


def test_curation_pipeline_prunes_documents(spark):
    """The curation rollup needs text/lang/doc_id only — n_chars and
    source must not be read."""
    df = QUERIES["q_pipeline_corpus_curation"].builder(spark, SF)
    scan = _scan_of(df, "documents")
    read_schema = scan.split("ReadSchema:")[1]
    assert "n_chars" not in read_schema, scan
    assert "source" not in read_schema, scan


def test_bloom_prune_broadcasts_bit_set(spark):
    """The Bloom build side must reach the probe as a broadcast (bit
    set ≤ 3·|keys| longs) — if it shuffles, the pruning pattern is
    pointless at scale."""
    df = QUERIES["q_join_bloom_prune"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the probe side reads only its join key from parquet
    scan = _scan_of(df, "lineitem")
    assert "l_suppkey" in scan.split("ReadSchema:")[1]
    assert "l_extendedprice" not in scan.split("ReadSchema:")[1], scan


def test_doc_chunks_plan_has_no_exchange(spark):
    """Chunking is a pure narrow map — split/sequence/explode/slice
    with zero shuffle; only the presentation sort may exchange."""
    import re

    df = QUERIES["q_doc_chunks"].builder(spark, SF)
    # the final orderBy is presentation-only; the transformation core
    # below the sort must be exchange-free
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = re.split(r"Sort|TakeOrderedAndProject", plan)[-1]
    assert "Exchange hashpartitioning" not in body, plan


def test_attribution_single_exchange_on_user(spark):
    """Both IGNORE-NULLS window columns share one frame, so the
    plan carries exactly one hash exchange on user_id before the final
    aggregation."""
    df = QUERIES["q_events_attribution"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_user_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_user_exchanges == 1, plan


def test_capped_jaccard_single_lineage_plan(spark):
    """df-capped pairwise dedup must be the posting-list explosion, not
    a self-join: one scan of documents, exactly 3 exchanges (doc → sh →
    pair), no broadcast, no duplicated shingle pipeline (review r3:
    Spark plans no ReusedExchange across renamed self-join sides, so the
    join form paid 2x the scan + a 4th exchange)."""
    from pg_logical_replication_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = D.jaccard_pairs(docs, threshold=0.0, df_cap=20)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") == 0
    n_exchange = sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line
    )
    assert n_exchange == 3, plan
    assert plan.count("Scan parquet") == 1, "shingle pipeline ran twice"


def test_bucketed_near_dup_single_shuffle_plan(spark):
    """The per-LSH-bucket near-dup kernel, both valve modes.

    bucket_cap=None (the pre-r5 contract): one scan, exactly two
    Exchanges — the groupBy(tbl, bucket) feeding applyInPandas (corpus
    rows, the one heavy shuffle) and the cross-table pair dedup (only
    (a_id, b_id, cosine) triples). No joins, no broadcast.

    Default bucket_cap: the hot-bucket census joins back as exactly ONE
    BroadcastExchange of a ≤ tables·2^planes-row aggregate; corpus-row
    exchanges stay at two (group + dedup) plus the census's own tiny
    partial-agg exchange — the valve must never add a full-width
    shuffle or a non-broadcast join."""
    from pg_logical_replication_spark.operators.similarity import (
        cosine_near_dup_pairs_bucketed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    pairs = cosine_near_dup_pairs_bucketed(emb, threshold=0.9, bucket_cap=None)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("BroadcastExchange") == 0
    n_exchange = sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line
    )
    assert n_exchange == 2, plan
    assert "Join" not in plan

    capped = cosine_near_dup_pairs_bucketed(emb, threshold=0.9)
    plan_c = capped._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan_c
    n_bcast = sum(
        1 for line in plan_c.splitlines()
        if "BroadcastExchange" in line and "Reused" not in line
    )
    assert n_bcast == 1, plan_c  # the census, nothing else
    assert "BroadcastHashJoin" in plan_c
    assert "SortMergeJoin" not in plan_c and "ShuffledHashJoin" not in plan_c
    n_exchange_c = sum(
        1 for line in plan_c.splitlines()
        if "Exchange" in line
        and "Reused" not in line
        and "BroadcastExchange" not in line
    )
    # group + dedup + the census partial-agg (≤ tables·2^planes rows)
    assert n_exchange_c == 3, plan_c


def test_ivf_assignment_is_shuffle_free(spark):
    """IVF cell assignment must be a per-row expression: the only
    Exchanges in the whole query are the final top-k window on q_id and
    nothing corpus-side before the probe join (review r3: the previous
    crossJoin + row_number form exchanged corpus x n_centroids rows)."""
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ivf_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        line.strip()
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    ]
    assert len(shuffles) == 1 and "q_id" in shuffles[0], plan
    # the pushed IsNotNull must not carry the argmax into the scan
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    assert "array_max" not in scan, scan


def test_linear_quality_scorer_has_no_exchange(spark):
    """The hashed-linear classifier is a pure scan-stage expression:
    no shuffle, no Python — the 100 TB first-pass-filter shape."""
    df = QUERIES["q_text_quality_linear"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # only the two needed columns reach the parquet read
    scan = _scan_of(df, "documents")
    read_schema = scan.split("ReadSchema:")[1]
    assert "text" in read_schema and "lang" not in read_schema


def test_codec_queries_are_scan_plus_mapinpandas_only(spark):
    """Real-codec round-trips must not shuffle: payload bytes stay in
    the partition that synthesized them (decode parallelism = partition
    count). The only allowed exchange is the small-input respread."""
    for name in ("q_mm_jpeg_decode", "q_mm_flac_decode",
                 "q_mm_webp_decode", "q_mm_gif_decode",
                 "q_mm_tiff_decode", "q_mm_media_probe",
                 "q_mm_adpcm_decode", "q_mm_bmp_decode"):
        df = QUERIES[name].builder(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert all("RoundRobin" in ln for ln in exchanges), (name, exchanges)
        assert plan.count("MapInPandas") == 2, name  # synth + decode


def test_bigram_lm_scoring_joins_broadcast(spark):
    """The LM scoring joins (pairs x c2k, pairs x c1k) must broadcast:
    the LM tables are top-K-capped so nothing corpus-sized ever
    sort-merge-joins, and scoring stays a single scan + broadcast
    probes at any corpus size. No Python anywhere."""
    df = QUERIES["q_text_lm_perplexity"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # LM tables are capped by distributed top-K, not a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_bpe_train_rounds_are_vocab_sized(spark):
    """BPE training must touch the corpus exactly once (word-count
    top-K onto a localCheckpoint); each of the 6 merge rounds is then
    one vocab-sized pair aggregation — no join at all, no Python,
    and no O(2^N) lineage re-inlining (63 exchanges without the
    checkpoint; 6 with it). The distributed chain stays the at-scale
    fallback above the r10 driver fast-path bound, so its shape is
    pinned with the fast path forced off; the production (fast-path)
    plan is then just the driver-built merge table."""
    from pg_logical_replication_spark.operators import text as TX

    orig = TX._MERGE_DRIVER_MAX_WORDS
    try:
        TX._MERGE_DRIVER_MAX_WORDS = 0
        df = QUERIES["q_text_bpe_train"].builder(spark, SF)
    finally:
        TX._MERGE_DRIVER_MAX_WORDS = orig
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 6, plan
    assert plan.count("TakeOrderedAndProject") == 6, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed vocab

    fast = QUERIES["q_text_bpe_train"].builder(spark, SF)
    fplan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in fplan, fplan
    assert "Scan ExistingRDD" in fplan  # the driver-built merge table


def test_bpe_encode_is_one_broadcast_join(spark):
    """Encoding under the trained vocab: corpus scan + ONE broadcast
    hash join against the capped lookup table + map-side-combined
    groupBy(doc_id). Document text must never reach a sort-merge join."""
    df = QUERIES["q_text_bpe_encode"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    # the only nested-loop is the 1-row final-merge singleton cross
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dsir_two_scans_one_broadcast(spark):
    """DSIR selection: the bucket LUT builds in ONE conditional-agg
    pass (raw + target distributions together — a raw/tgt join would
    re-execute the corpus lineage), scoring is one broadcast join, and
    selection is distributed top-K. Exactly 2 corpus scans, no
    sort-merge join, no Python."""
    df = QUERIES["q_text_dsir_select"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("TakeOrderedAndProject") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_tar_shard_writer_single_exchange(spark):
    """Shard export: exactly ONE exchange (the shard-id co-location
    feeding applyInPandas) — text shuffles once, into its shard, and
    never again."""
    df = QUERIES["q_mm_tar_shards"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line
    )
    assert n_exchange == 1, plan
    assert "FlatMapGroupsInPandas" in plan


def test_full_curation_one_scan_three_record_exchanges(spark):
    """The showcase composite: ONE text scan builds the per-doc record;
    exact dedup, fingerprint dedup, language quota and token budget are
    record-level windows — exactly 3 exchanges (digest, fp, lang; the
    budget window reuses the quota's lang partitioning), no Python."""
    df = QUERIES["q_pipeline_full_curation"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    n_exchange = sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line
    )
    assert n_exchange == 3, plan
    assert "EvalPython" not in plan


def test_gopher_rules_scan_stage_only(spark):
    """All five Gopher rules are narrow expressions in the scan stage —
    no shuffle, no Python (the first-pass 100 TB filter shape)."""
    df = QUERIES["q_text_gopher_rules"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan


def test_gopher_repetition_three_exchanges_no_python(spark):
    """A1.2's shape: line/paragraph stats are scan-stage array
    expressions; the n-gram side is one (doc,n,gram) count exchange,
    one doc rollup, one doc-keyed join — 3 exchanges, zero Python, and
    the documents scan prunes to (doc_id, text)."""
    df = QUERIES["q_text_gopher_repetition"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan
    assert "EvalPython" not in plan and "InMemoryTableScan" not in plan
    scan = _scan_of(df, "documents")
    assert "lang" not in scan.split("ReadSchema:")[1]


def test_ccnet_cutoffs_window_runs_on_histogram_not_corpus(spark):
    """CCNet's bucket cutoffs must come from the (lang, ppl_q)
    HISTOGRAM window, never a corpus-sized per-language sort: the
    Window operator's child must contain the histogram aggregate."""
    df = QUERIES["q_corpus_ccnet_buckets"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert win, plan
    below_first_window = "\n".join(lines[win[0]:])
    # the histogram aggregate (count per (lang, ppl_q)) feeds the window
    assert "HashAggregate" in below_first_window, plan
    # and the cutoff join against the corpus-side broadcasts
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_wordpiece_encode_single_broadcast_join_on_corpus_side(spark):
    """WordPiece APPLY touches the corpus once: the (word -> n_parts)
    LUT joins broadcast; no corpus-sized sort-merge join anywhere."""
    df = QUERIES["q_text_wordpiece_encode"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bq_shortlist_joins_broadcast_no_smj(spark):
    """BQ ANN: the code-side shortlist and the float re-rank must both
    broadcast the query side — no SortMergeJoin anywhere; the corpus
    embedding scan is touched, codes are computed in-scan."""
    df = QUERIES["q_ann_bq_topk"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_paragraph_dedup_shuffles_hashes_only(spark):
    """CCNet paragraph dedup: every Exchange key set is the md5 hash or
    the doc id — the paragraph TEXT never shuffles (it is projected
    away before the first exchange)."""
    df = QUERIES["q_text_paragraph_dedup"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "ph#" in line or "doc_id#" in line, line
    # no exploded paragraph string survives into any exchange row:
    # the explode's output column feeds md5/length projections only
    assert "EvalPython" not in plan


def test_token_budget_sorts_boundary_bucket_only(spark):
    """The budget cut's ONLY sort+window must run over the boundary
    value-range bucket, never the corpus: the Window's subtree must be
    gated by the monotone bucket filter (FLOOR(LOG2(...)) = k) sitting
    directly on the documents scan (VERDICT r5 next-round #1 — the
    last corpus-sized serial stage in any registered query)."""
    df = QUERIES["q_corpus_token_budget"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert len(win) == 1, plan
    below = "\n".join(lines[win[0]:])
    # the bucket equality predicate gates everything under the window
    assert "FLOOR" in below and "LOG2" in below, plan
    assert "Filter" in below, plan


def test_zipf_profile_windows_over_frequency_histogram(spark):
    """zipf_profile must never rank the vocabulary: its only window
    runs over the (freq, n_types) HISTOGRAM — distinct-frequency-sized,
    O(sqrt corpus) by Zipf — so the Window's direct subtree must be the
    freq-keyed aggregate, not a token-level projection (VERDICT r5 #4)."""
    df = QUERIES["q_text_zipf_profile"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert len(win) == 1, plan
    below = "\n".join(lines[win[0]: win[0] + 8])
    assert "HashAggregate(keys=[freq" in below, below


def test_rfm_has_no_single_partition_window(spark):
    """RFM quartiles must come from the distributed exact-ntile (range
    repartition + closed-form tile), never three single-partition
    NTILE sorts over the customer frame (VERDICT r5 #5)."""
    df = QUERIES["q_customer_rfm"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrdered")[0].split("Sort [r")[0], plan


def test_revenue_milestones_has_no_single_partition_sort(spark):
    """The global running sum behind q_orders_revenue_milestones must
    be the range-partitioned prefix sum (per-pid window over the
    localCheckpointed layout), never a corpus-wide SinglePartition
    sort; the only Window allowed partitions by the pid (round 7)."""
    df = QUERIES["q_orders_revenue_milestones"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scalar total's 1-row SinglePartition exchange is fine; what
    # must NOT appear is a GLOBAL sort ("Sort [...], true" = requires
    # a total ordering exchange of the corpus). The layout's
    # sortWithinPartitions shows as "Sort [...], false" and the range
    # exchange as rangepartitioning.
    import re
    global_sorts = [ln for ln in plan.splitlines()
                    if re.search(r"\bSort \[.*\], true,", ln)
                    and "decile" not in ln]  # final <=10-row orderBy
    assert not global_sorts, plan
    assert "rangepartitioning" in plan, plan
    assert "Window" in plan and "shiftright" in plan.lower(), plan
