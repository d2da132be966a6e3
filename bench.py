#!/usr/bin/env python3
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}. Each query is forced end-to-end with the noop
sink (full execution, no driver collect overhead). Session startup and a
warmup run are excluded — we measure query time, not JVM boot.
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q8_market_share",
    "q18_large_volume_customer",
    "q_window_topk",
    "q_sessionize",
    # CDC layer (decoder throughput is the reference's only perf signal)
    "q_cdc_wal2json_roundtrip",
    "q_cdc_test_decoding_roundtrip",
    "q_cdc_pgoutput_roundtrip",
    "q_cdc_streamed_txn",
    "q_cdc_two_phase",
    "q_cdc_apply_events",
    # LLM-pipeline ops
    "q_cdc_wire_demux",
    "q_graph_pagerank",
    "q_variant_extract",
    "q_dedup_minhash_bands",
    "q_dedup_jaccard_top",
    "q_dedup_simhash",
    "q_dedup_winnow",
    "q_ann_cosine_topk",
    "q_ann_ivf_topk",
    "q_embed_near_dup_bucketed",
    "q_cdc_pgoutput_jvm_encode",
    "q_join_bloom_prune",
    "q_doc_chunks",
    "q_text_quality",
    "q_pipeline_corpus_curation",
    # round-3/4 heavy additions (review r3 #8): real codecs, simhash
    # pair production, quantized ANN, timeseries, chunked decode
    "q_mm_png_decode",
    "q_mm_wav_decode",
    "q_mm_jpeg_decode",
    "q_dedup_simhash_pairs",
    "q_ann_sq8_topk",
    "q_events_ewma",
    "q_cdc_wal2json_chunked",
    "q_mm_flac_decode",
    "q_mm_webp_decode",
    "q_mm_gif_decode",
    "q_mm_tiff_decode",
    "q_mm_warc_records",
    "q_mm_adpcm_decode",
    "q_mm_bmp_decode",
    # data-trained corpus filters (late round 4)
    "q_text_lm_perplexity",
    "q_text_bpe_train",
    "q_text_bpe_encode",
    "q_text_dsir_select",
    "q_mm_tar_shards",
    "q_dedup_substr_coverage",
    "q_pipeline_full_curation",
    "q_text_gopher_rules",
    "q_web_crawl_plan",
    "q_sft_chat_render",
    # this session: the unigram tokenizer lifecycle (lattice-join EM)
    "q_text_unigram_train",
    "q_text_unigram_encode",
    # named corpus governance: Gopher A1.2 + CCNet buckets + WordPiece
    "q_text_gopher_repetition",
    "q_corpus_ccnet_buckets",
    "q_text_wordpiece_train",
    # trained lang-id, audio analysis, the tenth codec
    "q_text_nb_langid",
    "q_mm_wav_vad_segments",
    "q_mm_g711_decode",
    "q_ann_bq_topk",
    "q_text_c4_rules",
    "q_mm_image_ahash_dedup",
    "q_corpus_content_chunks",
    "q_events_cusum",
    "q_mm_ogg_probe",
    # round 5: k-means domain discovery + cluster-balanced sampling,
    # trained-quantizer IVF (kmeans centroids -> cell assignment)
    "q_embed_kmeans_domains",
    "q_embed_cluster_sample",
    "q_ann_ivf_trained_topk",
    # round 5: bootstrap/bulk-load COPY codec + the full flow
    "q_cdc_copy_text_roundtrip",
    "q_cdc_bootstrap_apply",
    "q_dedup_bloom_decontam",
    # round 6: the two-pass budget cut (boundary-bucket-only sort),
    # the segment-parallel txn framing, the incremental near-dup gate
    "q_corpus_token_budget",
    "q_cdc_txn_frames_partitioned",
    "q_dedup_incremental_near",
    # round 7: the exact distributed prefix sum as a user query
    "q_orders_revenue_milestones",
    # round 7 (cont.): zero-shuffle entropy gate, leakage-free split,
    # SoftDeDup reweighting
    "q_text_char_entropy",
    "q_corpus_leakage_split",
    "q_dedup_soft_weights",
    "q_corpus_fim_transform",
    "q_mm_audio_fingerprint",
    # round 8: one-scan filter-threshold calibration, key-skew census,
    # multi-origin conflict detection
    "q_text_quality_pr_sweep",
    "q_diag_key_skew",
    "q_cdc_update_conflicts",
    "q_events_watermark_lateness",
    "q_text_mojibake",
    "q_cdc_slot_retention",
    "q_embed_mmr_select",
    "q_ann_recall_curve",
    "q_dedup_lsh_band_curve",
    "q_corpus_pack_efficiency",
    "q_dedup_source_overlap",
    "q_text_burstiness",
    "q_dedup_substr_removal",
    "q_pipeline_dedup_funnel",
    "q_diag_join_advisor",
    "q_embed_drift",
    # round 9: schema evolution through materialization + the
    # schema-change log (Debezium schema-topic shape)
    "q_cdc_apply_schema_evolution",
    "q_cdc_schema_change_log",
    "q_cdc_apply_type_widening",
    "q_pipeline_forget",
    "q_corpus_curriculum",
    "q_embed_shortlist_mmr",
    # round 10: per-table isolation of the evolution fold; evolution
    # from wal2json's typmod'd per-row signatures
    "q_cdc_apply_multi_evolution",
    "q_cdc_evolve_wal2json",
    # round 10 (cont.): per-key net-effect batch squash (one
    # min_by/max_by key aggregation, the pre-MERGE compaction)
    "q_cdc_net_changes",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from pg_logical_replication_spark.plans import QUERIES
    from pg_logical_replication_spark.session import get_spark

    spark = get_spark(app_name="plrs-bench", cpus=cpus, shuffle_partitions=cpus)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # warmup: JIT + codegen + parquet footer caches
    QUERIES["q1_pricing_summary"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Per query: one untimed warm-up (driver-side plan compilation,
    # ~0.5-1 s one-off — not the steady-state cost a deployment pays),
    # then MEDIAN of 5 timed runs. r1→r2 showed ±23% swings on
    # sub-second queries under the container's bursty background load;
    # the median is robust to those transients where min-of-N hides
    # genuine regressions and a mean amplifies outliers. Spread
    # (min/max over the 5) is emitted per query so noise is
    # distinguishable from real movement across rounds.
    # default 3 since HEADLINE grew 28 -> 68 entries over round 4: a
    # 5-rep sweep at sf0.1 is ~55 min wall; median-of-3 with the
    # min/max spread keeps regressions visible at ~60% of the cost
    # (the "reps" field records which was used)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    per_query: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    # Sweep window provenance (VERDICT r9 #2): the envelope gate below
    # brackets only the decode/visibility legs, so a tenancy burst
    # DURING the query sweep could still print a phantom 2x regression
    # on unchanged code (r9: q_mm_jpeg_decode 0.97->2.01 in the driver
    # window, 1.58 quiet). The single-thread calibration kernel runs at
    # sweep start, every SWEEP_CAL_EVERY queries, and at sweep end;
    # each query's window scale = max of its two bracketing
    # checkpoints. Checkpoints ride stdout (small); per-query window
    # stamps go to the committed local artifact. A cross-record reader
    # adjudicates a swing by that query's window scale — no second
    # record needed.
    cal_every = int(os.environ.get("SPARK_GRAFT_SWEEP_CAL_EVERY", "20"))
    sweep_checkpoints: list[dict] = [
        {"after_query_idx": -1, "cpu_scale": _calibration()["cpu_scale"]}
    ]
    for qi, name in enumerate(HEADLINE):
        run = lambda: QUERIES[name].builder(spark, sf_dir).write.format(  # noqa: E731
            "noop"
        ).mode("overwrite").save()
        # Dead-copy valve (round 10): a builder whose persist lineage
        # contains a Python closure (mapInPandas encode) never matches
        # the previous run's canonicalized plan, so every rep creates
        # NEW cache entries and the old ones sit dead — warmup+3 reps
        # piled 8 copies for the evolution queries and the adjacent
        # tail cluster measured 1.4-1.6x slower from eviction pressure
        # alone (8g driver). Detected by cache-entry growth: a piling
        # query gets a clearCache after every run (each rep re-
        # materializes anyway — identical per-rep conditions), while a
        # plan-matching query keeps its stable entry and the
        # rep-reuses-warmup-cache semantics every prior round measured.
        def _n_cached() -> int:
            return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

        run()  # warm-up, untimed
        last_cached = _n_cached()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
            now_cached = _n_cached()
            if now_cached > last_cached:
                spark.catalog.clearCache()
                now_cached = 0
            last_cached = now_cached
        times.sort()
        per_query[name] = round(times[len(times) // 2], 3)
        spread[name] = [round(times[0], 3), round(times[-1], 3)]
        # nothing survives into the next query either way
        spark.catalog.clearCache()
        if (qi + 1) % cal_every == 0 and qi + 1 < len(HEADLINE):
            sweep_checkpoints.append(
                {"after_query_idx": qi,
                 "cpu_scale": _calibration()["cpu_scale"]}
            )
    sweep_checkpoints.append(
        {"after_query_idx": len(HEADLINE) - 1,
         "cpu_scale": _calibration()["cpu_scale"]}
    )
    # per-query window: the worse of the two checkpoints bracketing it
    query_window: dict[str, float] = {}
    bounds = [c["after_query_idx"] for c in sweep_checkpoints]
    import bisect as _bisect

    for qi, name in enumerate(HEADLINE):
        j = _bisect.bisect_left(bounds, qi)
        query_window[name] = round(
            max(sweep_checkpoints[j - 1]["cpu_scale"],
                sweep_checkpoints[j]["cpu_scale"]), 4
        )
    scales = [c["cpu_scale"] for c in sweep_checkpoints]
    sweep_envelope = {
        "cal_every": cal_every,
        "checkpoints": sweep_checkpoints,
        "max_cpu_scale": round(max(scales), 4),
        "min_cpu_scale": round(min(scales), 4),
        # True when EVERY query ran inside a verified-quiet window
        "all_quiet": max(scales) <= _ENVELOPE_QUIET_SCALE,
    }

    decode_tp, latency, calibration, envelope = _envelope_legs(spark, cpus)
    # decode throughput inflated back to quiet-host terms: the signal
    # whose 337k→124k tenancy swing motivated the calibration
    decode_tp["msgs_per_sec_normalized"] = round(
        decode_tp["msgs_per_sec"] * calibration["cpu_scale"]
    )

    # stdout line: headline numbers + per-query MEDIANS only. The
    # driver's BENCH_r{N}.json has truncated captures of this line
    # three times (r4 lost 19 core-query medians; r5 and r9's tails
    # survived only in the local artifact) — so the line is kept LEAN
    # (VERDICT r10 #8): medians to 2 dp, no spread/min-max, no
    # per-checkpoint sweep detail (all of those go to the committed
    # local artifact below at full precision). `stdout_result` builds
    # the payload so the freeze gate can measure a worst-case line
    # against the live HEADLINE.
    total = round(sum(per_query.values()), 3)
    result = stdout_result(
        total, per_query, reps, sf, decode_tp, latency, calibration,
        envelope, sweep_envelope,
    )
    print(json.dumps(result))

    # Persist the full record (incl. spread) as a committable artifact.
    # Label: explicit > timestamp — inferring the round from
    # max(CORRECTNESS_r*)+1 mislabeled the same run r05 or r06 depending
    # on whether the round's correctness artifact had landed (ADVICE r5).
    try:
        import sys

        label = os.environ.get("SPARK_GRAFT_BENCH_LABEL")
        if not label:
            label = time.strftime("%Y%m%dT%H%M%S")
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_local_{label}.json",
        )
        with open(out, "w") as f:
            json.dump(
                {
                    **result,
                    # full precision + full sweep detail live here, not
                    # on the lean stdout line
                    "queries": per_query,
                    "sweep_envelope": sweep_envelope,
                    "spread": spread,
                    "query_window": query_window,
                },
                f, indent=1, sort_keys=True,
            )
        print(f"# full record written to {out}", file=sys.stderr)
    except Exception as e:  # the stdout contract must never break
        print(f"# local artifact write failed: {e}", file=sys.stderr)


def stdout_result(
    total, per_query, reps, sf, decode_tp, latency, calibration,
    envelope, sweep_envelope,
) -> dict:
    """The one-line stdout payload (the driver's capture). Lean by
    contract — 2 dp medians, sweep checkpoints elided — because the
    driver's capture has truncated long lines in three prior rounds;
    the committed local artifact carries everything at full precision.
    The freeze gate (scripts/freeze_check.py) measures a worst-case
    line built from the live HEADLINE through this same function."""
    return {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in per_query.items()},
        "reps": reps,
        "sf": sf,
        "pgoutput_decode_500k": decode_tp,
        "e2e_visibility_ms": latency,
        "calibration": calibration,
        "envelope": envelope,
        "sweep_envelope": {
            k: v for k, v in sweep_envelope.items() if k != "checkpoints"
        },
        # headline total deflated by the host-speed scale: comparable
        # across rounds even when container tenancy shifts (VERDICT r7
        # #2 — decode throughput swung 337k→124k msg/s on one commit)
        "value_normalized": round(total / calibration["cpu_scale"], 3),
    }


def stdout_line_budget() -> tuple[int, int]:
    """(worst-case stdout line length for the live HEADLINE, budget).
    Representative worst-case widths: three-digit medians at 2 dp,
    full-width envelope numbers. The budget keeps the line well under
    the driver capture sizes that truncated r4/r5/r9 records even at
    120+ headline entries."""
    import json as _json

    line = _json.dumps(stdout_result(
        total=999.999,
        per_query={n: 999.99 for n in HEADLINE},
        reps=3,
        sf=0.1,
        decode_tp={
            "messages": 500000, "sec": 999.999, "msgs_per_sec": 9999999,
            "baseline_msgs_per_sec": 5000,
            "msgs_per_sec_normalized": 9999999,
        },
        latency={"changes": 100, "ms": 99999,
                 "reference_envelope_ms": [500, 1000]},
        calibration={
            "py_decode_sec": 99.9999, "np_sort_sec": 99.9999,
            "ref_py_decode_sec": _CAL_REF_PY_DECODE_SEC,
            "ref_np_sort_sec": _CAL_REF_NP_SORT_SEC,
            "cpu_scale": 9.9999,
        },
        envelope={
            "quiet_scale_threshold": _ENVELOPE_QUIET_SCALE,
            "attempts": 3,
            "cpu_scale_windows": [9.9999, 9.9999, 9.9999],
            "cpu_scale_window": 9.9999, "tenancy_voided": False,
        },
        sweep_envelope={
            "cal_every": 20, "checkpoints": [],
            "max_cpu_scale": 9.9999, "min_cpu_scale": 9.9999,
            "all_quiet": False,
        },
    ))
    return len(line), 4800


# Quiet-host reference times for the calibration kernels, pinned from
# the best-of-many measurement on the round-8 build host (2026-08-16,
# minimum across repeated trials — noise only ADDS time, so the min
# approximates the unloaded host). All future rounds normalize against
# these constants; re-pinning them would silently re-base the series.
_CAL_REF_PY_DECODE_SEC = 0.65
_CAL_REF_NP_SORT_SEC = 0.67


def _calibration() -> dict:
    """Fixed single-thread CPU calibration (VERDICT r7 #2): cross-round
    BENCH ratios were noise-limited by container tenancy (the same
    commit measured 337k→124k msg/s decode within one session). Two
    kernels whose work is CONSTANT by construction — no Spark, no I/O,
    one thread:

    - py_decode: 60,000 pure-Python pgoutput message parses (the exact
      CPython byte-twiddling profile of the decode hot path);
    - np_sort: 4 × (sort + cumsum) over the same seeded 8M-float array
      (the Arrow/numpy vectorized profile; np.sort is single-threaded,
      unlike BLAS matmul which would measure thread scheduling).

    ``cpu_scale`` = measured / pinned quiet-host reference (geometric
    mean of the two kernels): 1.0 on a quiet host, >1 under tenancy
    load. Headline totals are reported raw AND divided by cpu_scale, so
    a plan regression is distinguishable from a noisy-neighbor round.
    min-of-5 per kernel — load only inflates, never deflates."""
    import numpy as np

    from pg_logical_replication_spark.sources import pgoutput_format as fmt

    rel = fmt.encode_relation(
        16385,
        "public",
        "huge_transaction",
        [(f"col{j:02d}", 25) for j in range(20)],
        key_columns=["col00"],
    )
    cache: dict = {}
    fmt.parse_message(rel, cache)
    msgs = [
        fmt.encode_insert(16385, [("t", f"v{i}_{j}") for j in range(20)])
        for i in range(2000)
    ]

    def py_kernel() -> float:
        t0 = time.perf_counter()
        for _ in range(30):
            for m in msgs:
                fmt.parse_message(m, cache)
        return time.perf_counter() - t0

    rng = np.random.default_rng(42)
    arr = rng.random(8_000_000)

    def np_kernel() -> float:
        t0 = time.perf_counter()
        for _ in range(4):
            b = np.sort(arr)
            float(np.cumsum(b)[-1])
        return time.perf_counter() - t0

    py = min(py_kernel() for _ in range(5))
    nps = min(np_kernel() for _ in range(5))
    scale = ((py / _CAL_REF_PY_DECODE_SEC) * (nps / _CAL_REF_NP_SORT_SEC)) ** 0.5
    return {
        "py_decode_sec": round(py, 4),
        "np_sort_sec": round(nps, 4),
        "ref_py_decode_sec": _CAL_REF_PY_DECODE_SEC,
        "ref_np_sort_sec": _CAL_REF_NP_SORT_SEC,
        "cpu_scale": round(scale, 4),
    }


# a window whose single-thread kernels run within 5% of the pinned
# quiet-host reference counts as quiet; round-8's committed freeze
# record shipped a 1087 ms visibility from a cpu_scale-1.14 window
_ENVELOPE_QUIET_SCALE = 1.05


def _envelope_legs(spark, cpus: int) -> tuple[dict, dict, dict, dict]:
    """The two reference-comparable envelope metrics (decode throughput,
    e2e visibility) measured inside a VERIFIED-QUIET window (VERDICT r8
    #4): the calibration kernel runs before AND after the legs, and the
    worse of the two scales is the window's tenancy bound. A noisy
    window retries the whole block (bounded); if no quiet window
    appears, the record is annotated machine-readably
    (``tenancy_voided: true``) so a driver comparing against
    BASELINE.md's 500-1000 ms envelope never reads a noisy number as a
    regression. Returns (decode_tp, latency, calibration, envelope);
    ``calibration`` is the accepted attempt's post-leg measurement (the
    one closest in time to the headline normalization's consumers)."""
    max_tries = int(os.environ.get("SPARK_GRAFT_ENVELOPE_RETRIES", "3"))
    windows: list[float] = []
    for attempt in range(1, max_tries + 1):
        pre = _calibration()
        decode_tp = _pgoutput_decode_throughput(spark, cpus)
        latency = _e2e_visibility_latency(spark)
        post = _calibration()
        window = max(pre["cpu_scale"], post["cpu_scale"])
        windows.append(round(window, 4))
        if window <= _ENVELOPE_QUIET_SCALE:
            break
    envelope = {
        "quiet_scale_threshold": _ENVELOPE_QUIET_SCALE,
        "attempts": len(windows),
        "cpu_scale_windows": windows,
        "cpu_scale_window": windows[-1],
        "tenancy_voided": windows[-1] > _ENVELOPE_QUIET_SCALE,
    }
    return decode_tp, latency, post, envelope


def _pgoutput_decode_throughput(spark, cpus: int) -> dict:
    """BASELINE.md's only reference-side throughput signal, reproduced:
    500,000 pgoutput row messages with 20 text columns (the huge_
    transaction workload, reference decoder-pgoutput.spec.ts:324-373 /
    11-fill-data.sh:38) decoded end-to-end. Reference: <100 s ⇒ ~5,000
    msg/s on one replication connection. Encode/setup is untimed — the
    reference's timer also starts after the data exists in PG."""
    import tempfile
    import time

    from pg_logical_replication_spark.sources import pgoutput_format as fmt
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    n = int(os.environ.get("SPARK_GRAFT_DECODE_MSGS", "500000"))
    rel = fmt.encode_relation(
        16385,
        "public",
        "huge_transaction",
        [(f"col{j:02d}", 25) for j in range(20)],
        key_columns=["col00"],
    )

    def make(_idx, it):
        for i in it:
            yield (
                f"0/{16 + 8 * i:X}",
                i,
                fmt.encode_insert(16385, [("t", f"v{i}_{j}") for j in range(20)]),
            )

    rdd = spark.sparkContext.parallelize(range(n), cpus).mapPartitionsWithIndex(make)
    raw = spark.createDataFrame(rdd, "lsn string, seq long, data binary")
    d = tempfile.mkdtemp(prefix="plrs_decode_tp_")
    raw.write.mode("overwrite").parquet(d)

    raw2 = spark.read.parquet(d)
    cache: dict = {}
    fmt.parse_message(rel, cache)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decode_pgoutput(raw2, relations=cache).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return {
        "messages": n,
        "sec": round(best, 3),
        "msgs_per_sec": round(n / best),
        "baseline_msgs_per_sec": 5000,
    }


def _e2e_visibility_latency(spark) -> dict:
    """BASELINE.md's latency envelope, reproduced: the reference asserts
    changes visible to the consumer within 500-1000 ms of COMMIT (sleep
    bounds in every decoder spec), measured with the replication
    connection already open. Steady-state analogue: a continuously
    running subscribe is draining the log; each round appends 100
    committed wal2json changes and waits until the service has delivered
    and acknowledged their last LSN (≙ the reference's consumer-callback
    visibility; the MOR sink has also durably applied the batch by then).
    Append→delivered wall time, best of 3."""
    import json as _json
    import tempfile
    import time

    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable
    from pg_logical_replication_spark.streaming.service import (
        LogicalReplicationService,
    )

    root = tempfile.mkdtemp(prefix="plrs_lat_")
    log = os.path.join(root, "log")
    os.makedirs(log)
    svc = LogicalReplicationService(spark, log, os.path.join(root, "ckpt"))
    tbl = MergeOnReadTable(
        spark, os.path.join(root, "tbl"), key_columns=["id"], table="t"
    )
    q = svc.subscribe("wal2json", "lat", tbl.writer(), available_now=False)
    try:
        best = float("inf")
        total = 0
        for batch in range(4):  # first round absorbs query warmup, untimed
            t0 = time.perf_counter()
            with open(os.path.join(log, f"{batch:03d}.jsonl"), "w") as f:
                for i in range(100):
                    rid = batch * 100 + i
                    f.write(_json.dumps({
                        "change": [{
                            "kind": "insert", "schema": "public", "table": "t",
                            "columnnames": ["id", "v"],
                            "columntypes": ["bigint", "text"],
                            "columnvalues": [rid, f"v{rid}"],
                        }],
                        "nextlsn": f"0/{16 + 8 * rid:X}",
                    }) + "\n")
            total += 100
            # visibility ≙ the reference's consumer callback having fired
            # (its specs assert handler delivery after a bounded sleep,
            # not a table read): wait until the service has delivered +
            # acknowledged the batch's last LSN
            last = f"0/{16 + 8 * (total - 1):X}".upper()
            want = int(last.split("/")[1], 16)
            while True:
                got = svc.last_lsn("lat")
                if got is not None and int(got.split("/")[1], 16) >= want:
                    break
                time.sleep(0.005)
            dt = time.perf_counter() - t0
            if batch > 0:
                best = min(best, dt)
    finally:
        q.stop()
    return {
        "changes": 100,
        "ms": round(best * 1000),
        "reference_envelope_ms": [500, 1000],
    }


if __name__ == "__main__":
    main()
