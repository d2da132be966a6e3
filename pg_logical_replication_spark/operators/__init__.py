"""Engine operators: CDC materialization + large-scale pipeline ops.

``apply_changes`` is the correctness kernel — everything the reference's
consumers do with the change stream (maintain a replica table) reduces to
it. The rest are the 100 TB-scale data-pipeline operators mandated by
BASELINE.json: dedup, similarity search, text analysis, as-of joins.
"""

from pg_logical_replication_spark.operators.apply_changes import (  # noqa: F401
    apply_changes,
    latest_image,
)
from pg_logical_replication_spark.operators.transactions import (  # noqa: F401
    assign_transactions,
    resolve_prepared,
    resolve_streamed,
    resolve_transactions,
)
from pg_logical_replication_spark.operators.dedup import (  # noqa: F401
    build_dedup_index,
    connected_components,
    connected_components_star,
    containment_pairs,
    dedup_new_against_index,
    exact_dedup,
    jaccard_pairs,
    minhash_candidate_pairs,
    simhash,
    simhash_pairs,
    soft_weight_expr,
    split_assign_expr,
    winnow_fingerprints,
)
from pg_logical_replication_spark.operators.similarity import (  # noqa: F401
    ann_signature_col,
    bq_hamming_topk,
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_bucketed,
    cosine_topk,
    ivf_cosine_topk,
    kmeans_assign,
    kmeans_centroids,
    lsh_cosine_topk,
    sq8_cosine_topk,
)
from pg_logical_replication_spark.operators.graph import pagerank  # noqa: F401
from pg_logical_replication_spark.operators.multimodal import (  # noqa: F401
    decode_png_features,
    decode_wav_features,
    g711_decode_features,
    image_ahash_dedup,
    image_dhash_pairs,
    synthesize_g711_assets,
    synthesize_png_assets,
    synthesize_wav_assets,
    wav_loudest_frame,
    wav_robust_fingerprint,
    wav_vad_segments,
)
from pg_logical_replication_spark.operators.text import (  # noqa: F401
    c4_filter,
    ccnet_perplexity_buckets,
    cdc_chunk_dedup_stats,
    char_entropy,
    content_defined_chunks,
    fim_transform,
    gopher_quality_filter,
    gopher_repetition_filter,
    nb_langid,
    paragraph_dedup_stats,
    temperature_sampling_weights,
    tokenizer_fertility,
    wordpiece_encode_stats,
    wordpiece_train_merges,
)
from pg_logical_replication_spark.operators.packing import pack_sequences  # noqa: F401
from pg_logical_replication_spark.operators.layout import (  # noqa: F401
    exact_ntile,
    global_row_number,
    global_running_sum,
    salted_equi_join,
    write_bucketed,
)
