"""hds_functions_spark — a PySpark-native analytics/curation engine.

Clean-room rebuild of the capability surface of ``bhfdschds/hds_functions``
(reference studied at /root/reference, never copied), re-expressed
Spark-first and extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, event-time joins).
"""

from .caching import release_operator_caches, tracked_persist
from .functions.dates import (
    convert_date_units_to_days,
    parse_date_instruction,
    validate_date_string,
)
from .operators.bpe import (
    bpe_encode_stats,
    bpe_train_merges,
    bpe_word_segmentation,
    word_frequency_table,
)
from .operators.cohort import (
    apply_inclusion_criteria,
    create_inclusion_columns,
    create_inclusion_flowchart,
    validate_cohort_columns,
    validate_inclusion_criteria,
)
from .operators.cleaning import (
    dedup_lines,
    filter_lines,
    normalize_unicode_nfc,
    scrub_pii,
    strip_markup,
)
from .operators.contamination import ngram_contamination
from .operators.dedup import (
    degree_distribution,
    ngram_containment_pairs,
    connected_components,
    dedup_clusters,
    duplicate_groups,
    duplicated_ngram_stats,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_pairs,
    minhash_pairs_incremental,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .operators.clustering import (
    choose_assign_method,
    cluster_near_pairs,
    kmeans_assign,
    kmeans_fit,
    kmeans_fit_assign,
    semantic_dedup,
)
from .operators.events import (
    active_user_stats,
    attribute_conversions,
    as_of_join,
    daily_count_anomalies,
    dedup_events_in_window,
    top_session_paths,
    top_types_per_window,
    rfm_scores,
    type_cooccurrence_pmi,
    densify_timeline,
    densify_timeline_calendar,
    interval_join,
    session_stats,
    sessionize,
    time_decayed_agg,
    transition_counts,
    tumbling_window_agg,
)
from .functions.layout import (
    bucket_by_quantiles,
    bucket_by_quantiles_desc,
    plan_compaction,
    morton_code,
    pruning_simulation,
    quantize_to_bins,
    zorder_column,
)
from .operators.graph import pagerank, triangle_count
from .operators.joins import salted_join
from .operators.linkage import (
    canonical_name_map,
    fuzzy_name_pairs,
)
from .operators.packing import (
    chunk_documents,
    pack_sequences,
    padding_waste_profile,
)
from .operators.quality import (
    join_key_audit,
    observe_metrics,
    referential_orphans,
)
from .operators.profiling import (
    bigram_logprob_scores,
    bpe_pair_counts,
    correlation_matrix,
    build_vocabulary,
    char_entropy_scores,
    oov_rate,
    group_quantiles,
    key_skew_profile,
    profile_columns,
    tf_idf_top_terms,
    zipf_fit,
)
from .operators.sampling import (
    temperature_weights,
    cap_per_group,
    deterministic_sample,
    hash_split,
    leakage_safe_split,
    mixture_sample,
    solve_mixture_cutoffs,
    split_bucket,
    stratified_sample,
    weighted_sample,
)
from .functions.sketches import (
    count_min_lookup,
    count_min_table,
    hll_distinct,
    kmv_distinct,
    kmv_hash,
)
from .operators.retrieval import (
    bm25_scores,
    bm25_topk,
    doc_postings,
    retrieval_decontam,
)
from .operators.similarity import (
    cosine_topk,
    embedding_centroids,
    ivf_cosine_topk,
    lsh_cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
    random_projection,
)
from .operators.multimodal import (
    ahash_duplicate_groups,
    audio_curation_signatures,
    audio_downmix,
    audio_phash,
    audio_signatures,
    attach_binary_payload,
    decode_image_features,
    image_ahash,
    image_ingest_verdicts,
    image_signatures,
    sample_video_frames,
    synthesize_media_payloads,
    video_frame_signatures,
)
from .operators.privacy import (
    l_diversity_violations,
    generalize_columns,
    k_anonymity_violations,
    redact_low_counts,
    round_counts_to_multiple,
    suppress_small_groups,
)
from .operators.topk import first_dense_rank, first_rank, first_row, select_top_rows
from .operators.wrangling import (
    pivot_counts,
    unpivot_columns,
    align_to_schema,
    clean_column_names,
    mad_outlier_flags,
    map_column_values,
    winsorize_columns,
)
from .sources.config_io import (
    create_dict_from_csv,
    read_csv_distributed,
    read_csv_file,
    read_json_file,
    read_jsonl_corpus,
    write_csv_file,
    write_json_file,
)
from .sources.environment import (
    find_project_folder,
    get_dbutils,
    get_spark_session,
    resolve_path,
)
from .sources import tables as _tables
from .sources.tables import (
    build_rollup,
    get_archive_versions,
    load_table,
    merge_rollup,
    save_archive_snapshot,
    save_table,
    scd2_collapse,
    table_diff,
    upsert_table,
    standardise_table,
)

# Per-dataset standardisers (standardise_deaths_table, ..., generated from
# the data-driven registry) — same public surface as the reference.
for _name in _tables.__all__:
    globals().setdefault(_name, getattr(_tables, _name))
del _name, _tables

__version__ = "0.1.0"
