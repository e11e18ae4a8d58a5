from pidb_rdf_spark.operators.curation import (
    corpus_diff,
    hash_sample,
    leakage_free_split,
    pack_token_stream,
    quantile_band_filter,
    stratified_hash_sample,
    weighted_sample,
)
from pidb_rdf_spark.operators.layout import zorder_key, zorder_layout
from pidb_rdf_spark.operators.mixing import (
    deterministic_shuffle,
    mix_sources,
    mixture_rates,
)
from pidb_rdf_spark.operators.profile import (
    check_constraints,
    profile_diff,
    profile_table,
)
from pidb_rdf_spark.operators.decontam import (
    contaminated_ids,
    ngram_overlap,
    semantic_overlap,
)
from pidb_rdf_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_query_index,
    save_minhash_index,
    ngram_jaccard_pairs,
    semantic_dedup,
    semantic_dup_pairs,
    semantic_query_index,
    save_simhash_index,
    simhash_pairs,
    simhash_query_index,
)
from pidb_rdf_spark.operators.join import salted_join
from pidb_rdf_spark.operators.lm import unigram_model, unigram_quality
from pidb_rdf_spark.operators.membership import (
    bloom_build,
    bloom_fp_rate,
    bloom_probe,
)
from pidb_rdf_spark.operators.multimodal import (
    attach_media,
    decode_media,
    decode_png,
    png_decode,
    probe_media_headers,
    sample_frames,
)
from pidb_rdf_spark.operators.quantize import (
    dequantize_embeddings,
    ivfpq_topk,
    pq_encode,
    pq_reconstruct,
    pq_topk,
    pq_train,
    quantize_embeddings,
)
from pidb_rdf_spark.operators.ranking import bm25_search, tfidf_top_terms
from pidb_rdf_spark.operators.scrub import chunk_documents, pii_scrub
from pidb_rdf_spark.operators.semistructured import (
    json_extract_fields,
    json_kv_explode,
)
from pidb_rdf_spark.operators.sketch import (
    approx_distinct,
    heavy_hitters,
    kmv_distinct,
)
from pidb_rdf_spark.operators.winnow import (
    substring_dup_pairs,
    winnow_fingerprints,
)
from pidb_rdf_spark.operators.similarity import (
    assign_clusters,
    cosine_topk,
    ivf_search,
    ivf_search_indexed,
    kmeans_centroids,
    load_ivf_index,
    save_ivf_index,
)
from pidb_rdf_spark.operators.text import (
    boilerplate_lines,
    fingerprint,
    gopher_quality,
    language_id,
    line_dedup_global,
    quality_score,
    repetition_signals,
    strip_boilerplate,
    token_count,
)
from pidb_rdf_spark.operators.window import topk_per_group

__all__ = [
    "check_constraints",
    "corpus_diff",
    "deterministic_shuffle",
    "hash_sample",
    "leakage_free_split",
    "mix_sources",
    "mixture_rates",
    "profile_diff",
    "profile_table",
    "zorder_key",
    "zorder_layout",
    "stratified_hash_sample",
    "weighted_sample",
    "chunk_documents",
    "pii_scrub",
    "pack_token_stream",
    "quantile_band_filter",
    "topk_per_group",
    "salted_join",
    "bloom_build",
    "bloom_probe",
    "bloom_fp_rate",
    "unigram_model",
    "unigram_quality",
    "ngram_overlap",
    "semantic_overlap",
    "contaminated_ids",
    "exact_dedup",
    "minhash_lsh_dedup",
    "save_minhash_index",
    "minhash_query_index",
    "ngram_jaccard_pairs",
    "save_simhash_index",
    "simhash_pairs",
    "simhash_query_index",
    "embedding_near_dup_pairs",
    "semantic_dedup",
    "semantic_dup_pairs",
    "semantic_query_index",
    "cosine_topk",
    "quantize_embeddings",
    "dequantize_embeddings",
    "pq_train",
    "pq_encode",
    "ivfpq_topk",
    "pq_reconstruct",
    "pq_topk",
    "bm25_search",
    "tfidf_top_terms",
    "json_extract_fields",
    "json_kv_explode",
    "approx_distinct",
    "heavy_hitters",
    "kmv_distinct",
    "winnow_fingerprints",
    "substring_dup_pairs",
    "assign_clusters",
    "ivf_search",
    "ivf_search_indexed",
    "save_ivf_index",
    "load_ivf_index",
    "kmeans_centroids",
    "attach_media",
    "decode_media",
    "decode_png",
    "png_decode",
    "probe_media_headers",
    "sample_frames",
    "fingerprint",
    "language_id",
    "quality_score",
    "repetition_signals",
    "boilerplate_lines",
    "strip_boilerplate",
    "gopher_quality",
    "line_dedup_global",
    "token_count",
]
