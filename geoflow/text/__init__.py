from .analysis import (bpe_token_count_batch, detect_language,
                       document_frequency, top_df_tokens,
                       fingerprint_batch, langid_batch, quality_batch,
                       normalize_text_batch, repetition_batch,
                       token_count_batch, url_host_batch)
from .decontaminate import (contaminated_keys, decontaminate,
                            token_ngram_hashes)
from .dedup import (CharMinHasher, MinHasher, SimHasher,
                    add_content_hash, exact_dedup, hamming_distance,
                    lsh_band_pairs, lsh_cluster_labels, lsh_loser_keys,
                    ngram_jaccard)
from .chunking import chunk_batch, chunk_documents
from .htmltext import html_to_text, html_to_text_batch
from .incremental import (append_content_index, build_content_index,
                          dedup_against_index)
from .linededup import (common_line_hashes, line_dedup,
                        strip_common_lines)
from .lm import lm_score, lm_score_batch, train_bigram_lm
from .packing import pack_sequences
from .pii import pii_scrub_batch, scrub_pii
from .c4 import c4_clean, c4_clean_table
from .dsir import dsir_resample, dsir_weights, feature_counts
from .search import keyword_match_batch, keyword_search
from .substrdedup import (duplicated_window_hashes, strip_dup_windows,
                          strip_dup_windows_text_table, substr_dedup,
                          window_hash_partials)
from .urls import canon_url_batch, url_dedup

__all__ = ["CharMinHasher", "bpe_token_count_batch", "detect_language",
           "fingerprint_batch", "langid_batch", "repetition_batch",
           "normalize_text_batch", "quality_batch",
           "token_count_batch", "url_host_batch",
           "MinHasher", "SimHasher",
           "add_content_hash", "exact_dedup", "hamming_distance",
           "lsh_band_pairs", "lsh_cluster_labels", "lsh_loser_keys",
           "ngram_jaccard",
           "contaminated_keys", "decontaminate", "token_ngram_hashes",
           "pack_sequences", "common_line_hashes", "line_dedup",
           "strip_common_lines", "canon_url_batch", "url_dedup",
           "chunk_batch", "chunk_documents", "append_content_index",
           "build_content_index", "dedup_against_index",
           "document_frequency", "top_df_tokens", "pii_scrub_batch",
           "scrub_pii", "lm_score", "lm_score_batch",
           "train_bigram_lm", "html_to_text", "html_to_text_batch",
           "duplicated_window_hashes", "strip_dup_windows",
           "substr_dedup", "strip_dup_windows_text_table",
           "window_hash_partials", "keyword_match_batch",
           "keyword_search", "c4_clean", "c4_clean_table",
           "dsir_resample", "dsir_weights", "feature_counts"]
