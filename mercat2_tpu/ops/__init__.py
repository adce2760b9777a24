from mercat2_tpu.ops.kmer_pack import sorted_kmer_keys, pack_kmer_words, window_validity
from mercat2_tpu.ops.dense_hist import dense_kmer_histogram

__all__ = [
    "sorted_kmer_keys",
    "pack_kmer_words",
    "window_validity",
    "dense_kmer_histogram",
]
