from mercat2_tpu.report.tsv import write_counts_tsv, merge_tsv, merge_tsv_T

__all__ = ["write_counts_tsv", "merge_tsv", "merge_tsv_T"]
