from mercat2_tpu.engine.codec import Codec, DNA_CODEC, PROTEIN_CODEC, codec_for_bytes
from mercat2_tpu.engine.counter import KmerCounter, count_file, count_files_merged

__all__ = [
    "Codec",
    "DNA_CODEC",
    "PROTEIN_CODEC",
    "codec_for_bytes",
    "KmerCounter",
    "count_file",
    "count_files_merged",
]
