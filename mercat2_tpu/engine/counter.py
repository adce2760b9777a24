"""Host-side orchestration of the TPU k-mer count engine.

Pipeline per input file (the reference's unit of work too — its per-chunk
min-count filter happens per *file*, /root/reference/lib/mercat2_kmers.py:73-76):

    parse FASTA -> sequence bytes + record ids      (mercat2_tpu.io.fasta)
    -> data-driven codec                             (engine.codec)
    -> separator-delimited, bucket-padded code stream
    -> device: pack + sort                           (ops.kmer_pack)
    -> host: run-length encode, min-count filter, decode to byte strings

The result is a :class:`KmerTable`: parallel arrays of k-mer byte strings
((M, k) uint8 matrix) and counts, already in lexicographic order — exactly
the order the reference writes TSVs in (/root/reference/bin/mercat2.py:132).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mercat2_tpu.engine.codec import Codec, codec_for_bytes
from mercat2_tpu.ops.kmer_pack import sorted_kmer_keys, key_words_for

__all__ = ["KmerTable", "KmerCounter", "count_file", "count_files_merged"]

#: Streams are padded up to one of these sizes to bound recompilations.
_MIN_BUCKET = 1 << 16

#: The device pack loop unrolls k iterations; beyond this we take an exact
#: host (numpy) path instead of compiling a pathological kernel.
_MAX_DEVICE_K = 128


def _bucket_size(n: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b <<= 1
    return b


@dataclasses.dataclass
class KmerTable:
    """Sorted (k-mer, count) table.

    kmers: uint8[M, k] — ASCII bytes of each k-mer, lexicographically sorted.
    counts: int64[M].
    """

    kmers: np.ndarray
    counts: np.ndarray

    @property
    def k(self) -> int:
        return int(self.kmers.shape[1]) if self.kmers.ndim == 2 else 0

    def __len__(self) -> int:
        return int(self.counts.shape[0])

    def kmer_strings(self) -> list[str]:
        k = self.k
        flat = self.kmers.tobytes()
        return [flat[i * k : (i + 1) * k].decode("latin-1") for i in range(len(self))]

    def to_dict(self) -> dict[str, int]:
        return dict(zip(self.kmer_strings(), (int(c) for c in self.counts)))

    @staticmethod
    def empty(k: int) -> "KmerTable":
        return KmerTable(np.zeros((0, k), np.uint8), np.zeros(0, np.int64))


def _decode_payload(words: np.ndarray, k: int, bits: int, codec: Codec) -> np.ndarray:
    """uint32[M, payload] big-endian packed keys -> uint8[M, k] ASCII bytes."""
    m, payload = words.shape
    mask = np.uint32((1 << bits) - 1)
    out = np.empty((m, k), dtype=np.uint8)
    for j in range(k):
        bitpos = bits * (k - 1 - j)  # from LSB of the whole payload
        col = payload - 1 - bitpos // 32
        off = bitpos % 32
        sym = words[:, col] >> np.uint32(off)
        spill = off + bits - 32
        if spill > 0:
            sym = sym | (
                (words[:, col - 1] & np.uint32((1 << spill) - 1))
                << np.uint32(32 - off)
            )
        out[:, j] = (sym & mask).astype(np.uint8)
    return codec.symbols[out]


def _rle(sorted_cols: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode parallel sorted columns -> (start_indices, counts)."""
    n = sorted_cols[0].shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for col in sorted_cols:
        np.logical_or(change[1:], col[1:] != col[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    return starts.astype(np.int64), counts.astype(np.int64)


def _drop_short_records(seq: np.ndarray, rec: np.ndarray, k: int):
    """Remove records shorter than k (they yield no windows). Keeps the
    separator overhead of the packed stream proportional to useful data."""
    if seq.shape[0] == 0 or k <= 1:
        return seq, rec
    # rec is non-decreasing; record boundaries are change points
    boundary = np.empty(rec.shape[0], dtype=bool)
    boundary[0] = True
    np.not_equal(rec[1:], rec[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    lens = np.diff(np.append(starts, rec.shape[0]))
    if lens.min() >= k:
        return seq, rec
    keep_rec = lens >= k
    keep = np.repeat(keep_rec, lens)
    return seq[keep], rec[keep]


def _count_host(seq: np.ndarray, rec: np.ndarray, k: int, min_count: int) -> KmerTable:
    """Exact host fallback for very large k (vectorized numpy)."""
    from numpy.lib.stride_tricks import sliding_window_view

    p = seq.shape[0] - k + 1
    windows = sliding_window_view(seq, k)
    valid = rec[: p] == rec[k - 1 :]
    rows = np.ascontiguousarray(windows[valid])
    if rows.shape[0] == 0:
        return KmerTable.empty(k)
    void = rows.view([("", np.uint8)] * k).ravel()
    uniq, counts = np.unique(void, return_counts=True)
    if min_count > 1:
        keepm = counts >= min_count
        uniq, counts = uniq[keepm], counts[keepm]
    kmers = uniq.view(np.uint8).reshape(-1, k)
    return KmerTable(kmers, counts.astype(np.int64))


class KmerCounter:
    """Reusable counter for a fixed (k, codec).

    Sharing one counter across the chunks of a sample keeps the codec (and
    therefore the compiled kernel) stable, so numeric keys from different
    chunks are directly comparable/mergeable.
    """

    def __init__(self, k: int, codec: Codec):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.codec = codec

    # -- stream building ---------------------------------------------------

    def build_stream(self, seq: np.ndarray, rec: np.ndarray) -> np.ndarray:
        """Sequence bytes + record ids -> padded uint8 code stream.

        Consecutive records are separated by k-1 sentinel codes so no window
        spans a record boundary; the tail is sentinel-padded to the bucket.
        """
        codes = self.codec.encode(seq)
        gap = self.k - 1
        n = codes.shape[0]
        if n == 0:
            total = 0
        elif gap == 0:
            total = n
            pos = None
        else:
            # rank of each byte's record among the records present
            rel = (rec - rec[0]).astype(np.int64)
            pos = np.arange(n, dtype=np.int64) + rel * gap
            total = int(pos[-1]) + 1
        padded = np.full(_bucket_size(max(total, self.k)), self.codec.sentinel, np.uint8)
        if n:
            if gap == 0:
                padded[:n] = codes
            else:
                padded[pos] = codes
        return padded

    # -- device + finalize -------------------------------------------------

    def count_stream(self, stream: np.ndarray, min_count: int = 1) -> KmerTable:
        words, n_valid = sorted_kmer_keys(
            jnp.asarray(stream), k=self.k, bits=self.codec.bits,
            alphabet_size=self.codec.size,
        )
        n_valid = int(n_valid)
        total_words, tiebreak = key_words_for(self.k, self.codec.bits)
        payload_words = total_words - int(tiebreak)
        cols = [np.asarray(w[:n_valid]) for w in words[:payload_words]]
        starts, counts = _rle(cols)
        if min_count > 1:
            keep = counts >= min_count
            starts, counts = starts[keep], counts[keep]
        if starts.size == 0:
            return KmerTable.empty(self.k)
        packed = np.stack([c[starts] for c in cols], axis=1)
        kmers = _decode_payload(packed, self.k, self.codec.bits, self.codec)
        return KmerTable(kmers, counts)

    def count(self, seq: np.ndarray, rec: np.ndarray, min_count: int = 1) -> KmerTable:
        seq, rec = _drop_short_records(seq, rec, self.k)
        if seq.shape[0] < self.k:
            return KmerTable.empty(self.k)
        if self.k > _MAX_DEVICE_K:
            return _count_host(seq, rec, self.k, min_count)
        return self.count_stream(self.build_stream(seq, rec), min_count)


def count_file(path, k: int, min_count: int = 1, codec: Codec | None = None) -> KmerTable:
    """Count k-mers of one FASTA file (text or .gz), min-count filtered.

    Matches the reference's ``find_kmers`` semantics
    (/root/reference/lib/mercat2_kmers.py:32-78): raw case-sensitive k-mers,
    ``*`` stripped, per-record windows, filter applied per file.
    """
    from mercat2_tpu.io.fasta import parse_fasta_seq

    seq, rec = parse_fasta_seq(path)
    codec = codec_for_bytes(seq, prefer=codec)
    return KmerCounter(k, codec).count(seq, rec, min_count)


def merge_tables(tables: list[KmerTable], k: int) -> KmerTable:
    """Sum counts of already-filtered per-file tables (driver-side reduce).

    Mirrors the reference's dict merge (/root/reference/bin/mercat2.py:121-127):
    the min-count filter has already been applied per file, so this is a
    plain sorted multiway sum.
    """
    tables = [t for t in tables if len(t)]
    if not tables:
        return KmerTable.empty(k)
    if len(tables) == 1:
        return tables[0]
    allk = np.concatenate([t.kmers for t in tables], axis=0)
    allc = np.concatenate([t.counts for t in tables], axis=0)
    # lexicographic sort of the byte rows: view as void records
    void = np.ascontiguousarray(allk).view([("", np.uint8)] * k).ravel()
    order = np.argsort(void, kind="stable")
    allk, allc = allk[order], allc[order]
    void = void[order]
    change = np.empty(len(void), dtype=bool)
    change[0] = True
    change[1:] = void[1:] != void[:-1]
    starts = np.flatnonzero(change)
    sums = np.add.reduceat(allc, starts)
    return KmerTable(allk[starts], sums.astype(np.int64))


def count_files_merged(paths, k: int, min_count: int = 1) -> KmerTable:
    """Count several files (chunks of one sample) and merge, reference-style."""
    tables = []
    codec = None
    for p in paths:
        from mercat2_tpu.io.fasta import parse_fasta_seq

        seq, rec = parse_fasta_seq(p)
        codec = codec_for_bytes(seq, prefer=codec)
        tables.append(KmerCounter(k, codec).count(seq, rec, min_count))
    return merge_tables(tables, k)
