"""Record-boundary file chunking (shard generator).

Equivalent of the reference's Chunker (/root/reference/lib/mercat2_Chunker.py:14-79):
splits a FASTA/FASTQ into ~chunk-size pieces, starting a new piece only at a
line containing the record delimiter so records stay contiguous. Chunk
naming matches the reference: ``{stem}.%05d{inner_ext}`` (gz suffix dropped,
chunks written as plain text).

Note the inherited semantic (documented at /root/reference/README.md:207 and
SURVEY.md §3.2): the min-count filter runs per chunk before merging, so
chunked samples can undercount low-abundance k-mers. The engine reproduces
this for parity; pass ``chunk_size=0`` to disable chunking entirely.
"""

from __future__ import annotations

import gzip
from pathlib import Path

__all__ = ["chunk_file", "maybe_chunk"]


def chunk_file(path, dest, chunk_bytes: int, delim: str = ">") -> list[Path]:
    """Split `path` into ~chunk_bytes pieces at `delim` boundaries."""
    path = Path(path)
    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    name = path.stem.split(".")[0]
    ext = "".join(path.suffixes[:-1])  # reference drops the last suffix
    delim_b = delim.encode()

    opener = gzip.open(path, "rb") if path.suffix == ".gz" else open(path, "rb")
    files: list[Path] = []
    i = 0
    out_path = dest / f"{name}.{i:05d}{ext}"
    files.append(out_path)
    out = open(out_path, "wb")
    written = 0
    with opener as inf:
        for line in inf:
            if delim_b in line and written >= chunk_bytes:
                out.close()
                i += 1
                out_path = dest / f"{name}.{i:05d}{ext}"
                files.append(out_path)
                out = open(out_path, "wb")
                written = 0
            out.write(line)
            written += len(line)
    out.close()
    return files


def maybe_chunk(name: str, filename, chunk_size_mb: int, outpath) -> tuple[str, list[Path]]:
    """Chunk only when the file is at least chunk_size_mb (reference
    semantics, /root/reference/bin/mercat2.py:101-105)."""
    filename = Path(filename)
    if chunk_size_mb > 0 and filename.stat().st_size >= chunk_size_mb * 1024 * 1024:
        chunks = chunk_file(filename, outpath, chunk_size_mb * 1024 * 1024)
        return name, sorted(chunks)
    return name, [filename]


def _main(argv=None) -> int:
    """Standalone CLI, mirroring the reference Chunker's own entry point
    (/root/reference/lib/mercat2_Chunker.py:142-159)."""
    import argparse

    p = argparse.ArgumentParser(prog="mercat2-tpu-chunker",
                                description="Split FASTA/FASTQ into chunks "
                                "at record boundaries")
    p.add_argument("file", help="input file (.gz ok)")
    p.add_argument("outdir", help="output directory")
    p.add_argument("-s", "--size-mb", type=int, default=100,
                   help="target chunk size in MB [100]")
    p.add_argument("-d", "--delim", default=">",
                   help="record delimiter ['>'; use '@' for FASTQ]")
    args = p.parse_args(argv)
    files = chunk_file(args.file, args.outdir,
                       args.size_mb * 1024 * 1024, args.delim)
    for f in files:
        print(f)
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
