"""Chunker parity: delimiter mode, line mode, human2bytes, standalone CLI
(reference /root/reference/lib/mercat2_Chunker.py:14-159)."""

import gzip

import pytest

from mercat2_tpu.io.chunker import chunk_file, human2bytes, maybe_chunk


def _fasta(n_rec: int, seq_len: int = 240) -> bytes:
    out = []
    for i in range(n_rec):
        out.append(f">rec{i}\n".encode())
        out.append((b"ACGT" * (seq_len // 4)) + b"\n")
    return b"".join(out)


def _fastq(n_rec: int, seq_len: int = 80) -> bytes:
    out = []
    for i in range(n_rec):
        out.append(f"@read{i}\n".encode())
        out.append(b"A" * seq_len + b"\n+\n" + b"I" * seq_len + b"\n")
    return b"".join(out)


def test_human2bytes_grammar():
    assert human2bytes("0 B") == 0
    assert human2bytes("1 K") == 1024
    assert human2bytes("1 M") == 1 << 20
    assert human2bytes("1 Gi") == 1 << 30
    assert human2bytes("1 tera") == 1 << 40
    assert human2bytes("0.5kilo") == 512
    assert human2bytes("0.1  byte") == 0
    assert human2bytes("1 k") == 1024
    assert human2bytes("42") == 42
    assert human2bytes("1 Bi") == 1  # IEC byte unit, exp 0
    with pytest.raises(ValueError):
        human2bytes("12 foo")
    with pytest.raises(ValueError):
        human2bytes("foo")
    with pytest.raises(ValueError):
        human2bytes("1 m")  # case-sensitive like the reference
    with pytest.raises(ValueError):
        human2bytes("1 KILO")


def test_chunk_delim_preserves_records(tmp_path):
    src = tmp_path / "in.fna"
    data = _fasta(40)
    src.write_bytes(data)
    files = chunk_file(src, tmp_path / "chunks", 2048, ">")
    assert len(files) > 1
    # every chunk starts at a record boundary; concatenation == input
    cat = b""
    for f in files:
        body = f.read_bytes()
        assert body.startswith(b">")
        cat += body
    assert cat == data
    # reference naming: {stem}.%05d{inner_ext}
    assert files[0].name == "in.00000"


def test_chunk_lines_mode_fastq(tmp_path):
    src = tmp_path / "in.fastq"
    data = _fastq(30)
    src.write_bytes(data)
    files = chunk_file(src, tmp_path / "chunks", 1024, delim=None, lines=4)
    assert len(files) > 1
    cat = b""
    for f in files:
        body = f.read_bytes()
        # line mode breaks only at 4-line group starts -> records whole
        assert body.startswith(b"@read")
        assert body.count(b"\n") % 4 == 0
        cat += body
    assert cat == data


def test_chunk_gz_input_written_plain(tmp_path):
    src = tmp_path / "in.fna.gz"
    data = _fasta(10)
    with gzip.open(src, "wb") as f:
        f.write(data)
    files = chunk_file(src, tmp_path / "chunks", 1 << 30, ">")
    assert len(files) == 1
    assert files[0].name == "in.00000.fna"  # gz suffix dropped
    assert files[0].read_bytes() == data


def test_chunk_exactly_one_mode():
    with pytest.raises(ValueError):
        chunk_file("x", "y", 10, delim=None, lines=None)
    with pytest.raises(ValueError):
        chunk_file("x", "y", 10, delim=">", lines=4)


def test_maybe_chunk_size_gate(tmp_path):
    src = tmp_path / "small.fna"
    src.write_bytes(_fasta(5))
    name, files = maybe_chunk("small", src, 100, tmp_path / "chunks")
    assert files == [src]  # below the gate: untouched


def test_chunker_cli(tmp_path, capsys):
    from mercat2_tpu.io.chunker import _main

    src = tmp_path / "in.fastq"
    src.write_bytes(_fastq(30))
    rc = _main([str(src), str(tmp_path / "out"), "-c", "1K", "-l", "4"])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) > 1
