import numpy as np
import pytest

from mercat2_tpu.engine.codec import (
    Codec,
    DNA_CODEC,
    PROTEIN_CODEC,
    alphabet_of,
    codec_for_bytes,
)


def test_dna_codec_is_2bit():
    assert DNA_CODEC.bits == 2
    assert DNA_CODEC.size == 4
    assert DNA_CODEC.sentinel == 4
    np.testing.assert_array_equal(DNA_CODEC.symbols, np.frombuffer(b"ACGT", np.uint8))


def test_protein_codec_covers_metric_alphabet():
    present = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWYXBZUOJ", np.uint8)
    assert PROTEIN_CODEC.covers(np.sort(present))


def test_encode_decode_roundtrip():
    data = np.frombuffer(b"GATTACA", np.uint8)
    codes = DNA_CODEC.encode(data)
    np.testing.assert_array_equal(DNA_CODEC.decode(codes), data)


def test_unknown_bytes_become_sentinel():
    data = np.frombuffer(b"ACGN", np.uint8)
    codes = DNA_CODEC.encode(data)
    assert codes[-1] == DNA_CODEC.sentinel


def test_codec_for_bytes_minimal_bits():
    data = np.frombuffer(b"ACGTACGT", np.uint8)
    c = codec_for_bytes(data)
    assert c.bits == 2 and c.size == 4
    data = np.frombuffer(b"ACGTN", np.uint8)
    c = codec_for_bytes(data)
    assert c.bits == 3 and c.size == 5


def test_codec_for_bytes_prefer_reused():
    data = np.frombuffer(b"ACG", np.uint8)
    c = codec_for_bytes(data, prefer=PROTEIN_CODEC)
    assert c is PROTEIN_CODEC


def test_codes_ascending_by_byte():
    # lexicographic invariant: code order == byte order
    data = np.frombuffer(b"zaZA019", np.uint8)
    c = codec_for_bytes(data)
    assert np.all(np.diff(c.symbols.astype(int)) > 0)


def test_words_for_k_tiebreak():
    assert DNA_CODEC.words_for_k(15) == 1  # 30 bits
    assert DNA_CODEC.words_for_k(16) == 2  # 32 bits exact -> tiebreak word
    assert DNA_CODEC.words_for_k(21) == 2  # 42 bits
    assert DNA_CODEC.words_for_k(31) == 2  # 62 bits
    assert DNA_CODEC.words_for_k(32) == 3  # 64 bits exact -> tiebreak
    assert PROTEIN_CODEC.words_for_k(3) == 1  # 15 bits


def test_alphabet_of():
    np.testing.assert_array_equal(
        alphabet_of(np.frombuffer(b"banana", np.uint8)),
        np.frombuffer(b"abn", np.uint8),
    )


def test_codec_validation():
    with pytest.raises(ValueError):
        Codec(np.frombuffer(b"CA", np.uint8), 2)  # not ascending
    with pytest.raises(ValueError):
        Codec(np.frombuffer(b"ACGT", np.uint8), 1)  # too few bits
