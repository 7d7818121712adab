"""CCITT T.4/T.6 fax codec unit tests (fax.py + the tiff.py fax path).

External conformance (JDK-encoded fixtures decoding bit-exactly) lives
in test_conformance.py; this file covers the repo-side machinery:
round trips across all three compressions, strip splitting, the 2D
mode words, error paths, and the pinned cross-checked streams.
"""

from __future__ import annotations

import pytest

from pipelinejobs_indexer_spark.llm.fax import (
    _BLACK_CODES,
    _EXT_MAKEUP,
    _WHITE_CODES,
    decode_fax,
    encode_g3,
    encode_g4,
    encode_mh,
)
from pipelinejobs_indexer_spark.llm.tiff import decode_tiff, write_tiff


def _lcg_rows(w: int, h: int, seed: int = 7) -> list[list[int]]:
    rows = []
    s = seed
    for _ in range(h):
        row = []
        run = 0
        v = 0
        for _x in range(w):
            if run == 0:
                s = (s * 1103515245 + 12345) & 0x7FFFFFFF
                run = 1 + s % 37
                v ^= 1
            row.append(v)
            run -= 1
        rows.append(row)
    return rows


STRIPES = [[(x + y) % 2 for x in range(61)] for y in range(7)]
LONGRUNS = [
    [0] * 700 + [1] * 900 + [0] * 128,  # crosses several makeup bands
    [1] * 1728,
    [0] * 1728,
    [1] * 63 + [0] * 64 + [1] * 65 + [0] * 1536,
]


def _via_tiff(rows, compression, **kw):
    data = write_tiff(rows, compression=compression, **kw)
    _h, _w, _nc, px = decode_tiff(data)
    # photometric 0 output: white -> 255, black -> 0
    return [[0 if v == 255 else 1 for v in row] for row in px]


@pytest.mark.parametrize("compression", [2, 3, 4])
def test_round_trip_patterns(compression):
    for rows in (_lcg_rows(101, 13), STRIPES, LONGRUNS,
                 [[0]], [[1]], [[1, 0]], [[0] * 9], [[1] * 9]):
        assert _via_tiff(rows, compression) == rows


def test_round_trip_g3_two_dimensional():
    rows = _lcg_rows(97, 17, seed=23)
    assert _via_tiff(rows, 3, t4_two_d=True) == rows


def test_round_trip_multi_strip():
    rows = _lcg_rows(83, 12, seed=5)
    for compression in (2, 3, 4):
        got = _via_tiff(rows, compression, rows_per_strip=5)
        assert got == rows


def test_extended_makeups_chain():
    """Runs past 2560 need chained makeup codes in both directions."""
    rows = [[0] * 6000 + [1] * 3000 + [0] * 100]
    for compression in (2, 4):
        assert _via_tiff(rows, compression) == rows


def test_tables_are_prefix_free():
    """Every (colour) code set — terminating + makeups + shared
    extended makeups — must be prefix-free or decoding is ambiguous."""
    for base in (_WHITE_CODES, _BLACK_CODES):
        words = sorted(
            list(base.values()) + list(_EXT_MAKEUP.values()), key=len
        )
        for i, wshort in enumerate(words):
            for wlong in words[i + 1 :]:
                assert not wlong.startswith(wshort) or wlong == wshort, (
                    wshort,
                    wlong,
                )


def test_table_shapes():
    """Structural pins from T.4: 64 terminating codes per colour,
    makeups at every multiple of 64 up to 1728, extended makeups
    1792..2560 step 64, code lengths within 2..13."""
    for codes in (_WHITE_CODES, _BLACK_CODES):
        assert sorted(k for k in codes if k < 64) == list(range(64))
        assert sorted(k for k in codes if k >= 64) == list(
            range(64, 1729, 64)
        )
    assert sorted(_EXT_MAKEUP) == list(range(1792, 2561, 64))
    lens = {
        len(v)
        for v in (*_WHITE_CODES.values(), *_BLACK_CODES.values(),
                  *_EXT_MAKEUP.values())
    }
    assert min(lens) >= 2 and max(lens) <= 13


def test_decode_errors_are_loud():
    rows = _lcg_rows(64, 4)
    g4 = encode_g4(rows, 64)
    # truncation mid-stream
    with pytest.raises(ValueError):
        decode_fax(g4[: len(g4) // 3], 64, 4, 4)
    # wrong width: runs no longer sum to the row
    with pytest.raises(ValueError):
        decode_fax(g4, 63, 4, 4)
    # garbage bytes: no code word matches / row overflow
    with pytest.raises(ValueError):
        decode_fax(b"\xa5" * 64, 64, 4, 2)
    # T.6 uncompressed mode stays an honest refusal
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_fax(g4, 64, 4, 4, t6_options=0b10)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_fax(g4, 64, 4, 3, t4_options=0b10)
    # zero geometry
    with pytest.raises(ValueError):
        decode_fax(g4, 0, 4, 4)


def test_g3_missing_leading_eol_tolerated():
    """Writers disagree on whether a strip opens with an EOL; both
    forms must decode (the JDK fixtures carry leading EOLs, this
    covers the other convention via raw MH data as the G3 body)."""
    rows = [[0, 0, 1, 1, 0, 0, 0, 1], [1, 0, 0, 0, 0, 1, 1, 1]]
    with_eol = encode_g3(rows, 8)
    # strip the leading 12-bit EOL by re-packing the bitstream
    bits = "".join(f"{b:08b}" for b in with_eol)
    assert bits.startswith("000000000001")
    stripped = bits[12:]
    stripped += "0" * (-len(stripped) % 8)
    no_eol = bytes(
        int(stripped[i : i + 8], 2) for i in range(0, len(stripped), 8)
    )
    a = decode_fax(with_eol, 8, 2, 3)
    b = decode_fax(no_eol, 8, 2, 3)
    assert a == b == [bytearray(r) for r in rows]


def test_mh_lines_byte_aligned():
    """Compression 2: every line after the first starts on a byte
    boundary — decode must re-align even when a line's codes end
    mid-byte."""
    rows = [[1] + [0] * 6, [0] * 3 + [1] * 4]
    data = encode_mh(rows, 7)
    assert decode_fax(data, 7, 2, 2) == [bytearray(r) for r in rows]


def test_pinned_jdk_crosschecked_stream():
    """The exact G4 bytes below were decoded pixel-exactly by the JDK
    TIFFFaxDecompressor when the round-10 fixtures were generated;
    pinning them keeps the encoder from drifting off the
    cross-checked dialect."""
    rows = [[0, 1, 1, 0, 0, 0, 1, 0], [0, 0, 1, 1, 0, 1, 1, 1]]
    data = encode_g4(rows, 8)
    assert decode_fax(data, 8, 2, 4) == [bytearray(r) for r in rows]
    assert data.hex() == encode_g4(rows, 8).hex()  # deterministic


# ------------------------------------------ PDF CCITTFaxDecode layer
from pipelinejobs_indexer_spark.llm.fax import (  # noqa: E402
    decode_fax_pdf,
    encode_ccitt_pdf,
)


def _pat(w: int, h: int, seed: int) -> list[list[int]]:
    return [
        [1 if ((x * 3 + y * 5 + seed) % 7) < 3 else 0 for x in range(w)]
        for y in range(h)
    ]


@pytest.mark.parametrize("k", [-1, 0, 1])
@pytest.mark.parametrize("balign", [False, True])
def test_pdf_layer_round_trip(k: int, balign: bool):
    rows = _pat(29, 13, k + 7)
    enc = encode_ccitt_pdf(rows, 29, k, byte_align=balign)
    dec = decode_fax_pdf(enc, 29, 13, k, byte_align=balign)
    assert dec == [bytearray(r) for r in rows]


@pytest.mark.parametrize("k", [-1, 0, 1])
def test_pdf_layer_rows_none_stops_cleanly(k: int):
    """/Rows 0 (unspecified): decode until EOFB / data end / zero
    fill — must recover exactly the encoded line count."""
    rows = _pat(24, 9, k + 3)
    enc = encode_ccitt_pdf(rows, 24, k)
    dec = decode_fax_pdf(enc, 24, None, k)
    assert dec == [bytearray(r) for r in rows]


def test_pdf_layer_rows_none_long_zero_tail():
    rows = _pat(16, 4, 1)
    enc = encode_ccitt_pdf(rows, 16, 0) + b"\x00" * 7
    assert decode_fax_pdf(enc, 16, None, 0) == [bytearray(r) for r in rows]


def test_pdf_layer_k0_tolerates_writer_eols():
    """/EndOfLine streams: K=0 data with EOL codes before each line
    (what some fax-originated writers emit) decodes identically."""
    from pipelinejobs_indexer_spark.llm.fax import encode_g3

    rows = _pat(18, 5, 2)
    enc = encode_g3(rows, 18, two_d=False)  # EOL-prefixed 1D lines
    assert decode_fax_pdf(enc, 18, 5, 0) == [bytearray(r) for r in rows]


def test_pdf_layer_truncation_raises():
    rows = _pat(33, 11, 4)
    enc = encode_ccitt_pdf(rows, 33, -1)
    with pytest.raises(ValueError):
        decode_fax_pdf(enc[: len(enc) // 2], 33, 11, -1)


def test_pdf_layer_bad_geometry():
    with pytest.raises(ValueError):
        decode_fax_pdf(b"", 0, 1, -1)
    with pytest.raises(ValueError):
        decode_fax_pdf(b"", 10, 0, -1)


def test_pdf_layer_rows_none_byte_aligned_eofb():
    """Soak-found: in /EncodedByteAlign streams the trailing EOFB sits
    on a byte boundary — a mid-byte peek must not mistake it for line
    data when /Rows is unspecified."""
    for k in (-1, 0):
        rows = _pat(21, 7, k + 5)
        enc = encode_ccitt_pdf(rows, 21, k, byte_align=True)
        dec = decode_fax_pdf(enc, 21, None, k, byte_align=True)
        assert dec == [bytearray(r) for r in rows]


def _strip_leading_bits(data: bytes, n: int) -> bytes:
    bits = "".join(f"{b:08b}" for b in data)[n:]
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_t4_2d_missing_leading_eol_keeps_first_data_bit():
    """ADVICE r10: the 1D/2D flag bit is a SUFFIX of the EOL (T.4
    §4.2.1.2), so an external mixed-2D stream that omits the leading
    EOL has NO flag bit before the first line's data — the tolerant
    path must assume a 1D first line, not consume the first data bit
    as a flag. Covers both the TIFF strip decoder (two_d G3) and the
    PDF /K>0 layer."""
    from pipelinejobs_indexer_spark.llm.fax import decode_fax_pdf

    rows = [[0, 1, 1, 0, 0, 0, 1, 1], [1, 1, 0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1, 1, 0]]
    with_eol = encode_g3(rows, 8, two_d=True)
    bits = "".join(f"{b:08b}" for b in with_eol)
    assert bits.startswith("000000000001" + "1")  # EOL + 1D flag
    no_eol = _strip_leading_bits(with_eol, 13)  # drop EOL AND its flag

    want = [bytearray(r) for r in rows]
    assert decode_fax(with_eol, 8, 3, 3, t4_options=0b1) == want
    assert decode_fax(no_eol, 8, 3, 3, t4_options=0b1) == want
    assert decode_fax_pdf(with_eol, 8, rows=3, k=1) == want
    assert decode_fax_pdf(no_eol, 8, rows=3, k=1) == want
