"""pdf.py text-extraction semantics: write→extract round trips over
every content encoding (plain/TJ/hex × Flate/ASCII85 chains), string
escape grammar, page-tree order, corrupt-container classes, the honest
NotImplementedError scope (encryption, object streams, image filters),
the decompression bound, and bit-flip robustness. Writer and extractor
share only the published PDF grammar, so a round trip cross-checks
independently-written paths."""

from __future__ import annotations

import os
import sys
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinejobs_indexer_spark.llm.pdf import (  # noqa: E402
    MAX_TEXT_BYTES,
    extract_pdf_text,
    write_pdf,
)


def _rt(pages, **kw) -> bytes:
    data = write_pdf(pages, **kw)
    assert extract_pdf_text(data) == "\f".join(
        "\n".join(lines) for lines in pages
    )
    return data


# ------------------------------------------------------------ round trips
def test_roundtrip_every_encoding():
    pages = [["hello world", "second line"], ["page two"]]
    _rt(pages)
    _rt(pages, compress=False)
    _rt(pages, use_tj_array=True)
    _rt(pages, hex_strings=True)
    _rt(pages, ascii85=True)                  # ASCII85 -> Flate chain
    _rt(pages, ascii85=True, compress=False)  # ASCII85 alone


def test_roundtrip_escape_grammar():
    # parens (nested and escaped), backslashes, octal-forcing bytes,
    # \n \r \t shows, and high latin-1
    pages = [[
        "parens (nested (deep)) and \\ backslash",
        "tabs\tand\rcarriage",
        "high bytes: \xe9\xfc\xff",
    ]]
    _rt(pages)
    _rt(pages, hex_strings=True)


def test_roundtrip_page_tree_order():
    pages = [[f"page {i} line {j}" for j in range(3)] for i in range(9)]
    data = _rt(pages)
    text = extract_pdf_text(data)
    assert text.split("\f")[4].startswith("page 4")


@settings(max_examples=25, deadline=None)
@given(
    n_pages=st.integers(1, 5),
    n_lines=st.integers(0, 6),
    seed=st.integers(0, 2**31 - 1),
    tj=st.booleans(),
    hx=st.booleans(),
    a85=st.booleans(),
    comp=st.booleans(),
)
def test_roundtrip_hypothesis(n_pages, n_lines, seed, tj, hx, a85, comp):
    import random

    rng = random.Random(seed)
    alphabet = (
        "abc XYZ 019 ()\\\t"  # includes every escape-relevant class
        + "\xe9\xfc"
    )
    pages = [
        [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            for _ in range(n_lines)
        ]
        for _ in range(n_pages)
    ]
    _rt(pages, use_tj_array=tj, hex_strings=hx, ascii85=a85, compress=comp)


# ----------------------------------------------------------- error classes
def test_corrupt_container_classes():
    data = write_pdf([["hello"]])
    with pytest.raises(ValueError, match="%PDF"):
        extract_pdf_text(b"GIF89a" + data)
    with pytest.raises(ValueError, match="%%EOF"):
        extract_pdf_text(data[: data.index(b"%%EOF")])
    with pytest.raises(ValueError, match="no document catalog"):
        extract_pdf_text(b"%PDF-1.4\n%%EOF\n")
    # break the content stream's zlib body (keep lengths intact)
    start = data.index(b"stream\n") + 7
    bad = bytearray(data)
    bad[start] ^= 0xFF
    bad[start + 1] ^= 0xFF
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(bytes(bad))
    # /Length exceeding the remaining bytes is a truncation error
    import re

    data2 = write_pdf([["x"]], compress=False)
    bad2 = re.sub(rb"/Length \d+", b"/Length 99999", data2, count=1)
    assert bad2 != data2
    with pytest.raises(ValueError, match="truncated PDF stream|endstream"):
        extract_pdf_text(bad2)


def test_rc4_encryption_roundtrip():
    """The Standard handler's RC4 variants decrypt for real (empty user
    password — the owner-locked case every reader opens), across every
    content encoding; filter-then-encrypt order is the spec's."""
    pages = [["hello world", "with (parens) \\ and \xe9"], ["page two"]]
    want = "\f".join("\n".join(lines) for lines in pages)
    for kw in ({}, {"use_tj_array": True}, {"hex_strings": True},
               {"ascii85": True}, {"compress": False}):
        data = write_pdf(pages, encrypt_rc4=True, **kw)
        assert b"/Encrypt" in data and b"hello" not in data
        assert extract_pdf_text(data) == want


def test_honest_not_implemented_scope():
    # a REAL user password locks the document: U verification fails
    with pytest.raises(NotImplementedError, match="password-protected"):
        extract_pdf_text(
            write_pdf([["x"]], encrypt_rc4=True, user_password=b"secret")
        )
    # AES (V4) keeps the stub — RC4 is the stdlib-honest boundary
    data = write_pdf([["x"]], encrypt_rc4=True)
    with pytest.raises(NotImplementedError, match="RC4 Standard"):
        extract_pdf_text(data.replace(b"/V 2 /R 3", b"/V 4 /R 4"))
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_text(
            write_pdf([["x"]], compress=False).replace(
                b"<< /Length", b"<< /Filter /DCTDecode /Length"
            )
        )


def test_decompression_bound():
    # a zlib bomb: tiny compressed stream declaring gigabytes
    bomb = zlib.compress(b"\x00" * (MAX_TEXT_BYTES + 2), 9)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(bomb)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + bomb
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    assert len(body) < MAX_TEXT_BYTES // 4  # the input itself is small
    with pytest.raises(ValueError, match="bound"):
        extract_pdf_text(body)


def test_page_tree_cycle_rejected():
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="cycle"):
        extract_pdf_text(body)


def test_reference_layout_fixture_extracts_empty():
    """The synthesized austin.pdf fixture (the reference's upload-store
    layout: no xref, no /Contents) must parse as a page with no text —
    not crash, not raise."""
    fix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pipelinejobs_indexer_spark", "fixtures", "uploads", "austin.pdf",
    )
    with open(fix, "rb") as fh:
        assert extract_pdf_text(fh.read()) == ""


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 6))
def test_mutation_robustness(seed, n_flips):
    import random

    rng = random.Random(seed)
    data = bytearray(write_pdf([["hello world", "line"], ["p2"]]))
    for _ in range(n_flips):
        data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
    try:
        text = extract_pdf_text(bytes(data))
        assert len(text) <= MAX_TEXT_BYTES
    except (ValueError, NotImplementedError):
        pass


def test_page_tree_depth_bounded():
    """A non-cyclic page tree nested past 64 levels must raise ValueError
    (the module's corruption contract), never RecursionError (ADVICE r8)."""
    objs = [b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"]
    depth = 80
    for i in range(depth):
        num = 2 + i
        kid = num + 1
        objs.append(
            b"%d 0 obj << /Type /Pages /Kids [%d 0 R] /Count 1 >> endobj\n"
            % (num, kid)
        )
    objs.append(b"%d 0 obj << /Type /Page >> endobj\n" % (2 + depth))
    body = b"%PDF-1.4\n" + b"".join(objs) + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    with pytest.raises(ValueError, match="deeper than"):
        extract_pdf_text(body)
