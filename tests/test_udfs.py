"""Unit coverage for the UDF surface: the X1 fast/slow regex classifier
(native rlike vs pandas_udf must agree), and the F12 magic sniffer."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipelinejobs_indexer_spark.functions.udfs import (  # noqa: E402
    is_java_safe,
    regex_any_filter,
)


def test_classifier():
    assert is_java_safe(r"\.bam$")
    assert is_java_safe(r"^/products/.*\.(sam|tsv)$")
    assert not is_java_safe(r"(?P<name>x)\.bam$")  # named group → slow path
    assert not is_java_safe(r"foo\Z")  # \Z differs between re and Java


def test_fast_slow_agree(spark):
    df = spark.createDataFrame(
        [("/a/1.bam",), ("/a/2.sam",), ("/a/3.txt",), ("/b/x.tsv",)], ["path"]
    )
    fast = df.filter(
        regex_any_filter(F.col("path"), [r"\.bam$", r"\.sam$"], newline_free=True)
    )
    # same patterns, but routed through the pandas_udf path via a named group
    slow = df.filter(
        regex_any_filter(F.col("path"), [r"(?P<e>\.bam)$", r"(?P<f>\.sam)$"])
    )
    assert sorted(r.path for r in fast.collect()) == sorted(
        r.path for r in slow.collect()
    ) == ["/a/1.bam", "/a/2.sam"]


def test_sniffer_on_real_fixture_bytes(spark):
    """F12's pandas-UDF sniffer over the committed binary fixture tree —
    real zip/pdf/png magic bytes, not synthesized heads."""
    from pipelinejobs_indexer_spark.functions.udfs import sniff_mime_udf
    from pipelinejobs_indexer_spark.operators.scans import _UPLOADS

    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(_UPLOADS)
    )
    sniff = sniff_mime_udf()
    # 16-byte heads: ansible.yml carries a newline inside its first 16
    # bytes, pinning the tab/LF/CR-aware printable class
    rows = df.select(
        F.substring_index("path", "/", -1).alias("fn"),
        sniff(F.substring("content", 1, 16)).alias("mime"),
    ).collect()
    got = {r.fn: r.mime for r in rows}
    assert got == {
        "potato.zip": "application/zip",
        "bundle.zip": "application/zip",
        "austin.pdf": "application/pdf",
        "protein.png": "image/png",
        "ansible.yml": "text/plain",
        "logs-bundle.tar.gz": "application/gzip",
        # tar magic sits at offset 257 — outside the 16-byte head, so
        # the head-sniff honestly falls back; full-content sniff below
        "shard-000000.tar": "application/octet-stream",
    }
    from pipelinejobs_indexer_spark.llm.multimodal import sniff_mime
    from pipelinejobs_indexer_spark.operators.scans import _UPLOADS as _UP

    import os

    with open(os.path.join(_UP, "shard-000000.tar"), "rb") as f:
        assert sniff_mime(f.read()) == "application/x-tar"


# --- X5: hashids ---------------------------------------------------------


def test_hashids_known_vectors():
    """The canonical test vectors published in the hashids documentation:
    reproducing them proves hashids_impl IS the public algorithm (the
    hashids package itself is not installed in this container)."""
    from pipelinejobs_indexer_spark.functions.hashids_impl import Hashids

    h = Hashids(salt="this is my salt")
    assert h.encode(12345) == "NkK9"
    assert h.encode(1) == "NV"
    assert h.encode(683, 94108, 123, 5) == "aBMswoO2UB3Sj"
    assert h.decode("NkK9") == (12345,)
    assert Hashids(salt="this is my salt", min_length=8).encode(1) == "gB0NV05e"


def test_hashids_round_trip_and_padding():
    import random

    from pipelinejobs_indexer_spark.functions.hashids_impl import Hashids

    rng = random.Random(7)
    for salt, minlen in [("", 0), ("pipelinejobs-indexer", 8), ("x", 30)]:
        h = Hashids(salt=salt, min_length=minlen)
        for _ in range(100):
            n = rng.randrange(0, 10**12)
            enc = h.encode(n)
            assert len(enc) >= minlen
            assert h.decode(enc) == (n,)
        ns = tuple(rng.randrange(0, 10**6) for _ in range(5))
        assert h.decode(h.encode(*ns)) == ns


def test_suffix_literal_classifier():
    from pipelinejobs_indexer_spark.functions.udfs import suffix_literal

    assert suffix_literal(r"\.bam$") == ".bam"
    assert suffix_literal(r"_v2\.txt$") == "_v2.txt"
    assert suffix_literal(r"\$cost$") == "$cost"
    assert suffix_literal(r"a\\$") == "a\\"  # escaped backslash is a literal
    # must NOT lower: real metacharacters, classes, alternation, no anchor
    for p in [r"\.(sam|tsv)$", r"\.bam", r".bam$", r"\d+$", r"x*$", r"$"]:
        assert suffix_literal(p) is None, p


def test_ref_validator_resolves_cross_document_refs():
    """Both planted corruption classes must be rejected BY THE $REF'D
    SUB-SCHEMAS (pattern in one document, enum in another) — proving the
    resolver fetches across schema documents, not just the referrer."""
    from pipelinejobs_indexer_spark.functions.udfs import _ref_validator

    v = _ref_validator()
    good = {"uuid": "107" + "a" * 64, "level": "2"}
    assert not list(v.iter_errors(good))
    bad_uuid = dict(good, uuid="a" * 64)  # prefix stripped -> pattern ref fails
    bad_level = dict(good, level="9")     # out of enum ref
    extra = dict(good, junk=1)            # additionalProperties: false
    assert list(v.iter_errors(bad_uuid))
    assert list(v.iter_errors(bad_level))
    assert list(v.iter_errors(extra))
    assert list(v.iter_errors({"uuid": good["uuid"]}))  # required level


def test_hashids_decode_rejects_foreign_and_corrupt_tokens():
    from pipelinejobs_indexer_spark.functions.hashids_impl import Hashids

    a = Hashids(salt="salt-a", min_length=8)
    b = Hashids(salt="salt-b", min_length=8)
    tok = b.encode(12345)
    assert a.decode(tok) == ()         # wrong salt -> round-trip guard fires
    assert b.decode(tok) == (12345,)
    assert b.decode(tok[:-1] + ("x" if tok[-1] != "x" else "y")) == ()
    assert a.decode("!!!") == ()       # chars outside the alphabet


def test_scan_archive_members_expands_all_fixture_zips(spark, sf_dir):
    """1 archive row -> N member rows: both fixture zips expand, deflated
    and stored members are distinguished, and the explicit directory
    entry is flagged — all without extracting any member content."""
    from pipelinejobs_indexer_spark.operators.scans import scan_archive_members

    rows = {
        (r.archive, r.member): r
        for r in scan_archive_members(spark, sf_dir).collect()
    }
    assert ("potato.zip", "readme.txt") in rows
    bundle = {m for a, m in rows if a == "emerald/bundle.zip"}
    assert bundle == {
        "results/", "results/summary.csv", "results/logs/run.log",
        "results/logs/err.log", "manifest.yml", "data/part-000.tsv",
    }
    run_log = rows[("emerald/bundle.zip", "results/logs/run.log")]
    assert run_log.method == "deflated"
    assert run_log.size_bytes == 440 and run_log.compress_size < 440
    assert rows[("emerald/bundle.zip", "results/")].is_dir
    assert not rows[("potato.zip", "readme.txt")].is_dir
    # crc32 is content-derived ground truth, not zipfile echo
    import zlib
    assert rows[("emerald/bundle.zip", "manifest.yml")].crc32 == (
        zlib.crc32(b"version: 2\nfiles: 4\n") & 0xFFFFFFFF
    )


def test_scan_archive_member_content_extracts_and_digests(spark, sf_dir):
    """S15: extraction must produce content-true digests (hand-computed
    sha256 of a known member), sniff member mime from member bytes, and
    exclude directory entries."""
    import hashlib

    from pipelinejobs_indexer_spark.operators.scans import (
        scan_archive_member_content,
    )

    rows = {
        (r.archive, r.member): r
        for r in scan_archive_member_content(spark, sf_dir).collect()
    }
    manifest = rows[("emerald/bundle.zip", "manifest.yml")]
    assert manifest.sha256 == hashlib.sha256(b"version: 2\nfiles: 4\n").hexdigest()
    assert manifest.n_bytes == 20
    assert manifest.mime_sniffed == "text/plain"
    run_log = rows[("emerald/bundle.zip", "results/logs/run.log")]
    assert run_log.n_bytes == 440  # inflated size, not compressed
    assert ("emerald/bundle.zip", "results/") not in rows  # dirs excluded
    assert ("potato.zip", "readme.txt") in rows


def test_storage_uri_map_reference_shaped_uris(spark, sf_dir):
    """F13 over the reference's own shape: config.yml:11-13 maps
    data-sd2e-community -> /work/projects/SD2E-Community/prod/data;
    every resolvable row must rewrite 'agave://<system><path>' to
    '<posix_root><path>' exactly, and unknown systems must surface as
    resolvable=FALSE with a NULL posix_path (never a silent wrong
    path)."""
    from pipelinejobs_indexer_spark.functions.scalars import (
        STORAGE_SYSTEMS,
        fn_storage_uri_map,
    )

    assert (
        STORAGE_SYSTEMS["data-sd2e-community"]
        == "/work/projects/SD2E-Community/prod/data"
    )  # reference parity: /root/reference/config.yml:11-13

    rows = fn_storage_uri_map(spark, sf_dir).collect()
    assert rows
    seen_known, seen_unknown = False, False
    for r in rows:
        assert r.uri.startswith("agave://")
        system, _, path = r.uri[len("agave://"):].partition("/")
        if r.resolvable:
            seen_known = True
            assert r.posix_path == STORAGE_SYSTEMS[system] + "/" + path
        else:
            seen_unknown = True
            assert system == "data-unknown-system"
            assert r.posix_path is None
    assert seen_known and seen_unknown
