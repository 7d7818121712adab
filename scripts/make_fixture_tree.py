"""Generate the nested binary fixture tree used by scan_archive_listing.

Mirrors the SHAPE of the reference's archive fixture tree
(/root/reference/tests/store/uploads/: zip + pdf at the root, a png two
directories deep) with tiny deterministic files generated here — real
magic bytes, no third-party content. Run once; outputs are committed.
"""

from __future__ import annotations

import os
import struct
import zipfile
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(
    os.path.dirname(HERE), "pipelinejobs_indexer_spark", "fixtures", "uploads"
)


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        info = zipfile.ZipInfo("readme.txt", date_time=(2018, 8, 1, 0, 0, 0))
        z.writestr(info, "archive fixture for listing tests\n")


def make_multi_zip(path: str) -> None:
    """Multi-member archive for scan_archive_members: nested paths, a
    directory entry, stored AND deflated members — deterministic bytes
    (fixed timestamps, fixed content), committed once."""
    with zipfile.ZipFile(path, "w") as z:
        members = [
            ("results/summary.csv", b"job,state\n1,FINISHED\n2,CREATED\n",
             zipfile.ZIP_STORED),
            ("results/logs/run.log", b"INFO start\n" * 40, zipfile.ZIP_DEFLATED),
            ("results/logs/err.log", b"", zipfile.ZIP_STORED),
            ("manifest.yml", b"version: 2\nfiles: 4\n", zipfile.ZIP_STORED),
            ("data/part-000.tsv", b"k\tv\n" + b"0\tx\n" * 25, zipfile.ZIP_DEFLATED),
        ]
        dirinfo = zipfile.ZipInfo("results/", date_time=(2018, 8, 2, 0, 0, 0))
        dirinfo.external_attr = 0o40755 << 16
        z.writestr(dirinfo, b"")
        for name, content, method in members:
            info = zipfile.ZipInfo(name, date_time=(2018, 8, 2, 0, 0, 0))
            z.writestr(info, content, compress_type=method)


def make_pdf(path: str) -> None:
    # minimal but structurally honest single-page PDF
    body = b"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 72 72] >> endobj
trailer << /Root 1 0 R >>
%%EOF
"""
    with open(path, "wb") as f:
        f.write(body)


def make_png(path: str) -> None:
    # 2x2 grayscale PNG built from spec primitives (signature/IHDR/IDAT/IEND)
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00\x10\x20" + b"\x00\x30\x40"  # filter byte + 2 px, twice
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def make_text(path: str) -> None:
    with open(path, "w") as f:
        f.write("level: '0'\npatterns:\n  - '\\.bam$'\n")


def main() -> None:
    os.makedirs(os.path.join(ROOT, "emerald", "201808"), exist_ok=True)
    make_zip(os.path.join(ROOT, "potato.zip"))
    make_multi_zip(os.path.join(ROOT, "emerald", "bundle.zip"))
    make_pdf(os.path.join(ROOT, "austin.pdf"))
    make_png(os.path.join(ROOT, "emerald", "201808", "protein.png"))
    make_text(os.path.join(ROOT, "emerald", "ansible.yml"))
    for dirpath, _, files in os.walk(ROOT):
        for fn in sorted(files):
            p = os.path.join(dirpath, fn)
            print(os.path.relpath(p, ROOT), os.path.getsize(p))


if __name__ == "__main__":
    main()
