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


def make_webdataset_tar(path: str) -> None:
    """WebDataset-style shard: sample keys 000000..000002, each a .txt
    payload + a .cls label member — the tar-of-samples layout LLM
    training shards actually ship in. Deterministic headers (fixed
    mtime, zero uid/gid) so the committed bytes are stable."""
    import io
    import tarfile

    with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
        for k in range(3):
            key = f"{k:06d}"
            txt = f"sample {k} text with {k * 3 + 1} tokens\n".encode()
            cls = str(k % 2).encode()
            for ext, body in (("txt", txt), ("cls", cls)):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(body)
                info.mtime = 1533168000  # 2018-08-02, the fixture epoch
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(body))


def make_tar_gz(path: str) -> None:
    """Generic gz-compressed tar: nested paths, a directory entry, an
    empty file — the member-shape variety bundle.zip gives the zip
    scans. gzip mtime pinned so the committed bytes are stable."""
    import gzip
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("logs/")
        d.type = tarfile.DIRTYPE
        d.mtime = 1533168000
        d.mode = 0o755
        tf.addfile(d)
        members = [
            ("logs/run.log", b"INFO start\n" * 30),
            ("logs/err.log", b""),
            ("manifest.yml", b"version: 3\nfiles: 3\n"),
        ]
        for name, body in members:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            info.mtime = 1533168000
            tf.addfile(info, io.BytesIO(body))
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(buf.getvalue())


def main() -> None:
    os.makedirs(os.path.join(ROOT, "emerald", "201808"), exist_ok=True)
    make_zip(os.path.join(ROOT, "potato.zip"))
    make_multi_zip(os.path.join(ROOT, "emerald", "bundle.zip"))
    make_pdf(os.path.join(ROOT, "austin.pdf"))
    make_png(os.path.join(ROOT, "emerald", "201808", "protein.png"))
    make_text(os.path.join(ROOT, "emerald", "ansible.yml"))
    make_webdataset_tar(os.path.join(ROOT, "shard-000000.tar"))
    make_tar_gz(os.path.join(ROOT, "emerald", "logs-bundle.tar.gz"))
    for dirpath, _, files in os.walk(ROOT):
        for fn in sorted(files):
            p = os.path.join(dirpath, fn)
            print(os.path.relpath(p, ROOT), os.path.getsize(p))


if __name__ == "__main__":
    main()
