"""Native (JVM ImageIO) JPEG seam parity (VERDICT r10 item 7): the
sidecar decoder behind SPARK_GRAFT_JPEG_DECODER=imageio must (a) match
the pure T.81 decoder BIT-EXACTLY on DC-only streams — the registered
llm_multimodal_jpeg corpus, so the driver hash is decoder-invariant —
and (b) stay within the conformance fixtures' IDCT-rounding tolerance
(|diff| <= 2) on AC-bearing external JPEGs."""

from __future__ import annotations

import json
import pathlib
import shutil

import numpy as np
import pytest

if shutil.which("javac") is None or shutil.which("java") is None:
    pytest.skip("no JDK on PATH for the ImageIO sidecar", allow_module_level=True)

from pipelinejobs_indexer_spark.llm.jpeg import decode_jpeg, synth_dc_jpeg
from pipelinejobs_indexer_spark.llm.native_jpeg import (
    decode_jpeg_native,
    shutdown,
)

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "conformance"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())
JPEGS = [m for m in MANIFEST if m["format"] == "jpeg"]


@pytest.fixture(scope="module", autouse=True)
def _sidecar():
    yield
    shutdown()


def test_dc_only_corpus_bit_exact():
    from pipelinejobs_indexer_spark.llm.jpeg import synth_progressive_jpeg
    from pipelinejobs_indexer_spark.llm.multimodal import JPEG_Q, _jpeg_dcs

    for d in range(64):
        jpg = synth_dc_jpeg([_jpeg_dcs(d)], 16, 16, q=JPEG_Q)
        assert decode_jpeg(jpg) == decode_jpeg_native(jpg), d
        # the progressive (SOF2) corpus rides the same seam
        blocks = [(dc, 1, 0) for dc in _jpeg_dcs(d)]
        prog = synth_progressive_jpeg(
            blocks, 16, 16, q=JPEG_Q, refine_dc=(d % 2 == 1)
        )
        assert decode_jpeg(prog) == decode_jpeg_native(prog), d


def test_conformance_corpus_within_idct_rounding():
    assert JPEGS, "manifest must carry JPEG fixtures"
    checked = 0
    for m in JPEGS:
        raw = (FIXDIR / m["file"]).read_bytes()
        try:
            ph, pw, pnc, ppx = decode_jpeg(raw)
        except NotImplementedError:
            continue  # modes the pure decoder refuses have no seam
        nh, nw, nnc, npx = decode_jpeg_native(raw)
        assert (ph, pw, pnc) == (nh, nw, nnc), m["name"]
        a = np.array(ppx, dtype=int).reshape(ph, pw, -1)
        b = np.array(npx, dtype=int).reshape(nh, nw, -1)
        assert np.abs(a - b).max() <= 2, (m["name"], int(np.abs(a - b).max()))
        checked += 1
    assert checked > 0


def test_decode_error_is_loud_and_pipe_survives():
    with pytest.raises(ValueError, match="ImageIO"):
        decode_jpeg_native(b"\xff\xd8not a real jpeg")
    # the sidecar must keep serving after an error response
    from pipelinejobs_indexer_spark.llm.multimodal import JPEG_Q, _jpeg_dcs

    jpg = synth_dc_jpeg([_jpeg_dcs(5)], 16, 16, q=JPEG_Q)
    assert decode_jpeg_native(jpg) == decode_jpeg(jpg)


# ---- round 12: the generalized image seam (VERDICT r11 item 4) ----
# PNG / GIF / TIFF are LOSSLESS, so unlike the JPEG legs parity is
# BIT-EXACT everywhere the JDK reader accepts the stream.

def test_png_conformance_and_corpus_bit_exact():
    import numpy as np

    from pipelinejobs_indexer_spark.llm.multimodal import PNG_SIDE
    from pipelinejobs_indexer_spark.llm.native_jpeg import decode_png_native
    from pipelinejobs_indexer_spark.llm.png import decode_png, encode_png_gray

    pngs = [m for m in MANIFEST if m["format"] == "png"]
    assert pngs, "manifest must carry PNG fixtures"
    for m in pngs:
        raw = (FIXDIR / m["file"]).read_bytes()
        try:
            a = decode_png(raw)
        except NotImplementedError:
            continue
        try:
            b = decode_png_native(raw)
        except ValueError as e:
            # >8-bit PNGs reject loudly at the pipe by design
            assert "unsupported by pipe" in str(e), (m["name"], str(e))
            continue
        assert a.shape == b.shape and (a == b).all(), m["name"]
    # the registered L5d corpus (all five row filters, both interlace
    # layouts) — the exact streams the seam would decode in production
    for d in range(16):
        yy, xx = np.mgrid[0:PNG_SIDE, 0:PNG_SIDE]
        img = ((d * 7 + yy * PNG_SIDE + xx) % 256).astype(np.uint8)
        raw = encode_png_gray(
            img, row_filters=(0, 1, 2, 3, 4), interlace=(d % 2 == 1)
        )
        assert (decode_png(raw) == decode_png_native(raw)).all(), d


def test_gif_conformance_and_corpus_bit_exact():
    import numpy as np

    from pipelinejobs_indexer_spark.llm.gif import decode_gif, encode_gif
    from pipelinejobs_indexer_spark.llm.multimodal import GIF_COLORS, GIF_SIDE
    from pipelinejobs_indexer_spark.llm.native_jpeg import decode_gif_native

    gifs = [m for m in MANIFEST if m["format"] == "gif"]
    assert gifs, "manifest must carry GIF fixtures"
    for m in gifs:
        raw = (FIXDIR / m["file"]).read_bytes()
        try:
            a = decode_gif(raw)
        except NotImplementedError:
            continue
        b = decode_gif_native(raw)
        assert a.shape == b.shape and (a == b).all(), m["name"]
    pal = np.stack(
        [
            (np.arange(GIF_COLORS) * 3) % 256,
            (np.arange(GIF_COLORS) * 5) % 256,
            (np.arange(GIF_COLORS) * 7) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    for d in range(8):
        yy, xx = np.mgrid[0:GIF_SIDE, 0:GIF_SIDE]
        idx = ((d * 11 + yy * GIF_SIDE + xx) % GIF_COLORS).astype(np.uint8)
        raw = encode_gif(idx, pal, interlace=True)
        assert (decode_gif(raw) == decode_gif_native(raw)).all(), d


def test_tiff_conformance_and_corpus_bit_exact():
    """Every manifest TIFF the pure decoder accepts must decode
    IDENTICALLY through the sidecar (shape, channel count after the
    gray-palette collapse, and every sample), except the streams the
    pipe rejects by design (>8-bit samples) — those must raise the
    loud 'unsupported by pipe' error the seam's fallback keys on."""
    from pipelinejobs_indexer_spark.llm.native_jpeg import decode_tiff_native
    from pipelinejobs_indexer_spark.llm.tiff import decode_tiff

    tiffs = [m for m in MANIFEST if m["format"] == "tiff"]
    assert tiffs, "manifest must carry TIFF fixtures"
    checked = rejected = 0
    for m in tiffs:
        raw = (FIXDIR / m["file"]).read_bytes()
        try:
            a = decode_tiff(raw)
        except NotImplementedError:
            continue
        try:
            b = decode_tiff_native(raw)
        except ValueError as e:
            assert "unsupported by pipe" in str(e) or "ImageIO" in str(e), (
                m["name"], str(e))
            rejected += 1
            continue
        assert a == b, m["name"]
        checked += 1
    assert checked > 0


def test_tiff_corpus_seam_decoder_invariant():
    """The registered L5r/L5u corpora through _tiff_decode_seam must be
    byte-identical to the pure decoder under the imageio knob — incl.
    the BigTIFF docs (explicit sniff keeps pure) and every CCITT fax
    mode. Monkeypatches CONFIG since it is captured at import."""
    from pipelinejobs_indexer_spark.llm import multimodal as mm
    from pipelinejobs_indexer_spark.llm.multimodal import (
        TIFF_PALETTE,
        _fax_bitmap,
        _tiff_gray,
        _tiff_rgb,
    )
    from pipelinejobs_indexer_spark.llm.tiff import decode_tiff, write_tiff

    old = mm.CONFIG.image_decoder
    object.__setattr__(mm.CONFIG, "image_decoder", "imageio")
    try:
        dec = mm._tiff_decode_seam()
        for d in range(24):
            gray = write_tiff(
                _tiff_gray(d),
                compression=[1, 5, 32773, 8][d % 4],
                predictor=1 + d % 2,
                big_endian=(d // 2) % 2 == 0,
                rows_per_strip=2 + d % 3,
                photometric=0 if d % 7 == 0 else None,
            )
            assert decode_tiff(gray) == dec(gray), ("gray", d)
            comp = [5, 32773, 1, 8][d % 4]
            rgb = write_tiff(
                _tiff_rgb(d),
                spp=3,
                compression=comp,
                predictor=(1 + (d // 3) % 2 if comp in (5, 8) else 1),
                big_endian=d % 2 == 0,
                big=(d % 6 == 1),
            )
            assert decode_tiff(rgb) == dec(rgb), ("rgb", d)
            pbits = [4, 2, 1][d % 3]  # r13: all sub-8 index depths
            pal = write_tiff(
                [[(d + y * 8 + x) % (1 << pbits) for x in range(8)]
                 for y in range(8)],
                palette=TIFF_PALETTE[: 1 << pbits],
                bits=pbits,
                compression=[32773, 1, 5, 8][d % 4],
                big_endian=(d // 5) % 2 == 0,
            )
            assert decode_tiff(pal) == dec(pal), ("pal", d)
            w, h, rows = _fax_bitmap(d)
            fcomp = [2, 3, 4][d % 3]
            fax = write_tiff(
                rows,
                compression=fcomp,
                t4_two_d=(fcomp == 3 and (d // 3) % 2 == 0),
                rows_per_strip=h if d % 5 < 3 else (h + 1) // 2,
                big_endian=(d // 7) % 2 == 0,
            )
            assert decode_tiff(fax) == dec(fax), ("fax", d)
        # JPEG-in-TIFF (compression 7, r13): DC-only strips decode
        # bit-exactly through the JDK like the bare-JPEG seam —
        # hand-spliced since write_tiff has no general JPEG encoder
        import struct

        from pipelinejobs_indexer_spark.llm.jpeg import synth_dc_jpeg

        jpg = synth_dc_jpeg([[5, -10, 3, 7]], 16, 16, q=16)
        base = write_tiff([[0] * 16 for _ in range(16)], compression=1)
        at = base.index((259).to_bytes(2, "little"))
        patched = bytearray(base)
        patched[at + 8] = 7
        strip_at = len(base) - 256
        cat = bytes(patched).index((279).to_bytes(2, "little"))
        patched[cat + 8:cat + 12] = struct.pack("<I", len(jpg))
        jt = bytes(patched[:strip_at]) + jpg + bytes(
            patched[strip_at + 256:]
        )
        assert decode_tiff(jt) == dec(jt), "jpeg-in-tiff"
    finally:
        object.__setattr__(mm.CONFIG, "image_decoder", old)


def test_multipage_tiff_seam_parity():
    """Round 13 (VERDICT r12 item 5): the sidecar's negative-length
    multi-page opcode iterates every IFD via ImageReader.read(i) and
    must match decode_tiff_pages bit-exactly — on the three-page JDK
    conformance fixture AND on the L5x tiled multi-page corpus shapes
    (every codec, predictor, both byte orders, palette/bilevel mixes).
    BigTIFF sniffs to pure and 16-bit pages fall back on the pipe's
    loud rejection, so the seam is decoder-invariant end to end."""
    from pipelinejobs_indexer_spark.llm import multimodal as mm
    from pipelinejobs_indexer_spark.llm.native_jpeg import (
        decode_tiff_pages_native,
    )
    from pipelinejobs_indexer_spark.llm.tiff import (
        decode_tiff_pages,
        write_tiff_multi,
    )

    raw = (FIXDIR / "multipage.tif").read_bytes()
    assert decode_tiff_pages_native(raw) == decode_tiff_pages(raw)

    old = mm.CONFIG.image_decoder
    object.__setattr__(mm.CONFIG, "image_decoder", "imageio")
    try:
        dec = mm._tiff_pages_decode_seam()
        # the exact L5x corpus recipe, including the 16-bit (d%11==0)
        # and BigTIFF (d%6==0) docs the seam must route to pure
        for d in range(24):
            w, h = 40 + d % 27, 20 + d % 13
            g = (16 if d % 11 == 0 else
                 4 if d % 5 == 0 else (2 if d % 7 == 0 else 8))
            mx = (1 << g) - 1
            n_pages = 2 if d % 4 == 2 else 1
            pages = [
                [[(x * 5 + y * 11 + d + p * 1009) % (mx + 1)
                  for x in range(w)] for y in range(h)]
                for p in range(n_pages)
            ]
            tif = write_tiff_multi(
                pages,
                compression=[1, 5, 8, 32773][d % 4],
                predictor=2 if d % 2 and d % 4 != 3 and g == 8 else 1,
                bits=g,
                tile_size=[(16, 16), (32, 16), (16, 32)][d % 3],
                big_endian=(d // 2) % 2 == 0,
                big=d % 6 == 0,
            )
            assert dec(tif) == decode_tiff_pages(tif), d
        # mixed palette + bilevel chain: per-page photometric collapse
        from pipelinejobs_indexer_spark.llm.multimodal import TIFF_PALETTE

        pal_page = [[(y * 8 + x) % 16 for x in range(8)] for y in range(8)]
        bil_page = [[1 if (x + y) % 3 == 0 else 0 for x in range(24)]
                    for y in range(6)]
        mixed = write_tiff_multi(
            [pal_page, bil_page],
            page_opts=[
                {"palette": TIFF_PALETTE, "bits": 4, "compression": 1},
                {"compression": 4},
            ],
        )
        got = dec(mixed)
        assert got == decode_tiff_pages(mixed)
        assert got[0][2] == 3 and got[1][2] == 1  # palette stays RGB
    finally:
        object.__setattr__(mm.CONFIG, "image_decoder", old)


def test_png_gif_seams_fall_back_pure_on_pipe_rejected_depth():
    """The PNG/GIF seam legs mirror _tiff_decode_seam's fallback (ADVICE
    r12): a stream the pipe rejects BY DESIGN (>8-bit samples — the
    gray16 conformance fixture) must degrade to the pure decoder under
    the imageio knob instead of failing the whole query, while the
    registered 8-bit corpus still decodes through the sidecar
    bit-exactly (the seam's production path is untouched)."""
    from pipelinejobs_indexer_spark.llm import multimodal as mm
    from pipelinejobs_indexer_spark.llm.gif import encode_gif
    from pipelinejobs_indexer_spark.llm.native_jpeg import decode_png_native
    from pipelinejobs_indexer_spark.llm.png import decode_png, encode_png_gray

    gray16 = (FIXDIR / "gray16.png").read_bytes()
    with pytest.raises(ValueError, match="unsupported by pipe"):
        decode_png_native(gray16)
    old = mm.CONFIG.image_decoder
    object.__setattr__(mm.CONFIG, "image_decoder", "imageio")
    try:
        png_dec = mm._png_decode_seam()
        assert (png_dec(gray16) == decode_png(gray16)).all()
        # 8-bit corpus stream: still the sidecar, still bit-exact
        yy, xx = np.mgrid[0:mm.PNG_SIDE, 0:mm.PNG_SIDE]
        img = ((3 * 7 + yy * mm.PNG_SIDE + xx) % 256).astype(np.uint8)
        raw = encode_png_gray(img, row_filters=(0, 1, 2, 3, 4))
        assert (png_dec(raw) == decode_png(raw)).all()
        gif_dec = mm._gif_decode_seam()
        pal = np.array(
            [[i * 3 % 256, i * 5 % 256, i * 7 % 256] for i in range(16)],
            dtype=np.uint8,
        )
        idx = (np.arange(64, dtype=np.uint8).reshape(8, 8) % 16)
        from pipelinejobs_indexer_spark.llm.gif import decode_gif

        g = encode_gif(idx, pal)
        assert (gif_dec(g) == decode_gif(g)).all()
    finally:
        object.__setattr__(mm.CONFIG, "image_decoder", old)


def test_tiff_photometric_honors_declared_entry_type():
    """Tag 262's value must be read at the width its IFD entry declares
    (ADVICE r12): a LONG-typed photometric on a big-endian stream reads
    4 bytes (a SHORT read would see the high half = 0 and misclassify
    palette as bilevel); types other than SHORT/LONG are out of spec
    and return None (unknown) rather than garbage."""
    import struct

    from pipelinejobs_indexer_spark.llm.native_jpeg import _tiff_photometric
    from pipelinejobs_indexer_spark.llm.tiff import write_tiff

    gray_pal = [(17 * i, 17 * i, 17 * i) for i in range(16)]
    rows = [[(y * 8 + x) % 16 for x in range(8)] for y in range(8)]
    t = write_tiff(rows, palette=gray_pal, bits=4, compression=1,
                   big_endian=True)
    assert _tiff_photometric(t) == 3

    def retype(data: bytes, typ: int, value_bytes: bytes) -> bytes:
        bo = ">" if data[:2] == b"MM" else "<"
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
        (cnt,) = struct.unpack_from(bo + "H", data, ifd_off)
        buf = bytearray(data)
        for k in range(cnt):
            off = ifd_off + 2 + 12 * k
            tag = struct.unpack_from(bo + "H", buf, off)[0]
            if tag == 262:
                struct.pack_into(bo + "H", buf, off + 2, typ)
                buf[off + 8:off + 12] = value_bytes
                return bytes(buf)
        raise AssertionError("no photometric tag in fixture")

    # LONG-typed on big-endian: value occupies the full 4-byte slot
    t_long = retype(t, 4, struct.pack(">I", 3))
    assert _tiff_photometric(t_long) == 3
    # nonstandard RATIONAL type: unknown, not a misread 0
    t_rat = retype(t, 5, struct.pack(">I", 8))
    assert _tiff_photometric(t_rat) is None


def test_tiff_gray_palette_stays_three_channel():
    """The channel-collapse decision keys on the DECLARED photometric,
    not pixel content (r12 review finding): a photometric-3 palette
    TIFF whose referenced entries are all gray must come back 3-channel
    from BOTH decoders, while bilevel (photometric 0/1) streams
    collapse to the 1-channel BlackIsZero contract."""
    from pipelinejobs_indexer_spark.llm.native_jpeg import (
        _tiff_photometric,
        decode_tiff_native,
    )
    from pipelinejobs_indexer_spark.llm.tiff import decode_tiff, write_tiff

    gray_pal = [(17 * i, 17 * i, 17 * i) for i in range(16)]
    rows = [[(y * 8 + x) % 16 for x in range(8)] for y in range(8)]
    t = write_tiff(rows, palette=gray_pal, bits=4, compression=1)
    assert _tiff_photometric(t) == 3
    a, b = decode_tiff(t), decode_tiff_native(t)
    assert a == b and a[2] == 3, (a[2], b[2])
    # bilevel: photometric 0/1 collapses, matching pure exactly
    bil = [[1 if (x + y) % 3 == 0 else 0 for x in range(24)]
           for y in range(6)]
    t2 = write_tiff(bil, compression=4)
    assert _tiff_photometric(t2) in (0, 1)
    a2, b2 = decode_tiff(t2), decode_tiff_native(t2)
    assert a2 == b2 and a2[2] == 1


def test_pipe_survives_malformed_palette_index():
    """An exception during payload assembly (out-of-range palette
    index) must produce a clean error frame, not a half-written success
    frame that desyncs the pipe (r12 review finding). A GIF whose LZW
    stream emits indices beyond the declared color table exercises it;
    the pipe must keep serving afterwards."""
    import numpy as np

    from pipelinejobs_indexer_spark.llm.gif import decode_gif, encode_gif
    from pipelinejobs_indexer_spark.llm.native_jpeg import decode_gif_native

    # 4-entry color table, but pixel indices reach 7: encode with an
    # 8-entry palette, then shrink the declared GCT by patching the
    # logical-screen-descriptor packed field (2 << n entries)
    pal8 = np.array([[i * 30, i * 20, i * 10] for i in range(8)],
                    dtype=np.uint8)
    idx = (np.arange(64, dtype=np.uint8).reshape(8, 8) % 8)
    raw = bytearray(encode_gif(idx, pal8))
    packed = raw[10]
    assert packed & 0x80 and (packed & 0x07) == 2  # 8-entry GCT
    raw[10] = (packed & ~0x07) | 0x01  # declare 4 entries
    # drop the now-extra 12 palette bytes so the stream stays parseable
    malformed = bytes(raw[:13 + 12] + raw[13 + 24:])
    try:
        decode_gif_native(malformed)
    except ValueError:
        pass  # loud failure is fine; silence or a hang is not
    # the pipe must still serve correct decodes after the error
    pal = np.array([[i * 3 % 256, i * 5 % 256, i * 7 % 256]
                    for i in range(16)], dtype=np.uint8)
    good_idx = (np.arange(64, dtype=np.uint8).reshape(8, 8) % 16)
    good = encode_gif(good_idx, pal)
    assert (decode_gif(good) == decode_gif_native(good)).all()
