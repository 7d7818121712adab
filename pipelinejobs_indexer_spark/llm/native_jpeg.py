"""Native (JVM ImageIO) JPEG decode behind the pure-decoder seam.

The multimodal docstrings price the pure-Python codec tax (18-175x vs a
native decoder, BENCH_sf1.md r10 seam note) and name the swap seam as
the single ``decode_*`` call inside the mapInPandas stage. This module
IS that swap for JPEG (VERDICT r10 item 7): a persistent JVM sidecar
per Python worker running ``javax.imageio``'s JPEG reader (the same
decoder that generated the conformance fixtures), speaking a
length-prefixed pipe protocol. The stage contract is untouched — same
``(height, width, n_components, rows)`` return as
:func:`..jpeg.decode_jpeg`, same mapInPandas batching — so flipping
``SPARK_GRAFT_JPEG_DECODER=imageio`` changes the codec, never the plan.

Determinism note: ImageIO and jpeg.py agree BIT-EXACTLY on DC-only
blocks (the IDCT of a constant is exact in every conforming
implementation), which is the entire registered-query corpus — so the
driver hash is identical under either decoder. General AC-bearing
JPEGs differ within IDCT rounding (|diff| <= 2, the same tolerance the
JDK conformance fixtures are pinned at); the parity test asserts both
properties.

Reference parity: the reference (SD2E/pipelinejobs-indexer,
reactor.py:16-213) catalogs uploads opaquely; codec choice is an
engine-side concern with no reference analog.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct
import subprocess
import tempfile

_JAVA_SRC = r"""
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.ByteArrayInputStream;
import java.io.DataInputStream;
import java.io.DataOutputStream;
import java.io.EOFException;
import java.io.IOException;
import java.util.Iterator;
import javax.imageio.ImageIO;
import javax.imageio.ImageReader;
import javax.imageio.stream.ImageInputStream;

public class JpegPipe {
    // One decoded image, fully assembled in memory BEFORE any response
    // byte is written: an exception mid-assembly (e.g. an out-of-range
    // palette index in a malformed stream) must produce a clean error
    // frame, never a half-written success frame that desyncs the pipe
    // and deadlocks the Python worker (r12 review finding).
    static final class Frame {
        final int h, w, nc, indexed;
        final byte[] payload;
        Frame(int h, int w, int nc, int indexed, byte[] payload) {
            this.h = h; this.w = w; this.nc = nc;
            this.indexed = indexed; this.payload = payload;
        }
    }

    static Frame assemble(BufferedImage img) throws IOException {
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        // Palette-indexed images (GIF, palette PNG/TIFF, bilevel
        // TIFF) expand through the color map to RGB here — the
        // raster's raw samples are palette INDICES, which no
        // pure decoder contract exposes. The indexed flag lets
        // the Python wrappers restate format conventions
        // (e.g. collapse a gray palette back to one channel for
        // the TIFF BlackIsZero contract).
        if (img.getColorModel() instanceof IndexColorModel) {
            IndexColorModel icm = (IndexColorModel) img.getColorModel();
            int msz = icm.getMapSize();
            byte[] pr = new byte[msz], pg = new byte[msz],
                   pb = new byte[msz];
            icm.getReds(pr); icm.getGreens(pg); icm.getBlues(pb);
            byte[] payload = new byte[h * w * 3];
            int[] idx = new int[w];
            for (int y = 0; y < h; y++) {
                r.getPixels(0, y, w, 1, idx);
                for (int x = 0; x < w; x++) {
                    int i = idx[x];
                    if (i < 0 || i >= msz)
                        throw new IOException(
                            "palette index " + i + " outside "
                            + msz + "-entry color map");
                    int o = (y * w + x) * 3;
                    payload[o] = pr[i];
                    payload[o + 1] = pg[i];
                    payload[o + 2] = pb[i];
                }
            }
            return new Frame(h, w, 3, 1, payload);
        }
        int nc = r.getNumBands();
        // the pipe carries 8-bit samples; deeper images
        // (16-bit gray TIFF) must error loudly, never
        // truncate — callers fall back to the pure decoder
        for (int b = 0; b < nc; b++)
            if (img.getColorModel().getComponentSize(b) > 8)
                throw new IOException(
                    ">8-bit samples unsupported by pipe");
        byte[] payload = new byte[h * w * nc];
        // raster band order follows the color model's
        // component order (band 0 = R even in 3BYTE_BGR
        // storage), and raw samples skip any colorspace
        // conversion for grayscale
        int[] px = new int[w * nc];
        for (int y = 0; y < h; y++) {
            r.getPixels(0, y, w, 1, px);
            for (int i = 0; i < w * nc; i++)
                payload[y * w * nc + i] = (byte) px[i];
        }
        return new Frame(h, w, nc, 0, payload);
    }

    static void writeFrame(DataOutputStream out, Frame f)
            throws IOException {
        out.writeInt(f.h); out.writeInt(f.w);
        out.writeInt(f.nc); out.writeInt(f.indexed);
        out.write(f.payload);
    }

    public static void main(String[] args) throws Exception {
        ImageIO.setUseCache(false);
        DataInputStream in =
            new DataInputStream(new BufferedInputStream(System.in));
        DataOutputStream out =
            new DataOutputStream(new BufferedOutputStream(System.out));
        while (true) {
            int n;
            try { n = in.readInt(); } catch (EOFException e) { break; }
            if (n == 0 || n == Integer.MIN_VALUE) break;
            // negative length = multi-page request (round 13): decode
            // EVERY image in the stream via ImageReader.read(i) and
            // respond with a page count followed by one frame per page
            // — same wire format per frame, so single-image callers
            // are untouched.
            boolean multi = n < 0;
            if (multi) n = -n;
            byte[] buf = new byte[n];
            in.readFully(buf);
            try {
                if (multi) {
                    ImageInputStream iis = ImageIO.createImageInputStream(
                        new ByteArrayInputStream(buf));
                    Iterator<ImageReader> it = ImageIO.getImageReaders(iis);
                    if (!it.hasNext())
                        throw new IOException("unreadable image");
                    ImageReader rd = it.next();
                    try {
                        rd.setInput(iis, false, true);
                        int np = rd.getNumImages(true);
                        // assemble ALL pages before the first byte out
                        Frame[] frames = new Frame[np];
                        for (int i = 0; i < np; i++)
                            frames[i] = assemble(rd.read(i));
                        out.writeInt(np);
                        for (Frame f : frames) writeFrame(out, f);
                    } finally {
                        rd.dispose(); iis.close();
                    }
                } else {
                    BufferedImage img =
                        ImageIO.read(new ByteArrayInputStream(buf));
                    if (img == null)
                        throw new IOException("unreadable image");
                    writeFrame(out, assemble(img));
                }
            } catch (IOException | RuntimeException e) {
                byte[] msg = String.valueOf(e).getBytes("UTF-8");
                out.writeInt(-1); out.writeInt(msg.length); out.write(msg);
            }
            out.flush();
        }
    }
}
"""


def _class_dir() -> str:
    """Compile the sidecar once per (source, host): the class file is
    cached under a source-hash temp dir shared by every Python worker
    process on the machine. Compilation races are resolved by ATOMIC
    PUBLICATION, not by idempotent bytes: javac does not write class
    files atomically, so a worker could `java -cp` a truncated file
    mid-write (ADVICE r11). Each process therefore compiles into its
    own private staging dir and os.rename()s the finished class file
    into the shared cache — rename is atomic on POSIX, so readers see
    either no file (and compile themselves) or a complete one."""
    tag = hashlib.md5(_JAVA_SRC.encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_jpegpipe_{tag}")
    cls = os.path.join(d, "JpegPipe.class")
    if os.path.exists(cls):
        return d
    if shutil.which("javac") is None:
        raise RuntimeError(
            "SPARK_GRAFT_JPEG_DECODER=imageio needs a JDK (javac) on every "
            "worker host; none found on PATH"
        )
    os.makedirs(d, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="jpegpipe_build_", dir=d)
    try:
        src = os.path.join(stage, "JpegPipe.java")
        with open(src, "w") as fh:
            fh.write(_JAVA_SRC)
        subprocess.run(
            ["javac", "-d", stage, src],
            check=True, capture_output=True, timeout=120,
        )
        # atomic publish: same filesystem (stage is inside d), so the
        # rename can never expose a partially-written class file.
        # Nested classes (JpegPipe$Frame) publish FIRST and the main
        # class LAST — readers key existence on JpegPipe.class, so a
        # visible main class implies its whole closure is in place.
        produced = sorted(
            f for f in os.listdir(stage) if f.endswith(".class")
        )
        for f in produced:
            if f != "JpegPipe.class":
                os.replace(os.path.join(stage, f), os.path.join(d, f))
        os.replace(os.path.join(stage, "JpegPipe.class"), cls)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return d


_PROC: subprocess.Popen | None = None


def _pipe() -> subprocess.Popen:
    global _PROC
    if _PROC is None or _PROC.poll() is not None:
        _PROC = subprocess.Popen(
            ["java", "-cp", _class_dir(), "JpegPipe"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
    return _PROC


def _read_exact(fh, n: int) -> bytes:
    chunks = []
    while n:
        b = fh.read(n)
        if not b:
            raise RuntimeError("JpegPipe sidecar closed mid-response")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _decode_raw(data: bytes) -> tuple[int, int, int, int, bytes]:
    """One pipe round-trip: (height, width, n_components, indexed,
    raw interleaved samples). ``indexed`` is 1 when the source was a
    palette image the sidecar expanded to RGB; failures raise
    ValueError."""
    if not data:
        # length 0 is the pipe's shutdown sentinel — sending it would
        # kill the shared sidecar and surface as an uncatchable
        # RuntimeError instead of the seam-visible ValueError
        raise ValueError("empty image payload")
    p = _pipe()
    p.stdin.write(struct.pack(">i", len(data)))
    p.stdin.write(data)
    p.stdin.flush()
    (h,) = struct.unpack(">i", _read_exact(p.stdout, 4))
    if h < 0:
        (mlen,) = struct.unpack(">i", _read_exact(p.stdout, 4))
        msg = _read_exact(p.stdout, mlen).decode("utf-8", "replace")
        raise ValueError(f"ImageIO decode failed: {msg}")
    w, nc, indexed = struct.unpack(">iii", _read_exact(p.stdout, 12))
    raw = _read_exact(p.stdout, h * w * nc)
    return h, w, nc, indexed, raw


def _decode_raw_pages(data: bytes) -> list[tuple[int, int, int, int, bytes]]:
    """Multi-page pipe round-trip (round 13, VERDICT r12 item 5): a
    NEGATIVE length prefix asks the sidecar to iterate every image in
    the stream (ImageReader.getNumImages/read(i)); the response is a
    page count followed by one standard frame per page. Failures raise
    ValueError, same as the single-image path."""
    if not data:
        raise ValueError("empty image payload")
    p = _pipe()
    p.stdin.write(struct.pack(">i", -len(data)))
    p.stdin.write(data)
    p.stdin.flush()
    (np_,) = struct.unpack(">i", _read_exact(p.stdout, 4))
    if np_ < 0:
        (mlen,) = struct.unpack(">i", _read_exact(p.stdout, 4))
        msg = _read_exact(p.stdout, mlen).decode("utf-8", "replace")
        raise ValueError(f"ImageIO decode failed: {msg}")
    pages = []
    for _ in range(np_):
        h, w, nc, indexed = struct.unpack(
            ">iiii", _read_exact(p.stdout, 16)
        )
        raw = _read_exact(p.stdout, h * w * nc)
        pages.append((h, w, nc, indexed, raw))
    return pages


def _rows(h: int, w: int, nc: int, raw: bytes):
    if nc == 1:
        return [list(raw[y * w : (y + 1) * w]) for y in range(h)]
    return [
        [
            tuple(raw[(y * w + x) * nc : (y * w + x) * nc + nc])
            for x in range(w)
        ]
        for y in range(h)
    ]


def decode_jpeg_native(data: bytes):
    """ImageIO-decoded twin of :func:`..jpeg.decode_jpeg` — identical
    return contract: (height, width, n_components, rows), rows of ints
    (grayscale) or (r, g, b) tuples; decode failures raise ValueError."""
    h, w, nc, _indexed, raw = _decode_raw(data)
    return h, w, nc, _rows(h, w, nc, raw)


def decode_png_native(data: bytes):
    """ImageIO twin of :func:`..png.decode_png`: HxWxC uint8 array.
    Contract alignment is structural: gray PNG -> 1 band, gray+alpha ->
    2, RGB -> 3, RGBA -> 4, palette -> sidecar-expanded RGB — exactly
    the pure decoder's channel table. PNG is lossless, so parity is
    BIT-EXACT (pinned in tests/test_native_jpeg.py)."""
    import numpy as np

    h, w, nc, indexed, raw = _decode_raw(data)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
    # the JDK reads sub-8-bit GRAYSCALE PNGs through a gray
    # IndexColorModel (expanded to RGB by the sidecar), but the pure
    # contract keeps those 1-channel; PNG's IHDR color type byte
    # (offset 25: 0 = gray, 3 = palette) disambiguates exactly
    if indexed and nc == 3 and len(data) > 25 and data[25] == 0:
        # explicit raise, not assert: workers under python -O strip
        # asserts, and the seam contract is raise-loudly, never
        # silently-wrong pixels (r12 review finding)
        if not (
            (arr[:, :, 0] == arr[:, :, 1]).all()
            and (arr[:, :, 0] == arr[:, :, 2]).all()
        ):
            raise ValueError("gray PNG expanded to non-gray RGB")
        arr = arr[:, :, :1]
    return arr


def decode_gif_native(data: bytes):
    """ImageIO twin of :func:`..gif.decode_gif`: first frame as an
    HxWx3 uint8 RGB array (GIF is always palette-coded, so the sidecar
    expands through the color table; lossless -> bit-exact parity)."""
    import numpy as np

    h, w, nc, _indexed, raw = _decode_raw(data)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
    if nc == 1:  # defensive: a gray-stored GIF still owes RGB
        arr = np.repeat(arr, 3, axis=2)
    return arr


def _tiff_photometric(data: bytes) -> int | None:
    """PhotometricInterpretation (tag 262) from the FIRST IFD, read off
    the raw stream — the channel-collapse decision must key on the
    file's declared color model, not on decoded pixel content (r12
    review finding: an all-gray PALETTE image would otherwise collapse
    to 1 channel while the pure decoder keeps photometric-3 streams
    3-channel). Classic TIFF only (BigTIFF never reaches the pipe);
    None when the header or tag is absent. Delegates to the per-page
    chain walker so the tag-262 entry parsing lives once."""
    pms = _tiff_photometrics(data, max_pages=1)
    return pms[0] if pms else None


def decode_tiff_native(data: bytes):
    """ImageIO twin of :func:`..tiff.decode_tiff` (first IFD): (height,
    width, n_components, rows). The JDK reader hands palette/bilevel
    TIFFs back as IndexColorModel images; the sidecar expands those to
    RGB. Whether they collapse back to one channel keys on the
    stream's DECLARED photometric (tag 262): bilevel/gray (0/1)
    streams owe the pure decoder's 1-channel BlackIsZero contract
    (WhiteIsZero inversion is already encoded in the JDK's palette, so
    values agree bit-exactly, and a non-gray expansion raises loudly);
    palette streams (3) stay 3-channel even when every referenced
    entry happens to be gray, exactly as the pure decoder keeps them.
    Not supported by the JDK reader (BigTIFF, >8-bit samples):
    ValueError — callers keep the pure decoder for those streams."""
    h, w, nc, indexed, raw = _decode_raw(data)
    if indexed and nc == 3 and _tiff_photometric(data) in (0, 1):
        if any(
            raw[i] != raw[i + 1] or raw[i] != raw[i + 2]
            for i in range(0, len(raw), 3)
        ):
            raise ValueError(
                "bilevel/gray TIFF expanded to non-gray RGB"
            )
        return h, w, 1, _rows(h, w, 1, raw[::3])
    return h, w, nc, _rows(h, w, nc, raw)


def _tiff_photometrics(data: bytes, max_pages: int = 256) -> list:
    """PhotometricInterpretation (tag 262) for EVERY IFD in the chain —
    the per-page mate of :func:`_tiff_photometric`, needed because a
    multi-page TIFF may mix palette and bilevel pages and the channel
    collapse keys on each page's DECLARED color model. Classic TIFF
    only; a page with no/odd-typed tag yields None at its slot."""
    from .tiff import _parse_header

    try:
        bo, big, ifd_off = _parse_header(data)
    except (ValueError, struct.error):
        return []
    if big:
        return []
    out: list = []
    seen = set()
    try:
        while ifd_off and ifd_off not in seen and len(out) < max_pages:
            seen.add(ifd_off)
            (cnt,) = struct.unpack_from(bo + "H", data, ifd_off)
            pm = None
            for k in range(cnt):
                off = ifd_off + 2 + 12 * k
                tag, typ = struct.unpack_from(bo + "HH", data, off)
                if tag == 262:
                    if typ == 3:
                        pm = struct.unpack_from(bo + "H", data, off + 8)[0]
                    elif typ == 4:
                        pm = struct.unpack_from(bo + "I", data, off + 8)[0]
                    break
            out.append(pm)
            (ifd_off,) = struct.unpack_from(
                bo + "I", data, ifd_off + 2 + 12 * cnt
            )
    except struct.error:
        return out
    return out


def decode_tiff_pages_native(data: bytes) -> list:
    """ImageIO twin of :func:`..tiff.decode_tiff_pages` (round 13): one
    (height, width, n_components, rows) tuple per IFD, with the same
    per-page channel-collapse rule as :func:`decode_tiff_native` keyed
    on each page's OWN declared photometric. Streams the JDK reader
    lacks (BigTIFF, >8-bit samples) raise ValueError — callers keep
    the pure decoder for those."""
    pages = _decode_raw_pages(data)
    if len(pages) > 256:
        # mirror decode_tiff_pages' corruption bound so the seam never
        # silently does MORE work than the pure contract allows
        raise ValueError("TIFF IFD chain exceeds 256 pages")
    pms = _tiff_photometrics(data)
    if len(pms) < len(pages):
        # the chain walk stopped early (cap/struct error) while the JDK
        # decoded further: the channel-collapse decision would have to
        # guess — raise loudly rather than silently diverge from the
        # pure decoder (the seam's no-silent-divergence contract; the
        # BigTIFF case never reaches here, callers sniff it to pure)
        raise ValueError(
            f"TIFF IFD chain yields {len(pms)} photometric slots for "
            f"{len(pages)} decoded pages"
        )
    out = []
    for i, (h, w, nc, indexed, raw) in enumerate(pages):
        pm = pms[i]
        if indexed and nc == 3 and pm in (0, 1):
            if any(
                raw[j] != raw[j + 1] or raw[j] != raw[j + 2]
                for j in range(0, len(raw), 3)
            ):
                raise ValueError(
                    "bilevel/gray TIFF expanded to non-gray RGB"
                )
            out.append((h, w, 1, _rows(h, w, 1, raw[::3])))
        else:
            out.append((h, w, nc, _rows(h, w, nc, raw)))
    return out


def shutdown() -> None:
    """Terminate the sidecar (tests; workers just let it die with the
    process — stdin EOF ends the Java loop)."""
    global _PROC
    if _PROC is not None:
        try:
            _PROC.stdin.close()
            _PROC.wait(timeout=10)
        except Exception:
            _PROC.kill()
        _PROC = None
