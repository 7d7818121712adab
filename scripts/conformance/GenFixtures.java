// Third-party conformance fixture generator (round 10).
//
// Encodes small deterministic images with the JDK's javax.imageio
// codecs (com.sun.imageio plugins: an independent implementation of
// JPEG baseline+progressive, PNG, GIF, and TIFF with CCITT RLE/T.4/T.6,
// LZW, PackBits and Deflate compressions), then reads each file back
// with the same JDK reader and dumps the decoded pixels. The committed
// outputs give the repo's pure-Python decoders (jpeg.py, png.py,
// gif.py, tiff.py, fax.py) external evidence: bytes produced by an
// encoder that shares no code or constants with this repo, with the
// reference decode pinned alongside.
//
// Deterministic by construction: pixel patterns come from an explicit
// LCG (no java.util.Random), so re-running regenerates byte-identical
// inputs (the encoded bytes are whatever this JDK build emits -- they
// are committed, not re-derived, by tests).
//
// Usage: java GenFixtures <output-dir>

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.File;
import java.io.FileOutputStream;
import java.util.ArrayList;
import java.util.Iterator;
import java.util.List;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public class GenFixtures {
    static long lcg = 0x9E3779B97F4A7C15L;

    static int rnd(int bound) {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L;
        return (int) ((lcg >>> 33) % bound);
    }

    static List<String> manifest = new ArrayList<>();
    static File outDir;

    public static void main(String[] args) throws Exception {
        outDir = new File(args[0]);
        outDir.mkdirs();

        // --- lossless: PNG gray + RGB, GIF palette -------------------
        BufferedImage gray = grayImage(33, 21);
        BufferedImage rgb = rgbImage(34, 22);
        writePlain(gray, "png", "gray.png");
        writePlain(rgb, "png", "rgb.png");
        writePlain(palImage(32, 20), "gif", "pal.gif");

        // --- JPEG: baseline + progressive, gray + RGB ----------------
        BufferedImage jgray = smoothGray(33, 21);
        BufferedImage jrgb = smoothRgb(34, 22);
        writeJpeg(jgray, 0.85f, false, "gray_baseline.jpg");
        writeJpeg(jgray, 0.85f, true, "gray_progressive.jpg");
        writeJpeg(jrgb, 0.85f, false, "rgb_baseline.jpg");
        writeJpeg(jrgb, 0.85f, true, "rgb_progressive.jpg");

        // --- TIFF: every codec the repo claims -----------------------
        writeTiff(gray, null, "gray_none.tif");
        writeTiff(gray, "LZW", "gray_lzw.tif");
        writeTiff(gray, "PackBits", "gray_packbits.tif");
        writeTiff(gray, "Deflate", "gray_deflate.tif");
        writeTiff(rgb, "LZW", "rgb_lzw.tif");

        // --- TIFF CCITT fax: bilevel, three codecs x two patterns ----
        BufferedImage faxNoise = bilevelNoise(64, 24);
        BufferedImage faxRuns = bilevelRuns(1728, 12);
        writeTiff(faxNoise, "CCITT RLE", "fax_rle_a.tif");
        writeTiff(faxRuns, "CCITT RLE", "fax_rle_b.tif");
        writeTiff(faxNoise, "CCITT T.4", "fax_g3_a.tif");
        writeTiff(faxRuns, "CCITT T.4", "fax_g3_b.tif");
        writeTiff(faxNoise, "CCITT T.6", "fax_g4_a.tif");
        writeTiff(faxRuns, "CCITT T.6", "fax_g4_b.tif");
        // edge patterns: all-white, all-black, single-pixel columns
        writeTiff(bilevelConst(40, 8, false), "CCITT T.6", "fax_g4_white.tif");
        writeTiff(bilevelConst(40, 8, true), "CCITT T.6", "fax_g4_black.tif");
        writeTiff(bilevelStripes(63, 9), "CCITT T.6", "fax_g4_stripes.tif");

        // round-10 additions: bit-packed (non-fax) bilevel, 4-bit
        // palette TIFF, and tall images the JDK splits into multiple
        // strips (fax reference lines must reset per strip)
        writeTiff(bilevelNoise(61, 18), null, "bilevel_none.tif");
        writeTiff(bilevelNoise(61, 18), "LZW", "bilevel_lzw.tif");
        writeTiff(pal4Image(30, 14), "PackBits", "pal4_packbits.tif");
        writeTiff(grayImage(33, 600), "LZW", "gray_lzw_tall.tif");
        writeTiff(bilevelNoise(64, 2400), "CCITT T.6", "fax_g4_tall.tif");
        writeTiff(bilevelRuns(1728, 200), "CCITT T.4", "fax_g3_tall.tif");

        // round-10 tiled layout (TIFF 6.0 par. 15): every codec family
        // through the tile grid, with edge tiles forcing pad-and-crop
        // and per-tile predictor/bit-packing resets. IMPORTANT: these
        // stay AFTER all earlier pattern calls so the LCG stream that
        // generated the committed fixtures above is unchanged.
        writeTiffTiled(grayImage(70, 45), "LZW", 32, 32, "gray_tiled_lzw.tif");
        writeTiffTiled(rgbImage(70, 45), "PackBits", 32, 16,
                "rgb_tiled_packbits.tif");
        writeTiffTiled(grayImage(50, 20), null, 16, 16, "gray_tiled_none.tif");
        writeTiffTiled(grayImage(40, 30), "Deflate", 32, 16,
                "gray_tiled_deflate.tif");
        writeTiffTiled(bilevelNoise(70, 45), "CCITT T.6", 32, 16,
                "fax_g4_tiled.tif");
        writeTiffTiled(pal4Image(30, 20), "PackBits", 32, 16,
                "pal4_tiled.tif");

        // round-10 multi-page TIFF: one IFD per page chained by the
        // next-IFD pointer (writeToSequence) — gray LZW, bilevel G4,
        // gray PackBits pages in ONE file. Also appended after all
        // earlier pattern calls to keep the LCG stream stable.
        writeTiffMulti(
                new BufferedImage[] {grayImage(33, 21),
                        bilevelNoise(64, 24), grayImage(29, 17)},
                new String[] {"LZW", "CCITT T.6", "PackBits"},
                "multipage.tif");

        // round-10 PNG depth fixtures: 16-bit gray (big-endian sample
        // pairs on the wire), 4-/2-/1-bit bit-packed gray, and a
        // palette PNG — also appended after all earlier pattern calls
        // to keep the LCG stream stable.
        writePlain(gray16Image(21, 13), "png", "gray16.png");
        writePlain(subGrayImage(19, 7, 4), "png", "gray4.png");
        writePlain(subGrayImage(23, 9, 2), "png", "gray2.png");
        writePlain(subGrayImage(61, 18, 1), "png", "gray1.png");
        writePlain(palImage(32, 20), "png", "pal_png.png");

        // round-10 16-bit TIFF (TYPE_USHORT_GRAY): strip + tiled
        writeTiff(gray16Image(25, 11), "LZW", "gray16_lzw.tif");
        writeTiffTiled(gray16Image(40, 30), "PackBits", 16, 16,
                "gray16_tiled.tif");

        // round-10 animated GIF: three frames via writeToSequence
        writeGifAnim(new BufferedImage[] {
                palImage(28, 18), palImage(28, 18), palImage(28, 18)},
                "anim.gif");

        try (FileOutputStream fo =
                new FileOutputStream(new File(outDir, "manifest.json"))) {
            fo.write(("[\n  " + String.join(",\n  ", manifest) + "\n]\n")
                    .getBytes("UTF-8"));
        }
        System.out.println("wrote " + manifest.size() + " fixtures to " + outDir);
    }

    // ---------------------------------------------------------- patterns
    static BufferedImage grayImage(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = (x * 5 + y * 11 + rnd(64)) % 256;
                img.getRaster().setSample(x, y, 0, v);
            }
        return img;
    }

    static BufferedImage rgbImage(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 7 + y * 3 + rnd(64)) % 256;
                int g = (x * 2 + y * 13 + rnd(64)) % 256;
                int b = (x * 11 + y * 5 + rnd(64)) % 256;
                img.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        return img;
    }

    static BufferedImage palImage(int w, int h) {
        byte[] r = new byte[16], g = new byte[16], b = new byte[16];
        for (int i = 0; i < 16; i++) {
            r[i] = (byte) (i * 17);
            g[i] = (byte) (255 - i * 13);
            b[i] = (byte) ((i * 31) % 256);
        }
        IndexColorModel cm = new IndexColorModel(4, 16, r, g, b);
        BufferedImage img = new BufferedImage(
                w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, (x + y * 3 + rnd(4)) % 16);
        return img;
    }

    static BufferedImage pal4Image(int w, int h) {
        // 4-bit palette TIFF: the writer emits BitsPerSample 4 with a
        // 16-entry ColorMap (packed high-nibble-first rows)
        byte[] r = new byte[16], g = new byte[16], b = new byte[16];
        for (int i = 0; i < 16; i++) {
            r[i] = (byte) (i * 13);
            g[i] = (byte) (200 - i * 9);
            b[i] = (byte) ((i * 23) % 256);
        }
        IndexColorModel cm = new IndexColorModel(4, 16, r, g, b);
        BufferedImage img = new BufferedImage(
                w, h, BufferedImage.TYPE_BYTE_BINARY, cm);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, (x * 2 + y + rnd(3)) % 16);
        return img;
    }

    static BufferedImage gray16Image(int w, int h) {
        javax.imageio.ImageTypeSpecifier spec =
                javax.imageio.ImageTypeSpecifier.createGrayscale(
                        16, java.awt.image.DataBuffer.TYPE_USHORT, false);
        BufferedImage img = spec.createBufferedImage(w, h);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0,
                        (x * 2531 + y * 977 + rnd(4096)) % 65536);
        return img;
    }

    static BufferedImage subGrayImage(int w, int h, int bits) {
        javax.imageio.ImageTypeSpecifier spec =
                javax.imageio.ImageTypeSpecifier.createGrayscale(
                        bits, java.awt.image.DataBuffer.TYPE_BYTE, false);
        BufferedImage img = spec.createBufferedImage(w, h);
        int max = (1 << bits) - 1;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0,
                        (x + y * 3 + rnd(max + 1)) % (max + 1));
        return img;
    }

    static BufferedImage smoothGray(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = (int) (128 + 90 * Math.sin(x * 0.35)
                        * Math.cos(y * 0.25));
                img.getRaster().setSample(x, y, 0, Math.max(0, Math.min(255, v)));
            }
        return img;
    }

    static BufferedImage smoothRgb(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (int) (128 + 100 * Math.sin(x * 0.3));
                int g = (int) (128 + 100 * Math.cos(y * 0.2));
                int b = (int) (128 + 80 * Math.sin((x + y) * 0.15));
                img.setRGB(x, y,
                        (clamp(r) << 16) | (clamp(g) << 8) | clamp(b));
            }
        return img;
    }

    static int clamp(int v) { return Math.max(0, Math.min(255, v)); }

    static BufferedImage bilevelNoise(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                // biased-white with clustered runs so T.4/T.6 hits both
                // short terminating codes and mode transitions
                img.getRaster().setSample(x, y, 0,
                        rnd(10) < 7 || (x / (1 + rnd(5))) % 2 == 0 ? 1 : 0);
        return img;
    }

    static BufferedImage bilevelRuns(int w, int h) {
        // long runs: exercises makeup codes (64..2560) on a standard
        // 1728-pel fax line
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < h; y++) {
            int x = 0;
            boolean white = true;
            while (x < w) {
                int run = 1 + rnd(white ? 700 : 300);
                for (int i = 0; i < run && x < w; i++, x++)
                    img.getRaster().setSample(x, y, 0, white ? 1 : 0);
                white = !white;
            }
        }
        return img;
    }

    static BufferedImage bilevelConst(int w, int h, boolean black) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, black ? 0 : 1);
        return img;
    }

    static BufferedImage bilevelStripes(int w, int h) {
        // single-pixel vertical stripes: worst case for vertical-mode
        // coding, every changing element one pel from the reference
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, (x + y) % 2);
        return img;
    }

    // ------------------------------------------------------------ writers
    static void writePlain(BufferedImage img, String fmt, String name)
            throws Exception {
        File f = new File(outDir, name);
        ImageIO.write(img, fmt, f);
        dump(f, name, fmt, false);
    }

    static void writeJpeg(BufferedImage img, float q, boolean progressive,
            String name) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        p.setProgressiveMode(progressive
                ? ImageWriteParam.MODE_DEFAULT
                : ImageWriteParam.MODE_DISABLED);
        File f = new File(outDir, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
        dump(f, name, "jpeg", true);
    }

    static void writeTiffTiled(BufferedImage img, String compression,
            int tw, int tl, String name) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setTilingMode(ImageWriteParam.MODE_EXPLICIT);
        p.setTiling(tw, tl, 0, 0);
        if (compression != null) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        File f = new File(outDir, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
        dump(f, name, "tiff", false);
    }

    static void writeGifAnim(BufferedImage[] imgs, String name)
            throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("gif");
        ImageWriter w = it.next();
        File f = new File(outDir, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.prepareWriteSequence(null);
            for (BufferedImage img : imgs)
                w.writeToSequence(new IIOImage(img, null, null), null);
            w.endWriteSequence();
        }
        w.dispose();
        try (javax.imageio.stream.ImageInputStream is =
                ImageIO.createImageInputStream(f)) {
            javax.imageio.ImageReader r =
                    ImageIO.getImageReaders(is).next();
            r.setInput(is);
            int n = r.getNumImages(true);
            for (int i = 0; i < n; i++)
                dumpImage(r.read(i), name, "gif", false, i);
            r.dispose();
        }
    }

    static void writeTiffMulti(BufferedImage[] imgs, String[] comps,
            String name) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter w = it.next();
        File f = new File(outDir, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.prepareWriteSequence(null);
            for (int i = 0; i < imgs.length; i++) {
                ImageWriteParam p = w.getDefaultWriteParam();
                if (comps[i] != null) {
                    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                    p.setCompressionType(comps[i]);
                }
                w.writeToSequence(new IIOImage(imgs[i], null, null), p);
            }
            w.endWriteSequence();
        }
        w.dispose();
        // read every page back with the JDK reader and dump each one
        try (javax.imageio.stream.ImageInputStream is =
                ImageIO.createImageInputStream(f)) {
            javax.imageio.ImageReader r =
                    ImageIO.getImageReaders(is).next();
            r.setInput(is);
            int n = r.getNumImages(true);
            for (int i = 0; i < n; i++)
                dumpImage(r.read(i), name, "tiff", false, i);
            r.dispose();
        }
    }

    static void writeTiff(BufferedImage img, String compression, String name)
            throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (compression != null) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        File f = new File(outDir, name);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
        dump(f, name, "tiff", false);
    }

    // ---------------------------------------------------------- read-back
    // Read the encoded file back with the JDK reader and dump decoded
    // pixels: gray if the decoded image is single-channel, else RGB
    // interleaved. This dump is the conformance reference the Python
    // tests compare against (exact for lossless, tolerance for JPEG).
    static void dump(File f, String name, String fmt, boolean lossy)
            throws Exception {
        dumpImage(ImageIO.read(f), name, fmt, lossy, -1);
    }

    static void dumpImage(BufferedImage img, String name, String fmt,
            boolean lossy, int page) throws Exception {
        int w = img.getWidth(), h = img.getHeight();
        boolean grayOut = img.getColorModel().getNumComponents() == 1;
        int depth = grayOut ? img.getColorModel().getPixelSize() : 8;
        byte[] pix;
        if (grayOut && depth == 16) {
            // 16-bit gray: dump big-endian 2-byte raw samples; the
            // manifest carries "depth": 16 so the comparison side
            // reshapes uint16
            pix = new byte[w * h * 2];
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int v = img.getRaster().getSample(x, y, 0);
                    pix[(y * w + x) * 2] = (byte) (v >>> 8);
                    pix[(y * w + x) * 2 + 1] = (byte) v;
                }
        } else if (grayOut) {
            // raw raster samples, NOT getRGB: getRGB on TYPE_BYTE_GRAY
            // runs a linear-gray -> sRGB colorspace conversion that
            // would corrupt the reference dump. Bilevel images use an
            // IndexColorModel (getRGB is an exact palette lookup, and
            // honors the photometric the reader reconstructed), so
            // getRGB is right there and raster samples are right for
            // 8-bit gray. Sub-8 gray (2/4-bit, PNG) dumps the linear
            // full-range scaling (v * 255 / (2^d - 1)) — the same
            // exact-integer convention the decoders use.
            boolean bilevel = img.getColorModel().getPixelSize() == 1;
            int scale = depth < 8 ? 255 / ((1 << depth) - 1) : 1;
            pix = new byte[w * h];
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    pix[y * w + x] = (byte) (bilevel
                            ? img.getRGB(x, y) & 0xFF
                            : img.getRaster().getSample(x, y, 0) * scale);
        } else {
            pix = new byte[w * h * 3];
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int v = img.getRGB(x, y);
                    int o = (y * w + x) * 3;
                    pix[o] = (byte) ((v >> 16) & 0xFF);
                    pix[o + 1] = (byte) ((v >> 8) & 0xFF);
                    pix[o + 2] = (byte) (v & 0xFF);
                }
        }
        String base = name.replaceAll("\\.[a-z]+$", "")
                + (page < 0 ? "" : "_p" + page);
        String pixName = base + ".pix";
        try (FileOutputStream fo = new FileOutputStream(new File(outDir, pixName))) {
            fo.write(pix);
        }
        manifest.add(String.format(
                "{\"name\": \"%s\", \"file\": \"%s\", \"pix\": \"%s\", "
                        + "\"format\": \"%s\", \"width\": %d, \"height\": %d, "
                        + "\"channels\": %d, \"lossy\": %s%s%s}",
                base, name, pixName, fmt, w, h,
                grayOut ? 1 : 3, lossy,
                page < 0 ? "" : ", \"page\": " + page,
                (grayOut && depth == 16) ? ", \"depth\": 16" : ""));
    }
}
