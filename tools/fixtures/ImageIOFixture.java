// External codec fixture generator (r9 VERDICT item 8): OpenJDK's
// javax.imageio is an independent codec lineage (libjpeg-derived JPEG
// writer incl. PROGRESSIVE mode, its own PNG/BMP/GIF codecs). It emits
// deterministic test images the pure-Python decoders must agree with,
// and pixel dumps of its own JPEG decodes for cross-decoder comparison.
//
// Usage:
//   java ImageIOFixture gen <outdir>   -- write pattern.{png,bmp,gif,jpg}
//                                        + progressive.jpg + *.dump
//   java ImageIOFixture dump <img> <out.dump>
//                                      -- decode any image, dump gray
//                                        pixels: "h w\n" then h*w bytes
//
// Pattern: 48x32 grayscale, v(y,x) = (7*y + 13*x) % 256 -- and for the
// JPEGs a BLOCK-CONSTANT pattern v8(y,x) = (16*(y/8) + 48*(x/8)) % 256
// whose DC-only blocks survive quantization near-exactly.
import java.awt.image.BufferedImage;
import java.io.*;
import java.util.Iterator;
import javax.imageio.*;
import javax.imageio.stream.ImageOutputStream;

public class ImageIOFixture {
    static final int W = 48, H = 32;

    static BufferedImage gradient() {
        BufferedImage img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                int v = (7 * y + 13 * x) % 256;
                img.getRaster().setSample(x, y, 0, v);
            }
        return img;
    }

    static BufferedImage blocks() {
        BufferedImage img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                int v = (16 * (y / 8) + 48 * (x / 8)) % 256;
                img.getRaster().setSample(x, y, 0, v);
            }
        return img;
    }

    // progressive mode on the PNG writer = Adam7 interlace; on the TIFF
    // writer the default is baseline strips -- both r11 fixture targets
    static void writeProgressive(BufferedImage img, File f, String fmt)
            throws IOException {
        ImageWriter w = ImageIO.getImageWritersByFormatName(fmt).next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }

    static void writeJpeg(BufferedImage img, File f, boolean progressive)
            throws IOException {
        ImageWriter w = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(1.0f);
        if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }

    static void dump(BufferedImage img, File f) throws IOException {
        BufferedImage g = img;
        if (img.getType() != BufferedImage.TYPE_BYTE_GRAY) {
            g = new BufferedImage(img.getWidth(), img.getHeight(),
                    BufferedImage.TYPE_BYTE_GRAY);
            g.getGraphics().drawImage(img, 0, 0, null);
        }
        try (DataOutputStream os = new DataOutputStream(new FileOutputStream(f))) {
            os.writeBytes(g.getHeight() + " " + g.getWidth() + "\n");
            for (int y = 0; y < g.getHeight(); y++)
                for (int x = 0; x < g.getWidth(); x++)
                    os.writeByte(g.getRaster().getSample(x, y, 0));
        }
    }

    public static void main(String[] args) throws IOException {
        if (args[0].equals("dump")) {
            dump(ImageIO.read(new File(args[1])), new File(args[2]));
            return;
        }
        File dir = new File(args[1]);
        dir.mkdirs();
        BufferedImage grad = gradient(), blk = blocks();
        ImageIO.write(grad, "png", new File(dir, "pattern.png"));
        writeProgressive(grad, new File(dir, "pattern_interlaced.png"),
                         "png");
        ImageIO.write(grad, "tiff", new File(dir, "pattern.tif"));
        ImageIO.write(grad, "bmp", new File(dir, "pattern.bmp"));
        ImageIO.write(grad, "gif", new File(dir, "pattern.gif"));
        writeJpeg(blk, new File(dir, "baseline.jpg"), false);
        writeJpeg(blk, new File(dir, "progressive.jpg"), true);
        // AC-rich versions: the gradient exercises the full zigzag
        // band structure (progressive spectral selection + refinement)
        writeJpeg(grad, new File(dir, "baseline_ac.jpg"), false);
        writeJpeg(grad, new File(dir, "progressive_ac.jpg"), true);
        dump(ImageIO.read(new File(dir, "baseline_ac.jpg")),
             new File(dir, "baseline_ac.dump"));
        dump(ImageIO.read(new File(dir, "progressive_ac.jpg")),
             new File(dir, "progressive_ac.dump"));
        // ImageIO's OWN decode of both jpegs -- the cross-decoder truth
        dump(ImageIO.read(new File(dir, "baseline.jpg")),
             new File(dir, "baseline.dump"));
        dump(ImageIO.read(new File(dir, "progressive.jpg")),
             new File(dir, "progressive.dump"));
        System.out.println("fixtures written to " + dir);
    }
}
