"""Cross-decoder validation against an INDEPENDENT codec lineage
(r9 VERDICT item 8): the checked-in fixtures under
``tests/fixtures/imageio/`` were produced by OpenJDK 17's
``javax.imageio`` (libjpeg-derived JPEG writer incl. progressive mode;
its own PNG/BMP/GIF encoders) via ``tools/fixtures/ImageIOFixture.java``
— regenerate with::

    cd tools/fixtures && javac -encoding UTF-8 ImageIOFixture.java \
        && java ImageIOFixture gen ../../tests/fixtures/imageio

Until r10, every multimodal payload was produced by our OWN encoders, so
a matched encoder/decoder bug pair could hide. These tests pin:

- PNG / BMP / GIF: ImageIO-encoded gradient decodes EXACTLY to the
  arithmetic pattern (proves the inflate/unfilter, BITMAPINFOHEADER
  walk, and GIF-LZW paths against a foreign encoder).
- Baseline AND progressive JPEG of a block-constant image: our decode
  is BIT-IDENTICAL to ImageIO's own decode dump (DC-only blocks at
  quality 1.0 are exact).
- AC-rich gradient JPEGs: within the T.81 +-1 IDCT tolerance of
  ImageIO's decode, and our baseline/progressive decodes agree with
  EACH OTHER exactly (both entropy paths reconstruct the same
  coefficients from two independent foreign bitstreams — this is the
  external check of the progressive scan reassembly,
  llmdata/jpeg.py's spectral-selection + refinement machinery).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

FIX = Path(__file__).parent / "fixtures" / "imageio"


def _pattern() -> np.ndarray:
    y = np.arange(32)[:, None]
    x = np.arange(48)[None, :]
    return ((7 * y + 13 * x) % 256).astype(np.uint8)


def _dump(name: str) -> np.ndarray:
    raw = (FIX / name).read_bytes()
    nl = raw.index(b"\n")
    h, w = map(int, raw[:nl].split())
    return np.frombuffer(raw[nl + 1 :], dtype=np.uint8).reshape(h, w)


def test_png_bmp_gif_decode_foreign_encoders_exactly():
    from n2khab_mhq_data_spark.llmdata.bmp import decode_bmp
    from n2khab_mhq_data_spark.llmdata.gif import decode_gif
    from n2khab_mhq_data_spark.llmdata.multimodal import decode_png

    want = _pattern()
    assert np.array_equal(decode_png((FIX / "pattern.png").read_bytes()), want)
    assert np.array_equal(decode_bmp((FIX / "pattern.bmp").read_bytes()), want)
    assert np.array_equal(decode_gif((FIX / "pattern.gif").read_bytes()), want)


def test_interlaced_png_and_tiff_foreign_encoders_exactly():
    """r11: the Adam7 fixture exercises what our own encoder cannot —
    ImageIO's PNG writer picks REAL adaptive filters per pass (our
    encoder always writes filter 0), so every per-pass unfilter path is
    crossed against a foreign bitstream; the TIFF fixture is ImageIO's
    own big-endian tag layout (incl. tags our baseline walk must skip,
    e.g. RATIONAL resolutions), not our encoder's."""
    from n2khab_mhq_data_spark.llmdata.multimodal import decode_png
    from n2khab_mhq_data_spark.llmdata.tiff import decode_tiff

    want = _pattern()
    raw = (FIX / "pattern_interlaced.png").read_bytes()
    assert raw[8 + 8 + 12] == 1  # IHDR interlace flag: Adam7 for real
    assert np.array_equal(decode_png(raw), want)
    assert np.array_equal(decode_tiff((FIX / "pattern.tif").read_bytes()), want)


def _our_jpeg(name: str) -> np.ndarray:
    from n2khab_mhq_data_spark.llmdata.jpeg import decode_jpeg

    img = decode_jpeg((FIX / name).read_bytes())
    return img[0] if isinstance(img, tuple) else img


def test_jpeg_block_constant_bit_identical_to_imageio():
    for name in ("baseline", "progressive"):
        ours = _our_jpeg(f"{name}.jpg")
        theirs = _dump(f"{name}.dump")
        assert np.array_equal(ours, theirs), name


def test_jpeg_ac_rich_within_idct_tolerance_and_paths_agree():
    base = _our_jpeg("baseline_ac.jpg")
    prog = _our_jpeg("progressive_ac.jpg")
    # the two FOREIGN bitstreams carry the same quantized coefficients;
    # our two entropy paths must reconstruct them identically
    assert np.array_equal(base, prog)
    for ours, name in ((base, "baseline_ac"), (prog, "progressive_ac")):
        theirs = _dump(f"{name}.dump")
        d = np.abs(ours.astype(int) - theirs.astype(int))
        assert d.max() <= 1, (name, int(d.max()))
        assert (d > 0).mean() < 0.05, (name, float((d > 0).mean()))
