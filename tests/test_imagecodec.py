"""Dependency-free BMP/PNG codecs + real-decode multimodal operators.

The decode scope mirrors the reference's raster responsibility
(/root/reference/crates/server/src/generation.rs:276-305) without PIL:
round-trips, every PNG scanline filter, and the operator-level contract
that the pipeline's stats come from real pixels."""

import struct
import zlib

import numpy as np
import pytest

from engine.ops.imagecodec import (
    PNG_MAGIC,
    _chunk,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    resize_nearest,
    sniff_format,
    to_gray,
)

SF = "/root/testdata/sf0.001"


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_bmp_roundtrip_various_widths():
    # widths 1..5 exercise every 4-byte row-padding case
    for w in range(1, 6):
        rgb = _rand((7, w, 3), seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)


def test_png_roundtrip_rgb_and_gray():
    rgb = _rand((23, 31, 3))
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = _rand((9, 13))
    out = decode_png(encode_png(gray))
    assert out.shape == (9, 13, 3)
    assert all(np.array_equal(out[:, :, c], gray) for c in range(3))


def _forward_filter_png(img: np.ndarray, ftypes) -> bytes:
    """Spec-direction PNG encoder applying the given filter types per
    row — the decoder must reverse every one of them."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    out = np.zeros((h, 1 + stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out[y, 0] = ft
        row = flat[y]
        f = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                    4: paeth(int(a), int(b), int(c))}[ft]
            f[x] = (row[x] - pred) % 256
        out[y, 1:] = f
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(out.tobytes()))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_unfilters_every_filter_type(ftypes):
    img = _rand((10, 9, 3), seed=sum(ftypes) + 1)
    assert np.array_equal(decode_png(_forward_filter_png(img, ftypes)), img)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")
    # 16-bit PNG must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\0" * 26)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad)
    assert sniff_format(b"junk") is None


def test_image_metadata_decodes_real_pixels():
    """The operator's byte_mean must equal the gray mean of the actual
    decoded raster — recomputed here independently per payload."""
    from engine.ops.multimodal import encode_real_images, image_metadata

    meta = (
        image_metadata(SF).to_pandas().set_index("doc_id").sort_index()
    )
    assert meta["decode_ok"].all()
    imgs = encode_real_images(SF).to_pandas().set_index("doc_id")
    for doc_id in list(meta.index[:25]):
        rgb = decode_image(imgs.loc[doc_id, "image"])
        h, w = rgb.shape[:2]
        assert (meta.loc[doc_id, "width"], meta.loc[doc_id, "height"]) == (w, h)
        assert meta.loc[doc_id, "byte_mean"] == round(
            float(to_gray(rgb).mean()), 6
        )
    assert set(imgs["mime"]) == {"image/bmp", "image/png", "image/jpeg"}


def test_image_resize_resamples_real_pixels():
    from engine.ops.multimodal import encode_real_images
    from engine.ops.multimodal import ResizeImage

    imgs = encode_real_images(SF).to_pandas()
    big = imgs[imgs[["width", "height"]].max(axis=1) > 64].head(5)
    stage = ResizeImage(max_side=64)
    for _, row in big.iterrows():
        payload, _mime, nw, nh, scaled = stage._resize_one(
            row["image"], row["mime"]
        )
        assert scaled and max(nw, nh) <= 64
        rgb = decode_image(payload)  # output re-encodes losslessly
        assert rgb.shape[:2] == (nh, nw)
        src = decode_image(row["image"])
        assert np.array_equal(rgb, resize_nearest(src, nw, nh))


def test_phash_identical_rasters_collide_distinct_differ():
    from engine.ops.multimodal import PerceptualHash, encode_real_images

    imgs = encode_real_images(SF).to_pandas()
    stage = PerceptualHash()
    out = stage(
        __import__("pyarrow").table(
            {
                "doc_id": imgs["doc_id"].head(40),
                "image": imgs["image"].head(40),
            }
        )
    ).to_pandas()
    assert out["decode_ok"].all()
    # the raster is a pure function of text: same text <-> same phash
    texts = (
        __import__("pyarrow.parquet", fromlist=["pq"])
        .read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    joined = out.set_index("doc_id").join(texts)
    per_text = joined.groupby("text")["phash"].nunique()
    assert (per_text == 1).all()


# ---------------------------------------------------------------------------
# baseline JPEG (jpegcodec.py)
# ---------------------------------------------------------------------------

def test_jpeg_roundtrip_solid_and_gradient():
    """Solid color decodes near-exactly (DC-only blocks); a smooth
    gradient at q90 stays within a few LSB — both at 4:4:4 and 4:2:0,
    including odd (non-MCU-multiple) dimensions."""
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    solid = np.full((24, 40, 3), [90, 160, 210], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=95))
    assert np.abs(out.astype(int) - solid.astype(int)).max() <= 1

    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    for subsample in (1, 2):
        out = decode_jpeg(encode_jpeg(grad, quality=90, subsample=subsample))
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - grad.astype(int))
        assert err.max() <= 8 and err.mean() < 2


def test_jpeg_grayscale_and_restart_intervals():
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:53]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert (out[:, :, 0] == out[:, :, 2]).all()

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    # RSTn markers + DC-predictor resets must not change the pixels
    a = decode_jpeg(encode_jpeg(img, 85, 2, restart_interval=3))
    b = decode_jpeg(encode_jpeg(img, 85, 2))
    assert (a == b).all()


def test_jpeg_rejects_unsupported_modes():
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="magic"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # flip SOF0 -> SOF2 (progressive): must refuse loudly
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(data))
    # quality 100 (all-1 quant) on a worst-case block must still encode
    checker = (np.indices((16, 16)).sum(0) % 2 * 255).astype(np.uint8)
    decode_jpeg(encode_jpeg(checker, quality=100))


def test_progressive_jpeg_matches_baseline_bit_identical():
    """The 4-phase SOF2 progression transmits every coefficient bit, so
    progressive decode must be BIT-IDENTICAL to decoding the baseline
    encoding of the same image at the same quality — covering DC first,
    DC refinement, AC first (EOB runs), and AC refinement paths."""
    from engine.ops.jpegcodec import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    # gradient + noise exercises long zero runs, +-1 coefficients (the
    # newly-nonzero refine path), and large coefficients (ZRL + BR bits)
    grad = (
        np.indices((41, 53)).sum(0) * 2 % 256
    ).astype(np.uint8)
    noisy = np.clip(
        grad.astype(int) + rng.integers(-40, 40, grad.shape), 0, 255
    ).astype(np.uint8)
    rgb = np.stack([grad, noisy, grad[::-1]], axis=2).astype(np.uint8)

    for img, subsample in [
        (grad, 1), (noisy, 1), (rgb, 1), (rgb, 2),
    ]:
        for quality in (50, 90):
            base = decode_jpeg(encode_jpeg(img, quality, subsample)
                               if img.ndim == 3
                               else encode_jpeg(img, quality))
            prog_bytes = (
                encode_jpeg_progressive(img, quality, subsample)
                if img.ndim == 3
                else encode_jpeg_progressive(img, quality)
            )
            assert prog_bytes[3] == 0xE0  # APP0 after SOI
            assert b"\xff\xc2" in prog_bytes  # SOF2 marker present
            prog = decode_jpeg(prog_bytes)
            assert (prog == base).all(), (img.shape, subsample, quality)


def test_progressive_jpeg_edge_dimensions():
    """Non-interleaved AC-scan block math (bw_ni/bh_ni ceil over the
    component's own sample dims) is the riskiest progressive path —
    differential-check progressive == baseline on awkward shapes: tiny,
    sub-block, odd, and exactly-one-off-MCU sizes, 4:4:4 and 4:2:0."""
    from engine.ops.jpegcodec import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    for hh, ww in [(1, 1), (5, 7), (8, 9), (16, 17), (31, 24), (33, 32)]:
        gray = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
        a = decode_jpeg(encode_jpeg(gray, 80))
        b = decode_jpeg(encode_jpeg_progressive(gray, 80))
        assert (a == b).all(), ("gray", hh, ww)
        rgb = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
        for sub in (1, 2):
            a = decode_jpeg(encode_jpeg(rgb, 80, sub))
            b = decode_jpeg(encode_jpeg_progressive(rgb, 80, sub))
            assert (a == b).all(), ("rgb", hh, ww, sub)


def test_progressive_jpeg_restart_intervals():
    """Restart markers inside progressive scans (DRI + RSTn every N
    MCUs / data units, per-segment DC-predictor and EOB-run reset) must
    not change a single pixel vs the restart-free progressive stream
    or the baseline stream."""
    from engine.ops.jpegcodec import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (33, 26, 3), dtype=np.uint8)
    for sub in (1, 2):
        base = decode_jpeg(encode_jpeg(rgb, 80, sub))
        plain = encode_jpeg_progressive(rgb, 80, sub)
        rst = encode_jpeg_progressive(rgb, 80, sub, restart_interval=3)
        assert b"\xff\xdd" in rst and rst.count(b"\xff\xd0") >= 1
        assert len(rst) > len(plain)  # markers actually present
        a = decode_jpeg(rst)
        assert (a == decode_jpeg(plain)).all()
        assert (a == base).all()


def test_progressive_12bit_matches_sequential():
    """12-bit PROGRESSIVE (SOF2 + precision 12): both encoders transmit
    every coefficient bit, so progressive decode must be bit-identical
    to the 12-bit extended-sequential decode of the same image."""
    from engine.ops.jpegcodec import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(9)
    img12 = rng.integers(0, 4096, (25, 34), dtype=np.uint16)
    seq = decode_jpeg(encode_jpeg(img12, quality=92, precision=12))
    data = encode_jpeg_progressive(img12, quality=92, precision=12)
    assert data[data.find(b"\xff\xc2") + 4] == 12
    prog = decode_jpeg(data)
    assert (prog == seq).all()


def test_progressive_jpeg_multiscan_structure():
    """A progressive file carries >= 4 SOS scans; decode also survives
    the pipeline dispatch path (sniff -> decode_image)."""
    from engine.ops.jpegcodec import encode_jpeg_progressive

    rgb = np.full((24, 17, 3), 130, np.uint8)
    rgb[4:12, 3:9] = (200, 40, 90)
    data = encode_jpeg_progressive(rgb, quality=85)
    assert data.count(b"\xff\xda") >= 4
    out = decode_image(data)
    assert out.shape == (24, 17, 3)


def test_jpeg_12bit_extended_sequential_roundtrip():
    """12-bit (SOF1 extended sequential) decode: a smooth 12-bit
    gradient encoded at q95 must decode (scaled to the 8-bit output
    contract) to within quantization error of source>>4; a 12-bit
    stream mislabeled SOF0 must refuse (T.81: baseline is 8-bit only)."""
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img12 = ((xx * 50 + yy * 30) % 4096).astype(np.uint16)
    img12[10:20, 10:20] = 4095  # saturated patch exercises big coefs
    data = encode_jpeg(img12, quality=95, precision=12)
    assert data[data.find(b"\xff\xc1") + 4] == 12  # SOF1, 12-bit
    out = decode_jpeg(data)
    assert out.shape == (40, 48, 3)
    want = (img12 >> 4).astype(np.int64)
    err = np.abs(out[:, :, 0].astype(np.int64) - want)
    # the modulo wrap at 4096 creates one hard edge; median error must
    # be tiny and even the edge-ringing tail bounded
    assert np.median(err) <= 2
    assert err.mean() <= 6

    # value-range and dtype contracts
    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg(np.zeros((8, 8), np.uint8), precision=12)
    with pytest.raises(ValueError, match="4095"):
        encode_jpeg(np.full((8, 8), 5000, np.uint16), precision=12)
    # SOF0 + 12-bit is illegal per T.81 — decoder refuses
    bad = bytearray(data)
    bad[bad.find(b"\xff\xc1") + 1] = 0xC0
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(bad))
    # 16-bit precision stays refused
    bad = bytearray(data)
    bad[bad.find(b"\xff\xc1") + 4] = 16
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad))


def test_jpeg_malformed_input_raises_valueerror():
    """ADVICE r4 (medium): corrupt-but-magic-matching bytes must raise
    ValueError — never struct.error / IndexError — so DecodeImageMeta
    maps them to decode_ok=False instead of crashing the Ray task."""
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.arange(256, dtype=np.uint8).reshape(16, 16))
    # truncated mid-SOF body (formerly struct.error)
    sof = good.find(b"\xff\xc0")
    with pytest.raises(ValueError):
        decode_jpeg(good[: sof + 6])
    # truncated mid-DHT body (formerly IndexError in _build_decode_lut)
    dht = good.find(b"\xff\xc4")
    with pytest.raises(ValueError):
        decode_jpeg(good[: dht + 9])
    # byte-level fuzz: every truncation point must refuse, not crash
    for cut in range(3, len(good), 7):
        try:
            decode_jpeg(good[:cut])
        except ValueError:
            pass
    # garbage tail after magic
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + bytes(range(256)))


def test_jpeg_single_component_subsampled_refuses():
    """A 1-component frame declaring sampling factors >1 is legal T.81
    but uses a NON-interleaved scan; decoding it interleaved would
    scramble pixels silently — the codec must refuse (ADVICE r4)."""
    from engine.ops.jpegcodec import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((16, 16), np.uint8)))
    sof = data.find(b"\xff\xc0")
    # component spec starts at sof+4(marker,len)+6(prec,h,w,ncomp)... id,hv,tq
    hv_off = sof + 2 + 2 + 6 + 1
    assert data[hv_off] == 0x11
    data[hv_off] = 0x22  # claim 2x2 sampling on the only component
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(data))


def test_jpeg_in_image_pipeline_dispatch():
    """sniff + decode_image dispatch JPEG, and the fixture generator
    emits all three mimes with decode_ok everywhere."""
    from engine.ops.imagecodec import sniff_format
    from engine.ops.jpegcodec import encode_jpeg
    from engine.ops.multimodal import image_metadata

    assert sniff_format(encode_jpeg(np.zeros((8, 8), np.uint8))) == "jpeg"
    rgb = np.full((16, 16, 3), 77, np.uint8)
    out = decode_image(encode_jpeg(rgb, quality=95))
    assert np.abs(out.astype(int) - 77).max() <= 1

    meta = image_metadata(SF).to_pandas()
    assert meta["decode_ok"].all()
