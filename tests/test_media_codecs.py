"""Pure-stdlib media codec layer (functions/media_codecs.py).

Verification strategy (no image/audio libraries exist in the container
to compare against):
- round-trips: encode(arr) -> decode == arr for every format;
- cross-format agreement: the same pixels through PNG, BMP and PPM
  decode identically (three independent decoders agree);
- PNG filters 1-4 are exercised via hand-FILTERED scanlines produced
  by an independent reference filterer in this test (the decoder never
  sees its own encoder's filter-0 output for these);
- GIF LZW code-width growth and dictionary reset paths via noise
  images with 256 colors;
- corruption paths raise DecodeError (never wrong pixels).
"""

import struct
import zlib

import numpy as np
import pytest

from atra_spark.functions.media_codecs import (
    DecodeError,
    EncodeError,
    PNG_SIG,
    ahash64,
    block_mean_resize,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_pnm,
    encode_wav,
    mean_luma,
    to_gray,
    to_signed64,
)


def _img(h, w, c=3, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8).astype(np.uint8)


# -- PNG -------------------------------------------------------------------


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip(c):
    arr = _img(13, 17, c, seed=c)
    out = decode_png(encode_png(arr))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, arr)


def test_png_one_pixel():
    arr = np.array([[[1, 2, 3]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(arr)), arr)


def _ref_filter(row, prev, bpp, ftype):
    """Independent reference implementation of PNG FILTERING (the
    forward direction, spec §6) — the decoder must invert it."""
    out = bytearray(len(row))
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            out[x] = (row[x] - a) & 0xFF
        elif ftype == 2:
            out[x] = (row[x] - b) & 0xFF
        elif ftype == 3:
            out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (row[x] - pr) & 0xFF
        else:
            out[x] = row[x]
    return bytes(out)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_filters_decoded(ftype):
    """Build a PNG whose every scanline uses the given filter type,
    filtered by the independent reference above; decode must recover
    the original pixels exactly."""
    arr = _img(9, 7, 3, seed=10 + ftype)
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * 3)
    prev = bytes(w * 3)
    raw = bytearray()
    for y in range(h):
        row = flat[y].tobytes()
        raw.append(ftype)
        raw += _ref_filter(row, prev, 3, ftype)
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), arr)


def test_png_palette():
    """Hand-built color-type-3 PNG: indices map through PLTE."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), pal[idx])


def test_png_corruption_raises():
    good = encode_png(_img(5, 5))
    with pytest.raises(DecodeError):
        decode_png(good[:-7])  # truncated
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip a bit inside IHDR body
    with pytest.raises(DecodeError):
        decode_png(bytes(bad_crc))
    with pytest.raises(DecodeError):
        decode_png(b"\x89PNG\r\n\x1a\nnot a chunk")
    interlaced = bytearray(good)
    # IHDR body starts at offset 16; interlace flag is its last byte
    interlaced[16 + 12] = 1
    body = bytes(interlaced[16 : 16 + 13])
    interlaced[16 + 13 : 16 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(DecodeError, match="interlaced"):
        decode_png(bytes(interlaced))


# -- cross-format agreement -------------------------------------------------


def test_cross_format_agreement():
    arr = _img(11, 19, 3, seed=77)
    a = decode_png(encode_png(arr))
    b = decode_bmp(encode_bmp(arr))
    c = decode_pnm(encode_pnm(arr))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(b, c)
    np.testing.assert_array_equal(c, arr)


# -- BMP --------------------------------------------------------------------


def test_bmp_roundtrip_odd_width():
    # width 5 -> 15-byte rows padded to 16: exercises stride padding
    arr = _img(4, 5, 3, seed=3)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_bmp_topdown():
    arr = _img(3, 4, 3, seed=4)
    data = bytearray(encode_bmp(arr))
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    # negative height = top-down: rows are stored first-row-first, so
    # the decoder must NOT flip; our encoder wrote bottom-up rows, so
    # decoding top-down returns the vertical mirror
    np.testing.assert_array_equal(decode_bmp(bytes(data)), arr[::-1])


def test_bmp_rejects_other_bpp():
    data = bytearray(encode_bmp(_img(2, 2)))
    struct.pack_into("<H", data, 28, 8)
    with pytest.raises(DecodeError):
        decode_bmp(bytes(data))


# -- PNM --------------------------------------------------------------------


def test_pnm_roundtrip_gray_and_rgb():
    g = _img(6, 9, 1, seed=5)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(g)), g)
    c = _img(6, 9, 3, seed=6)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(c)), c)


def test_pnm_comments_in_header():
    arr = _img(2, 3, 3, seed=7)
    data = encode_pnm(arr)
    with_comment = b"P6\n# a comment line\n3 2\n# another\n255\n" + data.split(b"\n255\n", 1)[1]
    np.testing.assert_array_equal(decode_pnm(with_comment), arr)


# -- GIF --------------------------------------------------------------------


def test_gif_roundtrip_small_palette():
    pal = np.array([[0, 0, 0], [255, 255, 255], [128, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 0], [1, 0, 1, 2]], dtype=np.uint8)
    frames, delays = decode_gif(encode_gif(idx, pal))
    assert len(frames) == 1 and delays == [0.0]
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_gif_roundtrip_rgb_auto_palette():
    # 256 distinct colors + 64x64 noise: LZW code width grows past 9
    rng = np.random.RandomState(8)
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)], dtype=np.uint8)
    idx = rng.randint(0, 256, size=(64, 64), dtype=np.uint8).astype(np.uint8)
    arr = pal[idx]
    frames, _ = decode_gif(encode_gif(arr))
    np.testing.assert_array_equal(frames[0], arr)


def test_gif_lzw_dict_reset():
    # big noisy indexed image forces the 4096-entry dictionary reset
    rng = np.random.RandomState(9)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    idx = rng.randint(0, 256, size=(128, 128), dtype=np.uint8).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_gif_multiframe_and_delay():
    """Two frames spliced from two single-frame encodings; the second
    carries a graphic-control delay of 0.25 s."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    f1 = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    f2 = np.array([[1, 1], [0, 0]], dtype=np.uint8)
    g1 = encode_gif(f1, pal)
    g2 = encode_gif(f2, pal)
    # body of an encoded single-frame gif = header(6)+LSD(7)+GCT(k)..frame..trailer
    gct_len = len(pal.tobytes()) + (4 - len(pal)) * 0  # padded to power of two = 2 -> 6 bytes
    # find frame start: first 0x2C after the GCT
    start1 = g1.index(b"\x2c", 13)
    start2 = g2.index(b"\x2c", 13)
    gce = b"\x21\xf9\x04\x00" + struct.pack("<H", 25) + b"\x00\x00"
    spliced = g1[:-1] + gce + g2[start2:-1] + b"\x3b"
    frames, delays = decode_gif(spliced)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[f1])
    np.testing.assert_array_equal(frames[1], pal[f2])
    assert delays == [0.0, 0.25]
    assert start1 > 0  # sanity: frame block located


def test_gif_interlaced():
    """Interlace flag set: rows stored in 4-pass order must come back
    in display order."""
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    h, w = 11, 4
    rng = np.random.RandomState(11)
    disp = rng.randint(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8)
    # storage order = passes over display rows
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8)) + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = disp[order]
    plain = encode_gif(stored, pal)
    data = bytearray(plain)
    # frame descriptor sits right after header(6) + LSD(7) + GCT(768):
    # searching for 0x2C would false-hit palette bytes
    fs = 13 + 768
    assert data[fs] == 0x2C
    data[fs + 9] |= 0x40  # set interlace bit in the image descriptor
    frames, _ = decode_gif(bytes(data))
    np.testing.assert_array_equal(frames[0], pal[disp])


def test_gif_corruption():
    good = encode_gif(_img(8, 8, 3, seed=12) // 32 * 32)  # few colors
    with pytest.raises(DecodeError):
        decode_gif(good[:-5])
    with pytest.raises(DecodeError):
        decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(DecodeError):
        decode_gif(b"NOTGIF" + good[6:])


def test_gif_too_many_colors():
    rng = np.random.RandomState(13)
    arr = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(EncodeError):
        encode_gif(arr)


# -- WAV --------------------------------------------------------------------


def test_wav_roundtrip():
    t = np.arange(8000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, sr = decode_wav(encode_wav(x, 8000))
    assert sr == 8000 and samples.shape == (8000, 1)
    assert float(np.abs(samples[:, 0] - x).max()) < 1.0 / 32000


def test_wav_stereo():
    x = np.stack([np.linspace(-0.9, 0.9, 100), np.linspace(0.9, -0.9, 100)], axis=1)
    samples, sr = decode_wav(encode_wav(x, 44100))
    assert sr == 44100 and samples.shape == (100, 2)


def test_wav_corrupt():
    with pytest.raises(DecodeError):
        decode_wav(b"RIFF" + b"garbage not a wave file")
    with pytest.raises(DecodeError):
        decode_wav(encode_wav(np.zeros(10), 8000)[:-6])


# -- features ---------------------------------------------------------------


def test_block_mean_resize_exact():
    # 16x16 constant blocks -> exact block means regardless of path
    arr = np.kron(np.arange(64, dtype=np.uint8).reshape(8, 8) * 4, np.ones((2, 2), np.uint8))
    cells = block_mean_resize(arr, 8, 8)
    np.testing.assert_allclose(cells, (np.arange(64).reshape(8, 8) * 4).astype(float))


def test_block_mean_resize_uneven():
    # 10x6 image: uneven cell sizes still average exactly
    arr = np.full((10, 6), 7, dtype=np.uint8)
    np.testing.assert_allclose(block_mean_resize(arr, 8, 8), np.full((8, 8), 7.0))


def test_ahash_properties():
    a = _img(32, 32, 3, seed=20)
    h1 = ahash64(a)
    assert 0 <= h1 < (1 << 64)
    assert ahash64(a) == h1  # deterministic
    # small noise -> small hamming; different image -> large
    noisy = a.copy()
    noisy[::7, ::5] = np.clip(noisy[::7, ::5].astype(int) + 6, 0, 255).astype(np.uint8)
    other = _img(32, 32, 3, seed=21)
    ham_near = bin(h1 ^ ahash64(noisy)).count("1")
    ham_far = bin(h1 ^ ahash64(other)).count("1")
    assert ham_near <= 8
    assert ham_far > 12


def test_ahash_survives_lossless_codecs():
    arr = _img(24, 24, 3, seed=22)
    h = ahash64(arr)
    assert ahash64(decode_png(encode_png(arr))) == h
    assert ahash64(decode_bmp(encode_bmp(arr))) == h
    assert ahash64(decode_pnm(encode_pnm(arr))) == h


def test_to_signed64():
    assert to_signed64(0) == 0
    assert to_signed64((1 << 63) - 1) == (1 << 63) - 1
    assert to_signed64(1 << 63) == -(1 << 63)
    assert to_signed64((1 << 64) - 1) == -1


def test_gray_and_luma():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[..., 1] = 255  # pure green
    g = to_gray(arr)
    assert g.dtype == np.uint8
    assert int(g[0, 0]) == (150 * 255) >> 8
    assert mean_luma(arr) == float(g[0, 0])


def test_gif_animation_roundtrip():
    from atra_spark.functions.media_codecs import decode_gif, encode_gif_animation

    rng = np.random.RandomState(3)
    frames = [(rng.randint(0, 4, (9, 11, 3)) * 70).astype(np.uint8) for _ in range(5)]
    delays = [0, 4, 10, 7, 25]
    dec, ddel = decode_gif(encode_gif_animation(frames, delays))
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert (a == b).all()
    assert ddel == [d / 100.0 for d in delays]


def test_gif_animation_per_frame_palettes():
    """Frames with disjoint palettes must survive (local color tables)."""
    from atra_spark.functions.media_codecs import decode_gif, encode_gif_animation

    f1 = np.full((4, 4, 3), (255, 0, 0), dtype=np.uint8)
    f2 = np.full((4, 4, 3), (0, 0, 255), dtype=np.uint8)
    dec, _ = decode_gif(encode_gif_animation([f1, f2], [5, 5]))
    assert (dec[0] == f1).all() and (dec[1] == f2).all()


def test_gif_animation_mixed_geometry():
    from atra_spark.functions.media_codecs import decode_gif, encode_gif_animation

    f1 = _img(6, 10)
    f2 = _img(10, 6, seed=1)
    q = lambda a: (a // 64 * 64).astype(np.uint8)
    dec, _ = decode_gif(encode_gif_animation([q(f1), q(f2)], [1, 2]))
    assert dec[0].shape == (6, 10, 3) and dec[1].shape == (10, 6, 3)


def test_resize_nearest_exact_mapping():
    from atra_spark.functions.media_codecs import resize_nearest

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(np.stack([arr] * 3, -1), 2)
    # half-pixel centers: output (i,j) <- source ((2i+1)*4//4, (2j+1)*4//4)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == arr[1, 1] and out[1, 1, 0] == arr[3, 3]


def test_resize_nearest_aspect_and_noop():
    from atra_spark.functions.media_codecs import resize_nearest

    arr = _img(33, 17)
    out = resize_nearest(arr, 8)
    assert out.shape == (8, 4, 3)  # 33 -> 8, 17 -> 17*8//33 = 4
    same = resize_nearest(arr, 64)
    assert same.shape == arr.shape and (same == arr).all()
    assert same is not arr  # defensive copy
    gray = resize_nearest(arr[:, :, 0], 8)
    assert gray.shape == (8, 4)


def test_resize_nearest_extreme_aspect_floor():
    from atra_spark.functions.media_codecs import resize_nearest

    arr = _img(2, 100)
    out = resize_nearest(arr, 8)
    assert out.shape == (1, 8, 3)  # height floors at 1, never 0


# ==========================================================================
# JPEG (baseline sequential, T.81 + JFIF)
# ==========================================================================

def _gradient(h, w, k=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [((yy * 3 + xx * 5 + k * 37 + c * 11) % 256) for c in range(3)], axis=-1
    ).astype(np.uint8)


class TestJpeg:
    def test_flat_blocks_roundtrip_exactly(self):
        """DC-only images survive quantization exactly — the loss-free
        corner that pins level shift, DC prediction and dequant."""
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        for v in (0, 1, 128, 137, 255):
            arr = np.full((16, 24, 3), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(arr, quality=90))
            assert out.shape == arr.shape
            assert (out == arr).all(), v

    def test_smooth_image_decodes_close_to_source(self):
        """Lossy by design: the decoder must land within a few gray
        levels of the source on smooth content at quality 90."""
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        arr = _gradient(33, 24)
        out = decode_jpeg(encode_jpeg(arr, quality=90))
        assert out.shape == arr.shape
        err = np.abs(out.astype(int) - arr.astype(int))
        assert err.mean() < 4.0 and np.percentile(err, 95) < 16

    def test_grayscale_single_component(self):
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        g = _gradient(17, 19)[:, :, 0]
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == g.shape and out.ndim == 2
        assert np.abs(out.astype(int) - g.astype(int)).mean() < 4.0

    def test_chroma_subsampling_420_mcu_interleave(self):
        """2x2 sampling factors: 4 luma blocks + 1 Cb + 1 Cr per MCU,
        chroma box-downsampled then replicated back up."""
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        arr = _gradient(24, 33)  # non-multiple-of-16 edges exercise padding
        out = decode_jpeg(encode_jpeg(arr, quality=90, subsampling="4:2:0"))
        assert out.shape == arr.shape
        assert np.abs(out.astype(int) - arr.astype(int)).mean() < 8.0

    def test_restart_markers(self):
        """DRI/RSTn: predictors reset at each interval, markers byte-aligned
        and consumed in sequence."""
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        arr = _gradient(24, 40)
        enc = encode_jpeg(arr, quality=90, restart_interval=2)
        assert b"\xff\xdd" in enc  # DRI present
        assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
        out = decode_jpeg(enc)
        # this 40-wide gradient wraps mid-block (ringing), so the bound
        # is looser; exactness vs the unrestarted stream is pinned below
        assert np.abs(out.astype(int) - arr.astype(int)).mean() < 8.0

    def test_restart_stream_equals_unrestarted_decode(self):
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        arr = _gradient(16, 16, k=3)
        a = decode_jpeg(encode_jpeg(arr, quality=90))
        b = decode_jpeg(encode_jpeg(arr, quality=90, restart_interval=1))
        assert (a == b).all()  # same coefficients, different framing

    def test_byte_stuffing_path(self):
        """Noise at high quality reliably produces 0xFF bytes in the
        entropy segment — the stuffed 0xFF00 pairs must round-trip."""
        from atra_spark.functions.media_codecs import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(5)
        arr = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        enc = encode_jpeg(arr, quality=95)
        assert b"\xff\x00" in enc
        out = decode_jpeg(enc)
        assert out.shape == arr.shape  # lossy on noise; shape + no raise

    def test_progressive_and_corrupt_ladder(self):
        from atra_spark.functions.media_codecs import (
            DecodeError, decode_jpeg, encode_jpeg,
        )

        with pytest.raises(NotImplementedError):
            decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00" * 16)  # SOF2
        with pytest.raises(NotImplementedError):
            decode_jpeg(b"\xff\xd8\xff\xc9" + b"\x00" * 16)  # arithmetic
        with pytest.raises(DecodeError):
            decode_jpeg(b"\xff\xd8hello")  # garbage after SOI
        with pytest.raises(DecodeError):
            decode_jpeg(b"\xff\xd8\xff\xd9")  # EOI, no scan
        enc = bytearray(encode_jpeg(_gradient(16, 16), quality=90))
        with pytest.raises(DecodeError):
            decode_jpeg(bytes(enc[: len(enc) // 2]))  # truncated ECS

    def test_quality_monotonic_size(self):
        from atra_spark.functions.media_codecs import encode_jpeg

        rng = np.random.RandomState(7)
        arr = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        sizes = [len(encode_jpeg(arr, quality=q)) for q in (20, 60, 95)]
        assert sizes[0] < sizes[1] < sizes[2]
