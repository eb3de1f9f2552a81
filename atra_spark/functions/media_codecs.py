"""Pure-stdlib media codecs for the multimodal pipeline.

The container has no image/audio libraries (no PIL, no ffmpeg), so the
codec layer is implemented from the published format specifications
using only ``zlib``/``struct``/``wave`` + numpy:

- PNG  — RFC 2083 / W3C PNG spec: chunk framing with CRC verification,
  IHDR geometry, zlib-inflated IDAT, all five scanline filters
  (None/Sub/Up/Average/Paeth), color types 0/2/3/4/6 at bit depth 8.
  Interlaced (Adam7) images and non-8-bit depths raise
  :class:`DecodeError` (declared unsupported, not silently wrong).
- GIF  — GIF87a/GIF89a: logical screen descriptor, global/local color
  tables, graphic-control extensions (frame delays), multi-frame
  iteration, 4-pass deinterlacing, and the GIF variant of LZW with
  variable code width (3..12 bits), clear and end-of-information codes.
- BMP  — BITMAPINFOHEADER, 24-bit uncompressed (BI_RGB), bottom-up and
  top-down row order, 4-byte row padding.
- PNM  — netpbm P5 (PGM) / P6 (PPM) binary, maxval 255, comment-aware
  header tokenizer.
- WAV  — RIFF/WAVE PCM via the stdlib ``wave`` module; 8-bit unsigned
  and 16-bit signed PCM payloads decoded to numpy.

Encoders exist for every decoder (PNG filter-0, single-frame GIF with
a real LZW compressor, BMP, PNM, WAV) so tests and fixture generators
can synthesize *real* payload bytes deterministically and round-trip
them: every decoder is verified against pixels it did not produce
(cross-format agreement: the same array encoded as PNG, BMP and PPM
must decode identically).

Everything here is per-payload CPU work invoked from Arrow-batched
``mapInPandas`` stages (functions/multimodal.py) — no Spark imports,
no I/O, no global state. On a production cluster the dispatch table in
``multimodal.decode_media`` swaps individual entries for native codecs
(PIL/libvips/ffmpeg) without touching the Spark plumbing; the formats
implemented here stay available as the zero-dependency fallback.

- JPEG — ITU-T T.81 baseline sequential + JFIF (T.871): Annex K
  quantization/Huffman tables with canonical code construction,
  quality scaling, optional 4:2:0 subsampling and DRI/RSTn restart
  intervals, byte-stuffed entropy coding, zigzag + 8x8 DCT-II via a
  numpy basis-matrix product. Progressive (SOF2), arithmetic-coded,
  12-bit and hierarchical streams raise NotImplementedError.

Scope note: MP3/H.264-class formats and non-baseline JPEG modes are
out of scope for a pure-stdlib layer; they are reported as
``unsupported`` (never ``corrupt``) by the feature pass.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class DecodeError(ValueError):
    """Payload claims a supported format but cannot be decoded."""


class EncodeError(ValueError):
    """Array cannot be represented in the requested format."""


# ==========================================================================
# PNG
# ==========================================================================

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = len(PNG_SIG)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise DecodeError("png: truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise DecodeError(f"png: bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise DecodeError("png: missing IEND")


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec §6). Filters None/Up are
    vectorized; Sub/Average/Paeth carry a left-pixel dependency so they
    run as a per-byte row loop — fine for the thumbnail/feature sizes
    this layer serves, and the swap point for a native codec at scale."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise DecodeError("png: decompressed size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[x] = (int(row[x]) + pr) & 0xFF
        else:
            raise DecodeError(f"png: unknown filter {ftype}")
        out[y] = row
        prev = row
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) gray or (H,W,C). Palette images
    come back expanded to RGB (tRNS transparency is ignored — features
    operate on opaque pixels)."""
    if not data.startswith(PNG_SIG):
        raise DecodeError("png: bad signature")
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise DecodeError("png: bad IHDR")
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise DecodeError("png: unknown compression/filter method")
            if interlace != 0:
                raise DecodeError("png: interlaced (Adam7) not supported")
            if bit_depth != 8:
                raise DecodeError(f"png: bit depth {bit_depth} not supported")
            if color_type not in _PNG_CHANNELS:
                raise DecodeError(f"png: color type {color_type} not supported")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise DecodeError("png: bad PLTE length")
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise DecodeError("png: missing IHDR")
    if width == 0 or height == 0:
        raise DecodeError("png: zero dimension")
    if not idat:
        raise DecodeError("png: missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise DecodeError(f"png: zlib: {e}") from e
    bpp = _PNG_CHANNELS[color_type]
    arr = _png_unfilter(raw, width, height, bpp)
    if color_type == 3:
        if palette is None:
            raise DecodeError("png: palette image without PLTE")
        idx = arr.reshape(height, width)
        if int(idx.max(initial=0)) >= len(palette):
            raise DecodeError("png: palette index out of range")
        return palette[idx]
    if bpp == 1:
        return arr.reshape(height, width)
    return arr.reshape(height, width, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H,W)|(H,W,2)|(H,W,3)|(H,W,4) -> PNG (filter 0)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        channels = arr.shape[2]
    else:
        raise EncodeError(f"png: unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise EncodeError("png: zero dimension")
    flat = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ==========================================================================
# GIF (LZW)
# ==========================================================================


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable code width, clear + EOI codes."""
    if not 2 <= min_code_size <= 11:
        raise DecodeError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first — inlined into the loop (round 6; the
    # per-code closure call was the GIF path's hotspot). Reads stay
    # 3-byte slices: a whole-stream big-int would make every code read
    # O(stream bytes) and the decode quadratic on large images.
    bitpos = 0
    nbits = len(data) * 8
    from_bytes = int.from_bytes

    base_table = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base_table)
    width = min_code_size + 1
    mask = (1 << width) - 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        if bitpos + width > nbits:
            raise DecodeError("gif: LZW stream truncated")
        b0 = bitpos >> 3
        code = (from_bytes(data[b0 : b0 + 3], "little") >> (bitpos & 7)) & mask
        bitpos += width
        if code == clear:
            table = list(base_table)
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise DecodeError("gif: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise DecodeError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
            mask = (1 << width) - 1
    if len(out) < n_pixels:
        raise DecodeError("gif: LZW output short")
    return bytes(out[:n_pixels])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW compressor (dict reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[list[np.ndarray], list[float]]:
    """GIF bytes -> ([frame RGB arrays], [per-frame delay seconds]).

    Frames are returned at their own descriptor geometry mapped through
    the active color table; disposal compositing onto the logical
    screen is out of scope for feature extraction (documented)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise DecodeError("gif: bad signature")
    if len(data) < 13:
        raise DecodeError("gif: truncated header")
    packed = data[10]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise DecodeError("gif: truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[float] = []
    next_delay = 0.0

    def subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise DecodeError("gif: truncated sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + n])
            if len(chunks[-1]) != n:
                raise DecodeError("gif: truncated sub-block")
            p += n

    while True:
        if pos >= len(data):
            raise DecodeError("gif: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise DecodeError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = subblocks(pos)
            if label == 0xF9 and len(body) >= 4:
                next_delay = struct.unpack("<H", body[1:3])[0] / 100.0
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise DecodeError("gif: truncated image descriptor")
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if w == 0 or h == 0:
                raise DecodeError("gif: zero-dimension frame")
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(data):
                    raise DecodeError("gif: truncated local color table")
                table = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise DecodeError("gif: frame without color table")
            if pos >= len(data):
                raise DecodeError("gif: missing LZW code size")
            mcs = data[pos]
            pos += 1
            lzw, pos = subblocks(pos)
            idx = np.frombuffer(_lzw_decode(mcs, lzw, w * h), np.uint8)
            if int(idx.max(initial=0)) >= len(table):
                raise DecodeError("gif: color index out of range")
            grid = idx.reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                de = np.empty_like(grid)
                src = 0
                for start, step in _GIF_DEINTERLACE_PASSES:
                    rows = range(start, h, step)
                    for r in rows:
                        de[r] = grid[src]
                        src += 1
                grid = de
            frames.append(table[grid])
            delays.append(next_delay)
            next_delay = 0.0
        else:
            raise DecodeError(f"gif: unknown block 0x{block:02x}")
    if not frames:
        raise DecodeError("gif: no frames")
    return frames, delays


def encode_gif(arr: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Single-frame GIF89a. ``arr`` is either (H,W) palette indices with
    an explicit ``palette`` (N<=256, uint8 RGB) or an (H,W,3) RGB array
    with at most 256 distinct colors (palette built automatically)."""
    if palette is None:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise EncodeError("gif: need (H,W,3) RGB or indices+palette")
        h, w = arr.shape[:2]
        flat = arr.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise EncodeError(f"gif: {len(palette)} colors > 256")
        indices = inverse.astype(np.uint8).reshape(h, w)
    else:
        indices = np.ascontiguousarray(arr, dtype=np.uint8)
        if indices.ndim != 2:
            raise EncodeError("gif: indices must be (H,W)")
        h, w = indices.shape
        if int(indices.max(initial=0)) >= len(palette):
            raise EncodeError("gif: index out of palette range")
    if h == 0 or w == 0:
        raise EncodeError("gif: zero dimension")
    # pad palette to a power-of-two size >= 2
    size = 2
    while size < len(palette):
        size *= 2
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    gct_bits = max(1, size.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = max(2, gct_bits)
    out.append(mcs)
    lzw = _lzw_encode(mcs, indices.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(frames: list[np.ndarray], delays_cs: list[int]) -> bytes:
    """Multi-frame GIF89a: one graphic-control extension (delay in
    centiseconds, the wire unit) + image descriptor with a per-frame
    LOCAL color table per frame — no global table, so frames need not
    share a palette. Each frame is (H,W,3) RGB with <=256 distinct
    colors. decode_gif returns the same frames and ``delay/100.0``
    seconds each, so golden durations are computed with exactly
    ``float(sum(d / 100.0 for d in delays_cs))``."""
    if not frames or len(frames) != len(delays_cs):
        raise EncodeError("gif: frames/delays mismatch")
    screen_w = max(f.shape[1] for f in frames)
    screen_h = max(f.shape[0] for f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", screen_w, screen_h, 0x00, 0, 0)
    for arr, delay in zip(frames, delays_cs):
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise EncodeError("gif: need (H,W,3) RGB frames")
        h, w = arr.shape[:2]
        if h == 0 or w == 0:
            raise EncodeError("gif: zero dimension")
        palette, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
        if len(palette) > 256:
            raise EncodeError(f"gif: {len(palette)} colors > 256")
        indices = inverse.astype(np.uint8).reshape(h, w)
        size = 2
        while size < len(palette):
            size *= 2
        pal = np.zeros((size, 3), dtype=np.uint8)
        pal[: len(palette)] = palette
        lct_bits = max(1, size.bit_length() - 1)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", int(delay)) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | (lct_bits - 1))
        out += pal.tobytes()
        mcs = max(2, lct_bits)
        out.append(mcs)
        lzw = _lzw_encode(mcs, indices.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def resize_nearest(arr: np.ndarray, max_dim: int) -> np.ndarray:
    """Deterministic nearest-neighbor downscale so max(H, W) <= max_dim,
    aspect preserved (ceil-free integer math; never upscales). Source
    pixel for output index i is ``(i + 0.5) * in / out`` floored —
    the classic half-pixel-center mapping, exact in integer arithmetic
    as ``((2 * i + 1) * in) // (2 * out)``."""
    h, w = arr.shape[:2]
    if max_dim < 1:
        raise EncodeError("resize: max_dim must be >= 1")
    scale_den = max(h, w)
    if scale_den <= max_dim:
        return arr.copy()
    out_h = max(1, (h * max_dim) // scale_den)
    out_w = max(1, (w * max_dim) // scale_den)
    ys = ((2 * np.arange(out_h) + 1) * h) // (2 * out_h)
    xs = ((2 * np.arange(out_w) + 1) * w) // (2 * out_w)
    return arr[np.ix_(ys, xs)] if arr.ndim == 2 else arr[np.ix_(ys, xs)].copy()


# ==========================================================================
# BMP (24-bit BI_RGB)
# ==========================================================================


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise DecodeError("bmp: bad header")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise DecodeError(f"bmp: header size {hdr_size} not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1 or bpp != 24 or compression != 0:
        raise DecodeError(f"bmp: only 24-bit BI_RGB supported (bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise DecodeError("bmp: bad dimensions")
    stride = (width * 3 + 3) & ~3
    need = offset + stride * height
    if need > len(data):
        raise DecodeError("bmp: truncated pixel data")
    rows = np.frombuffer(data, np.uint8, stride * height, offset).reshape(height, stride)
    px = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise EncodeError("bmp: need (H,W,3)")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise EncodeError("bmp: zero dimension")
    stride = (w * 3 + 3) & ~3
    bgr = arr[::-1, :, ::-1]
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h):
        body += bgr[y].tobytes() + pad
    pixel_off = 54
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


# ==========================================================================
# PNM (P5/P6)
# ==========================================================================


def decode_pnm(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P5", b"P6"):
        raise DecodeError("pnm: bad magic")
    channels = 3 if data[:2] == b"P6" else 1
    pos = 2
    fields = []
    while len(fields) < 3:
        if pos >= len(data):
            raise DecodeError("pnm: truncated header")
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(data) and data[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(data[start:pos]))
        else:
            raise DecodeError("pnm: bad header byte")
    w, h, maxval = fields
    if maxval != 255 or w == 0 or h == 0:
        raise DecodeError("pnm: only maxval 255, nonzero dims supported")
    pos += 1  # single whitespace after maxval
    need = w * h * channels
    if len(data) - pos < need:
        raise DecodeError("pnm: truncated pixel data")
    px = np.frombuffer(data, np.uint8, need, pos)
    return px.reshape(h, w) if channels == 1 else px.reshape(h, w, 3)


def encode_pnm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic, h, w = b"P5", *arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic, (h, w) = b"P6", arr.shape[:2]
    else:
        raise EncodeError("pnm: need (H,W) or (H,W,3)")
    if h == 0 or w == 0:
        raise EncodeError("pnm: zero dimension")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ==========================================================================
# WAV (PCM via stdlib wave)
# ==========================================================================


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1,1] shaped (n, channels),
    sample_rate). PCM 8-bit unsigned and 16-bit signed supported."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            sr = wf.getframerate()
            ch = wf.getnchannels()
            sw = wf.getsampwidth()
            n = wf.getnframes()
            raw = wf.readframes(n)
    except (wave.Error, EOFError, struct.error) as e:
        raise DecodeError(f"wav: {e}") from e
    if sr <= 0 or ch <= 0:
        raise DecodeError("wav: bad params")
    if len(raw) != n * ch * sw:
        # the stdlib wave module silently returns short reads on a
        # truncated data chunk; surface that as corruption
        raise DecodeError("wav: truncated data chunk")
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise DecodeError(f"wav: sample width {sw} not supported")
    frames = len(x) // ch
    return x[: frames * ch].reshape(frames, ch), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n,channels) float in [-1,1] -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[0] == 0:
        raise EncodeError("wav: need (n,) or (n,channels) samples")
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(int(sample_rate))
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ==========================================================================
# image features shared by the fixture generator and the Spark decoder
# ==========================================================================


# ==========================================================================
# JPEG (baseline sequential DCT, ITU-T T.81 + JFIF / ITU-T T.871)
# ==========================================================================
# Spec-derived like the PNG/GIF machinery above: Annex K quantization +
# Huffman tables, canonical Huffman code construction, byte-stuffed
# entropy-coded segments, restart markers, zigzag + 8x8 DCT-II via a
# numpy basis-matrix product. Baseline sequential only: progressive
# (SOF2), arithmetic coding, 12-bit precision and hierarchical modes
# raise NotImplementedError (the multimodal ladder reports those as
# ``unsupported``, never ``corrupt``). Reference treats IMAGE as a
# first-class format class (atra/src/format/supported.rs:31-60); JPEG
# is the dominant web image format, so the feature pass must decode it.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 quantization tables (in natural row-major order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3-K.6 Huffman specs: (BITS[1..16], HUFFVAL)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# DCT-II basis matrix: C[k, n] = s(k) cos((2n+1) k pi / 16)
_DCT_C = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the T.81 Annex C canonical rule."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view of the same
    canonical assignment."""
    return {
        (length, code): sym
        for sym, (code, length) in _jpeg_canonical_codes(bits, vals).items()
    }


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's published quality->scaling mapping (IJG jcparam.c,
    public knowledge): 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255)


def _csize(v: int) -> int:
    """Category (bit size) of a DC difference / AC coefficient."""
    return int(abs(int(v))).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits (B.1.1.5)


def _fdct_quant(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, 2-D DCT-II, quantize; returns 64 zigzagged ints."""
    coef = _DCT_C @ (block.astype(np.float64) - 128.0) @ _DCT_C.T
    q = np.round(coef.reshape(64) / qt.astype(np.float64))
    return q.astype(np.int64)[_ZIGZAG]


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    diff = int(zz[0]) - pred
    size = _csize(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size = _csize(v)
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def _jfif_headers(
    out: bytearray, w: int, h: int, n_comp: int,
    qts: list[np.ndarray], samps: list[tuple[int, int]],
    restart_interval: int,
) -> None:
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in qt[_ZIGZAG]
        )
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hs, vs = samps[ci]
        tq = 0 if ci == 0 else 1
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, min(tq, len(qts) - 1))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if n_comp == 3:
        tables += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_th, (bits, vals) in tables:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential JFIF encoder: grayscale (HxW) or RGB
    (HxWx3) uint8, Annex K tables scaled by ``quality``, optional
    4:2:0 chroma subsampling and DRI/RSTn restart intervals. The
    decoder below round-trips everything this emits; goldens are
    golden-by-construction (encode -> decode -> features)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise EncodeError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise EncodeError(f"unsupported subsampling {subsampling}")
    h, w, n_comp = a.shape
    sub = subsampling == "4:2:0" and n_comp == 3
    if n_comp == 3:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        planes = [y, cb, cr]
        samps = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [a[..., 0].astype(np.float64)]
        samps = [(1, 1)]
    qt_l = _scale_qt(_QT_LUMA, quality)
    qts = [qt_l] + ([_scale_qt(_QT_CHROMA, quality)] if n_comp == 3 else [])
    maxh = max(s[0] for s in samps)
    maxv = max(s[1] for s in samps)
    mcu_w, mcu_h = 8 * maxh, 8 * maxv
    mcux = -(-w // mcu_w)
    mcuy = -(-h // mcu_h)

    def comp_plane(p: np.ndarray, hs: int, vs: int) -> np.ndarray:
        """Pad to MCU grid (edge replicate), then box-downsample."""
        ph, pw = mcuy * mcu_h, mcux * mcu_w
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if hs == maxh and vs == maxv:
            return padded
        fy, fx = maxv // vs, maxh // hs
        return padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))

    comp_px = [comp_plane(p, *s) for p, s in zip(planes, samps)]
    out = bytearray()
    _jfif_headers(out, w, h, n_comp, qts, samps, restart_interval)
    sos = struct.pack(">B", n_comp)
    for ci in range(n_comp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += struct.pack(">BB", ci + 1, td_ta)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = [
        _jpeg_canonical_codes(*(_HT_DC_LUMA if ci == 0 else _HT_DC_CHROMA))
        for ci in range(n_comp)
    ]
    ac_codes = [
        _jpeg_canonical_codes(*(_HT_AC_LUMA if ci == 0 else _HT_AC_CHROMA))
        for ci in range(n_comp)
    ]
    comp_qt = [qts[0] if ci == 0 else qts[1] for ci in range(n_comp)]
    writer = _BitWriter()
    preds = [0] * n_comp
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.pad_to_byte()
                out += writer.buf
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * n_comp
            for ci in range(n_comp):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        block = comp_px[ci][r0:r0 + 8, c0:c0 + 8]
                        zz = _fdct_quant(block, comp_qt[ci])
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_codes[ci], ac_codes[ci]
                        )
            n_mcu += 1
    writer.pad_to_byte()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops AT markers (the scan loop handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise DecodeError("jpeg: truncated entropy segment")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise DecodeError("jpeg: marker inside entropy segment")
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0

    def at_marker(self) -> int | None:
        """Peek a marker at the (byte-aligned) cursor, or None."""
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                return nxt
        return None


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise DecodeError("jpeg: invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JFIF decoder (T.81 SOI/DQT/DHT/SOF0/DRI/SOS
    parse, Huffman + DC-predictor entropy decode, dequant, inverse
    zigzag, basis-matrix IDCT, replicated chroma upsample, T.871
    YCbCr->RGB). Progressive/arithmetic/12-bit/hierarchical streams
    raise NotImplementedError (-> ``unsupported``); malformed streams
    raise DecodeError (-> ``corrupt``)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise DecodeError("jpeg: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, comps) with comps = [(id, hs, vs, tq)]
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise DecodeError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise DecodeError("jpeg: no scan data")
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("jpeg: progressive mode")
        if marker in (0xC1, 0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("jpeg: non-baseline frame type")
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if len(seg) < seglen - 2:
            raise DecodeError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant table")
                if p + 65 > len(seg):
                    raise DecodeError("jpeg: truncated quant table")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1)
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZIGZAG] = zz
                qts[tq] = qt
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                if len(bits) < 16 or p + 17 + n > len(seg):
                    raise DecodeError("jpeg: truncated huffman table")
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _jpeg_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("jpeg: 12-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError("jpeg: sampling factor > 2")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise DecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scan, qts, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += seglen
    raise DecodeError("jpeg: truncated stream")


def _decode_scan(
    data, pos, frame, scan, qts, dc_tabs, ac_tabs, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    if [c[0] for c in comps] != [s[0] for s in scan]:
        raise NotImplementedError("jpeg: non-interleaved scan order")
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    planes = [
        np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    for _, _, _, tq in comps:
        if tq not in qts:
            raise DecodeError(f"jpeg: missing quant table {tq}")
    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_expect = 0
    for n_mcu in range(mcux * mcuy):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            r.align()
            m = r.at_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise DecodeError("jpeg: missing restart marker")
            if m != 0xD0 + rst_expect:
                raise DecodeError("jpeg: restart marker out of order")
            r.pos += 2
            rst_expect = (rst_expect + 1) % 8
            preds = [0] * len(comps)
        my, mx = divmod(n_mcu, mcux)
        for ci, ((_, hs, vs, tq), (_, td, ta)) in enumerate(zip(comps, scan)):
            if td not in dc_tabs or ta not in ac_tabs:
                raise DecodeError("jpeg: missing huffman table")
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _huff_decode(r, dc_tabs[td])
                    preds[ci] += _extend(r.bits(size), size) if size else 0
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(r, ac_tabs[ta])
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise DecodeError("jpeg: AC index overflow")
                        zz[k] = _extend(r.bits(size), size)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = (zz * qts[tq]).astype(np.float64)
                    blk = _DCT_C.T @ coef.reshape(8, 8) @ _DCT_C + 128.0
                    r0, c0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    planes[ci][r0:r0 + 8, c0:c0 + 8] = blk
    full = []
    for (_, hs, vs, _), p in zip(comps, planes):
        fy, fx = maxv // vs, maxh // hs
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[: h, : w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"jpeg: {len(full)}-component color")
    y, cb, cr = full
    rch = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([rch, g, b], axis=-1)), 0, 255).astype(np.uint8)


def to_gray(arr: np.ndarray) -> np.ndarray:
    """uint8 image -> uint8 grayscale via integer Rec.601
    (77R + 150G + 29B) >> 8 — deterministic across platforms."""
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 2:  # gray + alpha
        return arr[:, :, 0]
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def block_mean_resize(gray: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Exact block-mean downscale using an integral image, so cells of
    unequal size (H,W not multiples of 8) still get exact means —
    deterministic, no float interpolation until the final division."""
    h, w = gray.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = gray.astype(np.int64).cumsum(0).cumsum(1)
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # vectorized over the whole cell grid (round 6 — the 64-iteration
    # scalar loop was a media-kernel hotspot): images smaller than the
    # grid produce empty cells; widen to the nearest pixel so every
    # cell has a defined mean (np.maximum(hi, lo+1) == the scalar
    # "if hi == lo: hi = lo + 1" rule, since hi >= lo by construction)
    y0, x0 = ys[:-1], xs[:-1]
    y1 = np.maximum(ys[1:], y0 + 1)
    x1 = np.maximum(xs[1:], x0 + 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = (
        ii[np.ix_(y1, x1)]
        - ii[np.ix_(y0, x1)]
        - ii[np.ix_(y1, x0)]
        + ii[np.ix_(y0, x0)]
    )
    return s / area


def audio_fingerprints(samples: np.ndarray, frame: int = 256, hop: int = 128) -> list[int]:
    """Landmark-style audio fingerprint (the Shazam-family idea in its
    simplest deterministic form): Hann-windowed frames, dominant
    non-DC rFFT bin per frame, and each 3-gram of consecutive dominant
    bins packed into one integer (bins <= 128 fit 8 bits). Shared by
    the Spark fingerprint pass and the golden generator — both run the
    same numpy arithmetic on the same decoded samples, so fingerprints
    are identical. Returns the sorted distinct fingerprint set."""
    if frame > 510:
        # the 3-gram packs each dominant bin into 8 bits; rfft of a
        # >510-sample frame can yield bins > 255, which would silently
        # overflow into the neighbouring field — fail loudly instead
        raise ValueError(f"frame={frame} overflows 8-bit bin packing (max 510)")
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if len(x) < frame:
        return []
    win = np.hanning(frame)
    bins = []
    for start in range(0, len(x) - frame + 1, hop):
        mag = np.abs(np.fft.rfft(x[start : start + frame] * win))
        bins.append(int(mag[1:].argmax()) + 1)  # skip DC; ties -> lowest bin
    return sorted({(a << 16) | (b << 8) | c for a, b, c in zip(bins, bins[1:], bins[2:])})


def ahash64(arr: np.ndarray) -> int:
    """64-bit average hash: 8x8 block means, bit set where the cell
    mean is strictly above the global mean of the 64 cells. Bit layout:
    cell (r,c) -> bit 63 - (r*8 + c). Returned as an unsigned int."""
    cells = block_mean_resize(to_gray(arr), 8, 8)
    mean = cells.mean()
    # row-major cell i -> bit 63 - i is exactly MSB-first byte packing
    # (vectorized round 6; comparisons identical to the scalar loop)
    mask = cells.reshape(-1) > mean
    return int.from_bytes(np.packbits(mask).tobytes(), "big")


def to_signed64(u: int) -> int:
    """Unsigned 64-bit -> the signed value Spark's LongType stores."""
    return u - (1 << 64) if u >= (1 << 63) else u


def mean_luma(arr: np.ndarray) -> float:
    """Mean grayscale value as a float — the same arithmetic on both
    the fixture generator's source array and the decoded array, so a
    lossless codec yields a bit-identical double."""
    return float(to_gray(arr).astype(np.float64).mean())
