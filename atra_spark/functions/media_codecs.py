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

Scope note: JPEG/MP3/H.264-class formats need entropy/DCT machinery
that is out of scope for a pure-stdlib layer; they are reported as
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
    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise DecodeError("gif: LZW stream truncated")
        byte0 = bitpos >> 3
        val = int.from_bytes(data[byte0 : byte0 + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    table: list[bytes] = []

    def reset_table():
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]

    reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            reset_table()
            width = min_code_size + 1
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
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            # images smaller than the grid produce empty cells; widen
            # to the nearest pixel so every cell has a defined mean
            if y1 == y0:
                y1 = y0 + 1
            if x1 == x0:
                x1 = x0 + 1
            area = (y1 - y0) * (x1 - x0)
            s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
            out[i, j] = s / area
    return out


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
    bits = 0
    flat = cells.reshape(-1)
    for i in range(64):
        if flat[i] > mean:
            bits |= 1 << (63 - i)
    return bits


def to_signed64(u: int) -> int:
    """Unsigned 64-bit -> the signed value Spark's LongType stores."""
    return u - (1 << 64) if u >= (1 << 63) else u


def mean_luma(arr: np.ndarray) -> float:
    """Mean grayscale value as a float — the same arithmetic on both
    the fixture generator's source array and the decoded array, so a
    lossless codec yields a bit-identical double."""
    return float(to_gray(arr).astype(np.float64).mean())
