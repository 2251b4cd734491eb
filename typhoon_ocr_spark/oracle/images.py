"""Raster-image inputs: magic-byte sniffing + header dimension parse.

The reference accepts image files end-to-end — the route allowlist is
.png/.jpg/.jpeg/.webp/.gif (/root/reference/backend/routes/ocr.py:75-82),
dispatch converts them via image_to_pdf (ocr_utils.py:562-579), and the
anchor is the whole-image frame from the image's pixel dimensions
(get_anchor_text_from_image, ocr_utils.py:502-506). The reference reads
dimensions through PIL; no codecs exist in-sandbox, so this module
parses the container headers directly (pure stdlib) — dimensions are
all the anchor needs, and the payload itself stays an opaque binary
column (full decode is the multimodal operators' stubbed hook).

Formats: PNG (IHDR), JPEG (SOFn scan), GIF (logical screen
descriptor), WebP (VP8 / VP8L / VP8X chunks).

The writers at the bottom build deterministic, structurally-valid
fixture payloads (real CRCs, real zlib IDAT for PNG) for the corpus
generator; they are not general encoders.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
GIF_MAGICS = (b"GIF87a", b"GIF89a")

# SOF markers carry frame dimensions: C0-CF minus C4 (DHT), C8 (JPG
# extension), CC (DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


class ImageError(ValueError):
    pass


def sniff_image_kind(payload: Optional[bytes]) -> Optional[str]:
    """'png' | 'jpeg' | 'gif' | 'webp' | None (not a known raster)."""
    if not payload:
        return None
    head = bytes(payload[:16])
    if head.startswith(PNG_MAGIC):
        return "png"
    if head.startswith(JPEG_MAGIC):
        return "jpeg"
    if head[:6] in GIF_MAGICS:
        return "gif"
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return "webp"
    return None


def image_dimensions(payload: bytes) -> Tuple[int, int]:
    """(width, height) in pixels from the container header. Raises
    ImageError on malformed/truncated headers so the pipeline emits an
    error row, never silent junk."""
    kind = sniff_image_kind(payload)
    data = bytes(payload)
    try:
        if kind == "png":
            if data[12:16] != b"IHDR":
                raise ImageError("PNG missing IHDR")
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if kind == "jpeg":
            return _jpeg_dimensions(data)
        if kind == "gif":
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if kind == "webp":
            return _webp_dimensions(data)
    except (struct.error, IndexError) as exc:
        raise ImageError(f"truncated {kind} header") from exc
    raise ImageError("not a supported raster image")


def _jpeg_dimensions(data: bytes) -> Tuple[int, int]:
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1  # fill bytes / resync
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers have no length
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF:
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return int(w), int(h)
        if marker == 0xDA:  # SOS: entropy data follows, SOF must precede
            break
        pos += 2 + seg_len
    raise ImageError("JPEG SOF marker not found")


def _webp_dimensions(data: bytes) -> Tuple[int, int]:
    chunk = data[12:16]
    if chunk == b"VP8X":
        w = 1 + int.from_bytes(data[24:27], "little")
        h = 1 + int.from_bytes(data[27:30], "little")
        return w, h
    if chunk == b"VP8L":
        if data[20] != 0x2F:
            raise ImageError("WebP VP8L signature missing")
        bits = int.from_bytes(data[21:25], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if chunk == b"VP8 ":
        if data[23:26] != b"\x9d\x01\x2a":
            raise ImageError("WebP VP8 start code missing")
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        return w, h
    raise ImageError(f"unknown WebP chunk {chunk!r}")


# --------------------------------------------------------------------------
# Real PNG decode (stdlib: zlib inflate + PNG row unfiltering). The
# other container formats (JPEG/GIF-LZW/WebP-VP8) need entropy codecs
# that aren't in this sandbox; they stay behind NotImplementedError in
# the multimodal decode hook.
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, raw pixel bytes) for 8-bit
    non-interlaced PNGs. Raises ImageError on palette/interlaced/
    non-8-bit images (rare in practice; loud, never silent)."""
    from .pdfmini import _png_unpredict

    if not data.startswith(PNG_MAGIC):
        raise ImageError("not a PNG")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ImageError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ImageError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS.get(color)
            if channels is None:
                raise ImageError(f"unsupported PNG color type {color}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ImageError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageError(f"bad PNG zlib stream: {exc}") from exc
    pixels = _png_unpredict(raw, columns=width, colors=channels, bpc=8)
    expected = width * height * channels
    if len(pixels) < expected:
        raise ImageError("PNG pixel data truncated")
    return width, height, channels, pixels[:expected]


def image_stats_row(payload: bytes) -> Optional[Tuple]:
    """Shared per-image row for the pixel-stats surface (the Spark UDF
    and the fixture golden MUST run this same function or the
    byte-identical gate drifts): (img_kind, width, height, n_samples,
    mean_pm, spread_pm, decoded) — decoded is 'real' (PNG pixel stats),
    'header-only' (codec-needing formats), or 'decode-error' (header
    parsed but the body doesn't decode). None for non-images /
    unparseable headers."""
    kind = sniff_image_kind(payload)
    if kind is None:
        return None
    try:
        w, h = image_dimensions(payload)
    except ImageError:
        return None
    if kind != "png":
        return (kind, w, h, None, None, None, "header-only")
    try:
        n, mean_pm, spread_pm = png_pixel_stats(payload)
        return (kind, w, h, n, mean_pm, spread_pm, "real")
    except ImageError:
        return (kind, w, h, None, None, None, "decode-error")


def png_pixel_stats(data: bytes) -> Tuple[int, int, int]:
    """(n_pixels, mean_per_mille, min..max spread_per_mille) —
    deterministic integer pixel statistics for the decode-verification
    path (per-mille of full scale, round-half-even like both engines'
    round())."""
    width, height, channels, pixels = decode_png(data)
    n = width * height * channels
    total = sum(pixels)
    mean_pm = round(1000 * total / (n * 255)) if n else 0
    spread_pm = round(1000 * (max(pixels) - min(pixels)) / 255) if n else 0
    return n, mean_pm, spread_pm


# --------------------------------------------------------------------------
# Fixture writers (deterministic, structurally valid)
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Real 8-bit grayscale PNG encoder (stdlib): filter-None rows,
    zlib IDAT, correct CRCs. ``pixels`` is row-major width*height."""
    if len(pixels) != width * height:
        raise ImageError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter: None
        rows += pixels[y * width : (y + 1) * width]
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def write_png(width: int, height: int, seed: int = 0) -> bytes:
    """Grayscale PNG with a deterministic byte pattern; real zlib IDAT
    and CRCs — any standards-compliant reader accepts it."""
    pixels = bytes(
        (x * 31 + y * 17 + seed) & 0xFF for y in range(height) for x in range(width)
    )
    return encode_png_gray(width, height, pixels)


def write_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """JPEG shell: SOI, APP0/JFIF, SOF0 with the dimensions, SOS, a
    deterministic entropy-ish tail, EOI. Header-parseable everywhere;
    pixel data is not meant to decode."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    tail = bytes((i * 37 + seed) % 0xFE for i in range(24))  # never 0xFF
    return b"\xff\xd8" + app0 + sof0 + sos + tail + b"\xff\xd9"


def write_gif(width: int, height: int, seed: int = 0) -> bytes:
    """GIF89a with logical screen descriptor + trailer."""
    screen = struct.pack("<HH", width, height) + bytes([0x00, seed & 0xFF, 0x00])
    return b"GIF89a" + screen + b"\x3b"


def write_webp(width: int, height: int, seed: int = 0) -> bytes:
    """WebP VP8X container carrying only the canvas size."""
    vp8x = bytes(10)
    vp8x = (
        b"\x00\x00\x00\x00"
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    payload = b"WEBP" + chunk + bytes([seed & 0xFF, 0])
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
