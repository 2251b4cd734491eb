"""Raster-image inputs: magic-byte sniffing + header dimension parse.

The reference accepts image files end-to-end — the route allowlist is
.png/.jpg/.jpeg/.webp/.gif (/root/reference/backend/routes/ocr.py:75-82),
dispatch converts them via image_to_pdf (ocr_utils.py:562-579), and the
anchor is the whole-image frame from the image's pixel dimensions
(get_anchor_text_from_image, ocr_utils.py:502-506). The reference reads
pixels through PIL; no codec libraries exist in-sandbox, so this module
implements the codecs directly in pure stdlib: header dimension parse
for all four container formats, and FULL pixel decode for PNG (zlib
inflate + row unfiltering), GIF (LZW + palette), baseline JPEG
(canonical Huffman + dequantize + inverse zigzag + IDCT), and lossless
WebP (VP8L prefix codes + LZ77 + color cache; the four pixel
transforms and the 2D distance map are a documented unsupported
subset). Lossy-WebP pixel decode stays out of scope (VP8 is a video
codec) — those rows surface as header-only.

The writers at the bottom build deterministic fixture payloads — real
encoders for PNG/GIF/JPEG/WebP-lossless (decodable by any compliant
reader), plus a header-only VP8X shell standing in for lossy WebP.
"""

from __future__ import annotations

import math
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
# Real decoders, all pure stdlib:
#   PNG  — zlib inflate + PNG row unfiltering
#   GIF  — full LZW (variable code width, clear/EOI, 12-bit cap)
#   JPEG — baseline DCT: segment parse, canonical Huffman, dequantize,
#          inverse zigzag, IDCT (no chroma subsampling)
#   WebP — lossless (VP8L) prefix-coded streams (see the VP8L section
#          below); lossy VP8 stays header-only (video codec).
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


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at min+1, LSB-first
    bit packing, CLEAR resets the table, table capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    nbits = len(data) * 8
    bitpos = 0
    out = bytearray()
    table: list = []
    code_size = min_code_size + 1
    prev: Optional[bytes] = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    reset()
    while bitpos + code_size <= nbits:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == eoi:
            break
        if code == clear:
            reset()
            continue
        if prev is None:
            if code >= clear:
                raise ImageError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageError("LZW code beyond table")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return bytes(out)


def decode_gif(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, 3, RGB pixels) for the FIRST frame of a GIF —
    real LZW decompression + palette lookup. Interlaced frames raise
    (loud, never silent)."""
    if bytes(data[:6]) not in GIF_MAGICS:
        raise ImageError("not a GIF")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 7))
        gct = bytes(data[pos : pos + size])
        pos += size
    n = len(data)
    while pos < n:
        block = data[pos]
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            iw, ih = struct.unpack("<HH", data[pos + 5 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            lct = None
            if iflags & 0x80:
                size = 3 * (2 << (iflags & 7))
                lct = bytes(data[pos : pos + size])
                pos += size
            if iflags & 0x40:
                raise ImageError("interlaced GIF unsupported")
            pal = lct or gct
            if pal is None:
                raise ImageError("GIF missing color table")
            pos += 1  # LZW minimum code size
            min_code = data[pos - 1]
            if not 2 <= min_code <= 8:
                raise ImageError(f"bad LZW min code size {min_code}")
            blocks = bytearray()
            while pos < n and data[pos] != 0:
                cnt = data[pos]
                blocks += data[pos + 1 : pos + 1 + cnt]
                pos += 1 + cnt
            indices = _lzw_decode(bytes(blocks), min_code)
            if len(indices) < iw * ih:
                raise ImageError("GIF pixel data truncated")
            max_idx = len(pal) // 3
            indices = indices[: iw * ih]
            if max(indices) >= max_idx:
                raise ImageError("GIF index beyond palette")
            lut = [pal[3 * i : 3 * i + 3] for i in range(max_idx)]
            return int(iw), int(ih), 3, b"".join(map(lut.__getitem__, indices))
        elif block == 0x3B:
            break
        else:
            raise ImageError(f"bad GIF block 0x{block:02x}")
    raise ImageError("GIF has no image data")


# --- baseline JPEG ---------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_table(bits: list, values: list) -> dict:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over JPEG entropy data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nacc = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # any real marker (incl. RST — those are consumed
                # explicitly at MCU boundaries by consume_restart, spec
                # E.2.4): entropy data for this interval is over
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nacc += 8
        return True

    def consume_restart(self) -> None:
        """At a restart boundary: discard the interval's byte-padding
        bits, then eat the expected RSTn marker (ITU T.81 E.2.4)."""
        self.acc = 0
        self.nacc = 0
        d = self.data
        if (
            self.pos + 2 <= len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ImageError("expected JPEG restart marker")

    def read_bit(self) -> int:
        if self.nacc == 0 and not self._fill():
            raise ImageError("JPEG entropy data exhausted")
        self.nacc -= 1
        return (self.acc >> self.nacc) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageError("bad JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG coefficient sign-extension (spec F.2.2.1)."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


_IDCT_COS = [
    [
        math.cos((2 * x + 1) * u * math.pi / 16)
        * (1 / (2 * math.sqrt(2)) if u == 0 else 0.5)
        for u in range(8)
    ]
    for x in range(8)
]


def _idct_8x8(coef: list) -> list:
    """Separable 2-D inverse DCT → 64 spatial values (level-shifted
    domain, caller adds 128). DC-only blocks short-circuit to the flat
    value (the common case for the fixture encoder's DC-only streams)."""
    if not any(coef[1:]):
        flat = coef[0] * 0.125
        return [flat] * 64
    tmp = [0.0] * 64
    for y in range(8):
        for x in range(8):
            row = coef[y * 8 : y * 8 + 8]
            tmp[y * 8 + x] = sum(row[u] * _IDCT_COS[x][u] for u in range(8))
    out = [0.0] * 64
    for y in range(8):
        cy = _IDCT_COS[y]
        for x in range(8):
            out[y * 8 + x] = sum(tmp[v * 8 + x] * cy[v] for v in range(8))
    return out


def decode_jpeg(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) for BASELINE JPEGs without
    chroma subsampling (grayscale 1-channel, or 3-channel YCbCr 1x1
    returned as raw component planes interleaved; the fixture corpus
    writes grayscale). Real entropy decode: canonical Huffman, diff DC,
    run-length AC, dequantize, inverse zigzag, IDCT."""
    data = bytes(data)
    if not data.startswith(JPEG_MAGIC):
        raise ImageError("not a JPEG")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps: list = []
    width = height = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ImageError("JPEG marker desync")
        marker = data[pos + 1]
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ImageError("16-bit quant tables unsupported")
                qt[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(bits, vals)
                b += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline)
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ImageError("subsampled JPEG unsupported")
                comps.append({"id": cid, "tq": tq})
        elif marker in _JPEG_SOF:
            raise ImageError(f"non-baseline JPEG (SOF {marker:02x})")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                for comp in comps:
                    if comp["id"] == cs:
                        comp["dc"] = tables >> 4
                        comp["ac"] = tables & 0xF
            return _jpeg_scan(
                data, pos + 2 + seg_len, width, height, comps, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seg_len
    raise ImageError("JPEG has no scan")


def _jpeg_scan(data, pos, width, height, comps, qt, huff_dc, huff_ac,
               restart_interval=0):
    if width is None or not comps:
        raise ImageError("JPEG scan before SOF")
    reader = _BitReader(data, pos)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    nc = len(comps)
    planes = [bytearray(bw * 8 * bh * 8) for _ in comps]
    pred = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            # restart boundary (spec E.2.4): byte-align, eat RSTn,
            # reset every component's DC predictor
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.consume_restart()
                pred = [0] * nc
            mcu += 1
            for ci, comp in enumerate(comps):
                q = qt.get(comp["tq"])
                dct = huff_dc.get(comp.get("dc", 0))
                act = huff_ac.get(comp.get("ac", 0))
                if q is None or dct is None or act is None:
                    raise ImageError("JPEG missing tables")
                coef = [0] * 64
                s = reader.read_symbol(dct)
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[ci] += diff
                coef[0] = pred[ci] * q[0]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(act)
                    r, s = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ImageError("JPEG AC run overflow")
                    coef[_ZIGZAG[k]] = _extend(reader.read_bits(s), s) * q[k]
                    k += 1
                spatial = _idct_8x8(coef)
                plane = planes[ci]
                for yy in range(8):
                    row = (by * 8 + yy) * bw * 8 + bx * 8
                    for xx in range(8):
                        v = int(round(spatial[yy * 8 + xx] + 128))
                        plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)
    # crop block padding; interleave components (grayscale → 1 plane)
    out = bytearray(width * height * nc)
    stride = bw * 8
    for y in range(height):
        for ci in range(nc):
            plane = planes[ci]
            base = y * width * nc + ci
            rowbase = y * stride
            for x in range(width):
                out[base + x * nc] = plane[rowbase + x]
    return int(width), int(height), nc, bytes(out)


# --------------------------------------------------------------------------
# WebP lossless (VP8L) — RFC 9649 §3: LSB-first bitstream, canonical
# prefix codes (deflate-style construction), optional LZ77 back-
# references and a color cache, recursive meta prefix (entropy) images,
# and (round 5) all FOUR pixel transforms — predictor (14 modes,
# flat-array border addressing), color (signed (t*c)>>5 deltas),
# subtract-green, and color-indexing incl. sub-byte index packing.
# Remaining documented loud subset: the 120-entry 2D LZ77 distance map
# (its normative offset table is not reconstructible in-sandbox; a
# wrong table would silently corrupt pixels reported as
# decoded='real'). Lossy VP8 stays out of scope (video codec). The
# reference reads all of these through PIL
# (/root/reference/backend/routes/ocr.py:75-82).
# --------------------------------------------------------------------------

_VP8L_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
)
_VP8L_CACHE_MULT = 0x1E35A7BD  # color-cache hash (RFC 9649 §3.6.2.3)


class _Vp8lReader:
    """LSB-first bit reader over the VP8L chunk body."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, count: int) -> int:
        while self.n < count:
            # IndexError on truncation -> ImageError via _safe_decode
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        val = self.acc & ((1 << count) - 1)
        self.acc >>= count
        self.n -= count
        return val


class _VP8LPrefixCode:
    """Canonical prefix decoder (RFC 1951 §3.2.2 code construction, as
    VP8L specifies); a single-symbol code consumes zero bits."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ImageError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        bl_count: dict = {}
        for ln, _ in nz:
            bl_count[ln] = bl_count.get(ln, 0) + 1
        code = 0
        next_code = {}
        for ln in range(1, max(bl_count) + 1):
            code = (code + bl_count.get(ln - 1, 0)) << 1
            next_code[ln] = code
        table = {}
        for s, ln in enumerate(lengths):
            if ln > 0:
                table[(ln, next_code[ln])] = s
                next_code[ln] += 1
        self.table = table
        self.max_len = max(bl_count)
        # completeness (Kraft sum == 1): an incomplete or over-full
        # code would decode corrupt streams into junk pixels reported
        # as decoded='real'; libwebp rejects these too
        kraft = sum(1 << (self.max_len - ln) for ln, _ in nz)
        if kraft != 1 << self.max_len:
            raise ImageError("VP8L: incomplete prefix code")

    @classmethod
    def simple(cls, symbols):
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single, pc.table, pc.max_len = symbols[0], None, 0
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            pc.max_len = 1
        return pc

    def read(self, br: _Vp8lReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ImageError("VP8L: invalid prefix code")


def _vp8l_read_prefix_code(br: _Vp8lReader, alphabet_size: int) -> _VP8LPrefixCode:
    if br.bits(1):  # simple code: 1 or 2 symbols stored directly
        num_symbols = br.bits(1) + 1
        first_is_8bit = br.bits(1)
        syms = [br.bits(8 if first_is_8bit else 1)]
        if num_symbols == 2:
            syms.append(br.bits(8))
        for s in syms:
            if s >= alphabet_size:
                raise ImageError("VP8L: simple-code symbol out of range")
        return _VP8LPrefixCode.simple(syms)
    num_codes = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_VP8L_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_code = _VP8LPrefixCode(cl_lengths)
    lengths = [0] * alphabet_size
    if br.bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        clen = cl_code.read(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen:
                prev_len = clen
        else:
            if clen == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif clen == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ImageError("VP8L: code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _VP8LPrefixCode(lengths)


def _vp8l_lz77_value(br: _Vp8lReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _vp8l_avg2(a: int, b: int) -> int:
    """Per-byte floor average of two ARGB words (carry-free)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _vp8l_apply_subtract_green(pix) -> None:
    """Inverse subtract-green (RFC 9649 §3.5.3): add green back into
    red and blue, mod 256."""
    for i, v in enumerate(pix):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        pix[i] = (v & 0xFF00FF00) | (r << 16) | b


def _vp8l_apply_predictor(pix, width: int, height: int, data) -> None:
    """Inverse predictor transform (RFC 9649 §3.5.1): per-block mode
    from the sub-image's green channel; residuals add per byte to the
    predicted neighbor combination. Border rules: (0,0) predicts
    opaque black, the top row predicts L, the left column predicts T;
    flat-array addressing makes the last column's TR the current row's
    first pixel — the spec's exact out-of-bounds rule."""
    size_bits, block_w, sub = data

    def clamp(v: int) -> int:
        return 0 if v < 0 else (255 if v > 255 else v)

    def cas_full(l: int, t: int, tl: int) -> int:
        out = 0
        for sh in (0, 8, 16, 24):
            out |= clamp(
                ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            ) << sh
        return out

    def cas_half(l: int, t: int, tl: int) -> int:
        a = _vp8l_avg2(l, t)
        out = 0
        for sh in (0, 8, 16, 24):
            ac, bc = (a >> sh) & 0xFF, (tl >> sh) & 0xFF
            out |= clamp(ac + int((ac - bc) / 2)) << sh  # C trunc-toward-0
        return out

    def select(l: int, t: int, tl: int) -> int:
        pl = pt = 0
        for sh in (0, 8, 16, 24):
            lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
            p = lc + tc - tlc
            pl += abs(p - lc)
            pt += abs(p - tc)
        return l if pl <= pt else t

    for pos in range(width * height):
        x, y = pos % width, pos // width
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[pos - 1]
        elif x == 0:
            pred = pix[pos - width]
        else:
            mode = (
                sub[(y >> size_bits) * block_w + (x >> size_bits)] >> 8
            ) & 0xFF
            left = pix[pos - 1]
            top = pix[pos - width]
            tl = pix[pos - width - 1]
            tr = pix[pos - width + 1]  # last column: current row's first
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
            elif mode == 6:
                pred = _vp8l_avg2(left, tl)
            elif mode == 7:
                pred = _vp8l_avg2(left, top)
            elif mode == 8:
                pred = _vp8l_avg2(tl, top)
            elif mode == 9:
                pred = _vp8l_avg2(top, tr)
            elif mode == 10:
                pred = _vp8l_avg2(_vp8l_avg2(left, tl), _vp8l_avg2(top, tr))
            elif mode == 11:
                pred = select(left, top, tl)
            elif mode == 12:
                pred = cas_full(left, top, tl)
            elif mode == 13:
                pred = cas_half(left, top, tl)
            else:
                raise ImageError("VP8L: bad predictor mode")
        v = pix[pos]
        pix[pos] = (
            (((v & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF)
            | (((v & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00)
        )


def _vp8l_apply_color_transform(pix, width: int, height: int, data) -> None:
    """Inverse color transform (RFC 9649 §3.5.2): per-block
    ColorTransformElement (green_to_red in the blue channel,
    green_to_blue in green, red_to_blue in red); deltas are signed
    (t*c)>>5 products added mod 256 — red first, then blue using the
    NEW red."""
    size_bits, block_w, sub = data
    for pos in range(width * height):
        x, y = pos % width, pos // width
        e = sub[(y >> size_bits) * block_w + (x >> size_bits)]
        g2r = _vp8l_s8(e & 0xFF)
        g2b = _vp8l_s8((e >> 8) & 0xFF)
        r2b = _vp8l_s8((e >> 16) & 0xFF)
        v = pix[pos]
        g = _vp8l_s8((v >> 8) & 0xFF)
        r = (((v >> 16) & 0xFF) + ((g2r * g) >> 5)) & 0xFF
        b = ((v & 0xFF) + ((g2b * g) >> 5) + ((r2b * _vp8l_s8(r)) >> 5)) & 0xFF
        pix[pos] = (v & 0xFF00FF00) | (r << 16) | b


def _vp8l_apply_color_indexing(pix, packed_w: int, height: int,
                               orig_w: int, data):
    """Inverse color-indexing (RFC 9649 §3.5.4): indices live in the
    green channel; palettes of ≤16 colors pack several sub-byte
    indices per green byte, leftmost pixel in the least-significant
    bits. Out-of-range indices decode as transparent black (0),
    matching libwebp."""
    wb, pal = data
    n = len(pal)
    if wb == 0:
        return [
            pal[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < n else 0 for p in pix
        ]
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    out = [0] * (orig_w * height)
    for y in range(height):
        row = y * packed_w
        for px in range(packed_w):
            packed = (pix[row + px] >> 8) & 0xFF
            base = px * per
            for k in range(per):
                x = base + k
                if x >= orig_w:
                    break
                idx = (packed >> (k * ibits)) & mask
                out[y * orig_w + x] = pal[idx] if idx < n else 0
    return out


def _vp8l_read_transforms(br: _Vp8lReader, width: int, height: int):
    """Read the transform chain (RFC 9649 §3.5): each may appear once;
    color-indexing shrinks the effective width for everything read
    after it (and for the spatial image). Returns (transforms,
    spatial_width) — each entry records the width it applies at."""
    transforms = []
    cur_w = width
    while br.bits(1):
        ttype = br.bits(2)
        if any(t[0] == ttype for t in transforms):
            raise ImageError("VP8L: duplicate transform")
        if ttype == 2:  # subtract green: no payload
            transforms.append((2, cur_w, None))
        elif ttype in (0, 1):  # predictor / color: block-mode sub-image
            size_bits = br.bits(3) + 2
            bw = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh = (height + (1 << size_bits) - 1) >> size_bits
            sub = _vp8l_decode_pixels(br, bw, bh, False)
            transforms.append((ttype, cur_w, (size_bits, bw, sub)))
        else:  # color indexing: delta-coded palette as a 1-high image
            tsize = br.bits(8) + 1
            coded = _vp8l_decode_pixels(br, tsize, 1, False)
            pal = [coded[0] & 0xFFFFFFFF]
            for i in range(1, tsize):
                prev, cur = pal[i - 1], coded[i]
                entry = 0
                for sh in (0, 8, 16, 24):
                    entry |= (((prev >> sh) + (cur >> sh)) & 0xFF) << sh
                pal.append(entry)
            if tsize <= 2:
                wb = 3
            elif tsize <= 4:
                wb = 2
            elif tsize <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append((3, cur_w, (wb, pal)))
            if wb:
                cur_w = (cur_w + (1 << wb) - 1) >> wb
    return transforms, cur_w


def _vp8l_decode_pixels(br: _Vp8lReader, width: int, height: int, level0: bool):
    """Decode one spatially-coded image stream to a list of ARGB ints.
    ``level0`` marks the MAIN image, which alone may carry meta prefix
    codes; transform sub-images and entropy images pass False. The
    transform chain is read by the caller (decode_webp) before this."""
    cache = None
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ImageError("VP8L: bad color-cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_prec = meta_w = 0
    num_groups = 1
    if level0 and br.bits(1):  # meta prefix codes via an entropy image
        meta_prec = br.bits(3) + 2
        meta_w = (width + (1 << meta_prec) - 1) >> meta_prec
        meta_h = (height + (1 << meta_prec) - 1) >> meta_prec
        entropy = _vp8l_decode_pixels(br, meta_w, meta_h, False)
        meta = [(p >> 8) & 0xFFFF for p in entropy]
        num_groups = max(meta) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            tuple(
                _vp8l_read_prefix_code(br, size)
                for size in (green_alpha, 256, 256, 256, 40)
            )
        )
    pix = [0] * (width * height)
    npix = width * height
    pos = 0
    cache_shift = 32 - cache_bits if cache_bits else 0
    while pos < npix:
        if meta is None:
            gc, rc, bc, ac, dc = groups[0]
        else:
            mi = meta[
                ((pos // width) >> meta_prec) * meta_w + ((pos % width) >> meta_prec)
            ]
            gc, rc, bc, ac, dc = groups[mi]
        sym = gc.read(br)
        if sym < 256:  # literal: read order green, red, blue, alpha
            # (explicit sequencing — an inline or-expression would read
            # alpha's bits FIRST via Python left-to-right evaluation)
            red = rc.read(br)
            blue = bc.read(br)
            alpha = ac.read(br)
            val = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pix[pos] = val
            if cache is not None:
                cache[(_VP8L_CACHE_MULT * val & 0xFFFFFFFF) >> cache_shift] = val
            pos += 1
        elif sym < 280:  # LZ77 back-reference
            length = _vp8l_lz77_value(br, sym - 256)
            dist_code = _vp8l_lz77_value(br, dc.read(br))
            if dist_code <= 120:
                raise ImageError(
                    "VP8L 2D distance map unsupported (subset decoder)"
                )
            dist = dist_code - 120
            if dist > pos:
                raise ImageError("VP8L: back-reference before image start")
            if pos + length > npix:
                raise ImageError("VP8L: back-reference overflows image")
            for _ in range(length):
                val = pix[pos - dist]
                pix[pos] = val
                if cache is not None:
                    cache[(_VP8L_CACHE_MULT * val & 0xFFFFFFFF) >> cache_shift] = val
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ImageError("VP8L: cache symbol without color cache")
            pix[pos] = cache[sym - 280]
            pos += 1
    return pix


def webp_is_lossless(payload: bytes) -> bool:
    """True when the container's first chunk is a VP8L bitstream."""
    data = bytes(payload)
    return len(data) >= 16 and data[12:16] == b"VP8L"


def decode_webp(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, 4, RGBA pixels) for lossless (VP8L) WebP.
    ImageError for lossy/extended containers (VP8 entropy coding is a
    video codec, out of scope) and malformed streams."""
    if data[12:16] != b"VP8L":
        raise ImageError(
            "WebP lossy/extended pixel decode unsupported (VP8 is a video codec)"
        )
    size = struct.unpack("<I", data[16:20])[0]
    body = data[20 : 20 + size]
    if len(body) < 5:
        raise ImageError("VP8L: truncated chunk")
    br = _Vp8lReader(body)
    if br.bits(8) != 0x2F:
        raise ImageError("VP8L: signature byte missing")
    width = br.bits(14) + 1
    height = br.bits(14) + 1
    br.bits(1)  # alpha hint (informational)
    if br.bits(3) != 0:
        raise ImageError("VP8L: unknown version")
    transforms, cur_w = _vp8l_read_transforms(br, width, height)
    pix = _vp8l_decode_pixels(br, cur_w, height, True)
    w = cur_w
    # inverses run in reverse bitstream order (§3.5)
    for ttype, t_w, data in reversed(transforms):
        if ttype == 3:
            pix = _vp8l_apply_color_indexing(pix, w, height, t_w, data)
            w = t_w
        elif ttype == 2:
            _vp8l_apply_subtract_green(pix)
        elif ttype == 0:
            _vp8l_apply_predictor(pix, w, height, data)
        else:
            _vp8l_apply_color_transform(pix, w, height, data)
    out = bytearray(width * height * 4)
    for i, v in enumerate(pix):
        j = 4 * i
        out[j] = (v >> 16) & 0xFF
        out[j + 1] = (v >> 8) & 0xFF
        out[j + 2] = v & 0xFF
        out[j + 3] = (v >> 24) & 0xFF
    return width, height, 4, bytes(out)


def _safe_decode(dec, payload: bytes) -> Tuple[int, int, int, bytes]:
    """Run a decoder, normalizing every malformed-payload failure mode
    (short reads → struct.error/IndexError, empty sequences →
    ValueError) to ImageError so the error-as-row contract holds —
    a corrupt payload must never fail a Spark task."""
    try:
        return dec(bytes(payload))
    except ImageError:
        raise
    except (struct.error, IndexError, ValueError, zlib.error) as exc:
        raise ImageError(f"malformed payload: {exc}") from exc


_DECODERS = {
    "png": decode_png,
    "gif": decode_gif,
    "jpeg": decode_jpeg,
    "webp": decode_webp,
}


def decode_image(payload: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) via the real stdlib decoder
    for PNG/GIF/JPEG/WebP-lossless; ImageError for lossy WebP (VP8 is
    a video codec, out of scope) and malformed payloads."""
    kind = sniff_image_kind(payload)
    dec = _DECODERS.get(kind or "")
    if dec is None:
        raise ImageError(f"no decoder for {kind or 'unknown payload'}")
    return _safe_decode(dec, payload)


def image_stats_row(payload: bytes) -> Optional[Tuple]:
    """Shared per-image row for the pixel-stats surface (the Spark UDF
    and the fixture golden MUST run this same function or the
    byte-identical gate drifts): (img_kind, width, height, n_samples,
    mean_pm, spread_pm, decoded) — decoded is 'real' (PNG/GIF/JPEG/
    WebP-lossless pixel stats), 'header-only' (lossy WebP: VP8 entropy
    coding out of scope), or 'decode-error' (header parsed but the
    body doesn't decode). None for non-images / unparseable headers."""
    kind = sniff_image_kind(payload)
    if kind is None:
        return None
    try:
        w, h = image_dimensions(payload)
    except ImageError:
        return None
    if kind not in _DECODERS or (kind == "webp" and not webp_is_lossless(payload)):
        # lossy/extended WebP: VP8 entropy coding out of scope
        return (kind, w, h, None, None, None, "header-only")
    try:
        dw, dh, n, mean_pm, spread_pm = image_pixel_stat_values(payload)
        # decoded rows report the DECODER's dims so width*height*ch ==
        # n_samples always holds (a GIF's first frame may be smaller
        # than its logical screen; the header reports the screen)
        return (kind, dw, dh, n, mean_pm, spread_pm, "real")
    except ImageError:
        return (kind, w, h, None, None, None, "decode-error")


def image_pixel_stat_values(data: bytes) -> Tuple[int, int, int, int, int]:
    """(width, height, n_samples, mean_per_mille, spread_per_mille) —
    deterministic integer pixel statistics for the decode-verification
    path (per-mille of full scale, round-half-even like both engines'
    round())."""
    width, height, channels, pixels = decode_image(data)
    n = width * height * channels
    total = sum(pixels)
    mean_pm = round(1000 * total / (n * 255)) if n else 0
    spread_pm = round(1000 * (max(pixels) - min(pixels)) / 255) if n else 0
    return width, height, n, mean_pm, spread_pm


def png_pixel_stats(data: bytes) -> Tuple[int, int, int]:
    """Back-compat alias (PNG was the only real decoder before GIF/JPEG
    landed): (n_samples, mean_pm, spread_pm); decodes any supported
    format now."""
    return image_pixel_stat_values(data)[2:]


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


def _encode_png(width: int, height: int, pixels: bytes, channels: int) -> bytes:
    """Shared PNG encode core: filter-None rows, zlib IDAT, correct
    CRCs. ``channels`` 1 (gray) or 3 (RGB)."""
    if len(pixels) != width * height * channels:
        raise ImageError("pixel buffer size mismatch")
    color_type = {1: 0, 3: 2}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter: None
        rows += pixels[y * stride : (y + 1) * stride]
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Real 8-bit grayscale PNG encoder (stdlib)."""
    return _encode_png(width, height, pixels, 1)


def encode_png_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """Real 8-bit RGB PNG encoder (stdlib); row-major RGB pixels."""
    return _encode_png(width, height, pixels, 3)


def resample_nearest(
    w: int, h: int, ch: int, px: bytes, new_w: int, new_h: int
) -> bytes:
    """Deterministic nearest-neighbor resample (dst pixel (x,y) reads
    src (x*w//new_w, y*h//new_h)) — the engine's stand-in for PIL's
    resize kernel (ocr_utils.py:467-494 resizes through PIL; no PIL
    in-sandbox, and nearest is the only kernel with an exact integer
    definition both up- and down-scale)."""
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = y * h // new_h
        src_row = sy * w * ch
        dst_row = y * new_w * ch
        for x in range(new_w):
            sx = x * w // new_w
            out[dst_row + x * ch : dst_row + (x + 1) * ch] = px[
                src_row + sx * ch : src_row + (sx + 1) * ch
            ]
    return bytes(out)


def resize_image_payload(payload: bytes, max_size: int = 2048) -> Tuple:
    """The reference's resize_if_needed with REAL pixels
    (ocr_utils.py:467-494): decode; when a side exceeds 300 px, scale
    the LONGEST side to ``max_size`` (keeping its asymmetric int()
    truncation on the short side), nearest-neighbor resample, re-encode
    as PNG (gray or RGB per the decoded channel count). Returns
    (orig_w, orig_h, new_w, new_h, png_bytes); unresized images return
    their dims with png_bytes=None (the caller keeps the original
    payload, as the reference does)."""
    w, h, ch, px = decode_image(payload)
    if not (w > 300 or h > 300):
        return (w, h, w, h, None)
    if ch in (2, 4):  # drop the alpha plane before re-encode
        keep = ch - 1
        stripped = bytearray()
        for i in range(0, len(px), ch):
            stripped += px[i : i + keep]
        px, ch = bytes(stripped), keep
    if w >= h:
        new_w, new_h = max_size, int(h * (max_size / w))
    else:
        new_w, new_h = int(w * (max_size / h)), max_size
    if new_w < 1 or new_h < 1:
        # the reference's int() truncation produces 0 here and PIL then
        # errors — surface the same failure as an error row, not a
        # silently different geometry
        raise ImageError(f"degenerate resize target {new_w}x{new_h}")
    out = resample_nearest(w, h, ch, px, new_w, new_h)
    if ch == 1:
        png = encode_png_gray(new_w, new_h, out)
    elif ch == 3:
        png = encode_png_rgb(new_w, new_h, out)
    else:
        raise ImageError(f"unsupported channel count {ch} for re-encode")
    return (w, h, new_w, new_h, png)


def write_png(width: int, height: int, seed: int = 0) -> bytes:
    """Grayscale PNG with a deterministic byte pattern; real zlib IDAT
    and CRCs — any standards-compliant reader accepts it."""
    pixels = bytes(
        (x * 31 + y * 17 + seed) & 0xFF for y in range(height) for x in range(width)
    )
    return encode_png_gray(width, height, pixels)


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nacc = 0

    def byte_align(self) -> None:
        """Pad the current byte with 1s (spec F.1.2.3) — precedes every
        restart marker."""
        if self.nacc:
            pad = 8 - self.nacc
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0

    def write_marker(self, byte2: int) -> None:
        """Raw FF xx marker — bypasses stuffing (markers are real)."""
        self.byte_align()
        self.out += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


_JPEG_Q = 16  # uniform quant step for the fixture encoder

# fixture Huffman tables (carried in DHT — JPEG files define their own
# tables; nothing requires the Annex K defaults): DC = twelve 4-bit
# codes for categories 0-11; AC = a single 1-bit EOB code (the encoder
# quantizes every AC coefficient to zero: a valid DC-only baseline
# stream, 8x8 block means as real pixels)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [1] + [0] * 15
_AC_VALS = [0x00]


def write_jpeg(
    width: int, height: int, seed: int = 0, restart_interval: int = 0
) -> bytes:
    """REAL baseline grayscale JPEG: deterministic pixels, FDCT-exact
    DC coefficients (AC quantized to zero → each 8x8 block carries its
    mean), canonical Huffman tables declared in DHT, byte stuffing,
    decodable by any standards-compliant reader (incl. decode_jpeg).
    ``restart_interval`` > 0 emits a DRI segment plus RSTn markers with
    DC-predictor resets every that-many MCUs (spec E.2.4)."""
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    bw, bh = (width + 7) // 8, (height + 7) // 8

    def pixel(x: int, y: int) -> int:
        return (x * 31 + y * 17 + seed) & 0xFF

    writer = _BitWriter()
    pred = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.write_marker(0xD0 + (mcu // restart_interval - 1) % 8)
                pred = 0
            mcu += 1
            total = 0
            for yy in range(8):
                sy = min(by * 8 + yy, height - 1)  # edge-replicate pad
                for xx in range(8):
                    total += pixel(min(bx * 8 + xx, width - 1), sy)
            dc = round((total - 128 * 64) / 8 / _JPEG_Q)  # S00/q
            diff = dc - pred
            pred = dc
            s = abs(diff).bit_length()
            code, nbits = dc_codes[s]
            writer.write(code, nbits)
            if s:
                writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            writer.write(0, 1)  # EOB ('0', the lone AC code)
    scan = writer.flush()

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([_JPEG_Q] * 64)
    dht = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 17 + len(_DC_VALS) + 17 + len(_AC_VALS))
        + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return b"\xff\xd8" + app0 + dqt + dht + dri + sof0 + sos + scan + b"\xff\xd9"


def _huff_codes(bits: list, values: list) -> dict:
    """{symbol: (code, length)} — the encoder-side canonical table."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def write_gif(width: int, height: int, seed: int = 0) -> bytes:
    """REAL GIF89a: 256-entry grayscale palette, deterministic pixel
    indices, valid LZW stream (9-bit literal codes with periodic CLEAR
    so the table never grows — the classic 'uncompressed GIF' encoding
    every decoder accepts)."""
    gct = bytes(v for i in range(256) for v in (i, i, i))
    screen = struct.pack("<HH", width, height) + bytes([0xF7, 0x00, 0x00])
    descriptor = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"

    clear, eoi = 256, 257
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:  # 9-bit LSB-first packing
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += 9
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    run = 0
    for y in range(height):
        for x in range(width):
            emit((x * 31 + y * 17 + seed) & 0xFF)
            run += 1
            if run == 250:  # keep the decoder's table below 512 entries
                emit(clear)
                run = 0
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"GIF89a" + screen + gct + descriptor + b"\x08" + bytes(blocks) + b"\x3b"


class _Vp8lBitWriter:
    """LSB-first bit writer (mirror of _Vp8lReader); also used by the
    codec tests to hand-assemble LZ77 / color-cache streams."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)

    def simple2(self, s0: int, s1: int) -> None:
        """Simple prefix code with two 8-bit symbols (1 bit/use)."""
        self.write(1, 1)  # simple
        self.write(1, 1)  # two symbols
        self.write(1, 1)  # first symbol is 8-bit
        self.write(s0, 8)
        self.write(s1, 8)

    def simple1(self, s0: int) -> None:
        """Simple prefix code with one 8-bit symbol (0 bits/use)."""
        self.write(1, 1)
        self.write(0, 1)
        self.write(1, 1)
        self.write(s0, 8)


def _vp8l_container(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"  # RIFF chunks are even-padded
    payload = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _vp8l_palette(seed: int) -> Tuple:
    """Two distinct values per RGB channel, derived from the seed."""
    pals = []
    for a, b, c in ((37, 59, 101), (43, 71, 159), (29, 83, 201)):
        v0 = (seed * a + c // 3) % 256
        v1 = (seed * b + c) % 256
        if v1 == v0:
            v1 = (v0 + 97) % 256
        pals.append((v0, v1))
    return tuple(pals)


def _vp8l_pattern_bits(x: int, y: int, seed: int) -> Tuple[int, int, int]:
    """(green, red, blue) palette-select bits at (x, y)."""
    g = ((x * 3 + y * 7 + seed) >> 2) & 1
    r = ((x * 5 + y * 11 + seed * 3 + 1) >> 2) & 1
    b = ((x * 7 + y * 13 + seed * 5 + 2) >> 2) & 1
    return g, r, b


def write_webp_lossless(width: int, height: int, seed: int = 0,
                        subtract_green: bool = False) -> bytes:
    """Real lossless WebP: a VP8L bitstream (RFC 9649) with no color
    cache, literal-only coding and 2-symbol simple prefix codes per
    RGB channel — eight distinct stored triples in a deterministic
    per-seed pattern, decodable by any compliant reader. Alpha is
    constant 255 (0 bits/pixel). ``subtract_green=True`` emits the
    subtract-green transform header, so a compliant decoder adds green
    back into red/blue — the stored bits are identical, the DECODED
    pixels differ (exercises the transform path end to end)."""
    bw = _Vp8lBitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN (no payload)
    bw.write(0, 1)  # no (more) transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    (g0, g1), (r0, r1), (b0, b1) = _vp8l_palette(seed)
    bw.simple2(g0, g1)  # green
    bw.simple2(r0, r1)  # red
    bw.simple2(b0, b1)  # blue
    bw.simple1(255)     # alpha: constant
    bw.simple1(1)       # distance: never used, must still be defined
    for y in range(height):
        for x in range(width):
            g, r, b = _vp8l_pattern_bits(x, y, seed)
            # literal decode order green, red, blue (alpha is 0-bit)
            bw.write(g | (r << 1) | (b << 2), 3)
    return _vp8l_container(bw.finish())


def write_webp_extended(width: int, height: int, seed: int = 0) -> bytes:
    """WebP VP8X container carrying only the canvas size — the
    header-only stand-in for lossy WebP (VP8 decode out of scope)."""
    vp8x = (
        b"\x00\x00\x00\x00"
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    payload = b"WEBP" + chunk + bytes([seed & 0xFF, 0])
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def webp_seed_is_lossless(seed: int) -> bool:
    """THE dispatch rule for fixture WebP payloads — the corpus
    generator sizes dims by this same predicate (real VP8L pixels need
    bounded dims; header-only shells don't), so it must have exactly
    one definition."""
    return seed % 2 == 0


def write_webp(width: int, height: int, seed: int = 0) -> bytes:
    """Fixture WebP: lossless seeds emit a real VP8L image — every
    third one carrying the subtract-green transform (round 5: the
    transform decode path is corpus-exercised, not just unit-tested) —
    the rest the header-only VP8X shell (keeps the lossy 'header-only'
    pipeline path exercised)."""
    if webp_seed_is_lossless(seed):
        return write_webp_lossless(
            width, height, seed, subtract_green=seed % 3 == 0
        )
    return write_webp_extended(width, height, seed)
