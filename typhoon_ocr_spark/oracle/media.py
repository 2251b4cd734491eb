"""Audio/video container parsing — REAL, pure stdlib.

The reference's scope stops at raster images, but the north-star
pipeline (BASELINE.json) treats multimodal payloads as opaque binary
columns with typed metadata. This module makes the audio/video half of
that REAL where stdlib allows:

- WAV (RIFF/WAVE): full header parse (fmt chunk) AND PCM16 sample
  statistics — a true decode, verified against the writer's exact
  synth formula.
- MP4 (ISO BMFF): box walk to moov/mvhd for timescale + duration (the
  metadata every pipeline needs for frame-sampling plans); frame
  DECODE stays out of scope (video codecs), exactly like lossy WebP.
- MP3 (MPEG-1/2/2.5 audio): ID3v2 skip + full frame-header walk —
  version/layer/bitrate/sample-rate per frame, duration summed from
  real per-frame sample counts (CBR and VBR alike). Entropy DECODE of
  the audio (Huffman + IMDCT) stays out of scope, same contract.

Writers at the bottom build deterministic fixture payloads. Error
contract matches oracle/images.py: malformed payloads raise MediaError
so operators emit error rows, never task failures.
"""

from __future__ import annotations

import math
import struct
from typing import Optional, Tuple


class MediaError(ValueError):
    pass


def sniff_media_kind(payload: Optional[bytes]) -> Optional[str]:
    """'wav' | 'mp4' | 'mp3' | None."""
    if payload is None:
        return None
    data = bytes(payload)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:3] == b"ID3":
        return "mp3"
    if len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        # bare frame sync: one plausible header classifies far too many
        # arbitrary binaries as mp3 (ADVICE r4) — also require the NEXT
        # frame header to be valid, unless the stream ends inside or
        # exactly at the first frame (single-frame file)
        hdr = _mp3_header(data, 0)
        if hdr is not None:
            frame_len = hdr[0]
            if frame_len >= len(data) or _mp3_header(data, frame_len) is not None:
                return "mp3"
    return None


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def parse_wav(payload: bytes) -> Tuple[int, int, int, list]:
    """(sample_rate, channels, bits_per_sample, samples) — full PCM16
    decode. Chunk-walks the RIFF body (fmt may be preceded by other
    chunks; odd-sized chunks are padded per RIFF)."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    try:
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise MediaError("truncated WAV chunk")
            if tag == b"fmt ":
                audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if audio_fmt != 1 or bits != 16:
                    raise MediaError(f"unsupported WAV format {audio_fmt}/{bits}")
                fmt = (rate, channels, bits)
            elif tag == b"data":
                if len(body) % 2:
                    raise MediaError("odd PCM16 data size")
                samples = list(
                    struct.unpack("<%dh" % (len(body) // 2), body)
                )
            pos += 8 + size + (size & 1)  # RIFF even padding
    except struct.error as exc:
        raise MediaError(f"malformed WAV: {exc}") from exc
    if fmt is None or samples is None:
        raise MediaError("WAV missing fmt or data chunk")
    return fmt[0], fmt[1], fmt[2], samples


def wav_stats(payload: bytes) -> Tuple[int, int, int, int, int, int]:
    """(sample_rate, channels, n_samples, duration_ms, mean_pm,
    spread_pm) — deterministic integer stats over |PCM| amplitude
    (per-mille of full scale 32768), duration rounded to ms."""
    rate, channels, _bits, samples = parse_wav(payload)
    n = len(samples)
    frames = n // max(channels, 1)
    duration_ms = round(1000 * frames / rate) if rate else 0
    if n:
        mean_pm = round(1000 * (sum(abs(s) for s in samples) / n) / 32768)
        spread_pm = round(1000 * (max(samples) - min(samples)) / 65535)
    else:
        mean_pm = spread_pm = 0
    return rate, channels, n, duration_ms, mean_pm, spread_pm


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format)
# ---------------------------------------------------------------------------

def parse_mp4_meta(payload: bytes) -> Tuple[int, int, int]:
    """(timescale, duration_units, duration_ms) from moov/mvhd.
    Supports mvhd version 0 (32-bit) and 1 (64-bit) fields."""
    data = bytes(payload)

    def walk(start: int, end: int, path: tuple):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", data[pos : pos + 4])[0]
            tag = data[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise MediaError("truncated MP4 box header")
                size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
                body_off = 16
            else:
                body_off = 8
            if size < body_off or pos + size > end:
                raise MediaError("malformed MP4 box size")
            if tag == path[0]:
                if len(path) == 1:
                    return pos + body_off, pos + size
                return walk(pos + body_off, pos + size, path[1:])
            pos += size
        raise MediaError(f"MP4 box {path[0]!r} not found")

    try:
        b0, b1 = walk(0, len(data), (b"moov", b"mvhd"))
        version = data[b0]
        if version == 1:
            timescale = struct.unpack(">I", data[b0 + 20 : b0 + 24])[0]
            duration = struct.unpack(">Q", data[b0 + 24 : b0 + 32])[0]
        else:
            timescale = struct.unpack(">I", data[b0 + 12 : b0 + 16])[0]
            duration = struct.unpack(">I", data[b0 + 16 : b0 + 20])[0]
    except (struct.error, IndexError) as exc:
        raise MediaError(f"malformed MP4: {exc}") from exc
    if not timescale:
        raise MediaError("MP4 mvhd timescale is zero")
    return timescale, duration, round(1000 * duration / timescale)


# ---------------------------------------------------------------------------
# MP4 sample tables: raw-grayscale video tracks ('rawg')
# ---------------------------------------------------------------------------
# Real ISO-BMFF sample-table parsing (stsd/stts-equivalent via mdhd,
# stsz, stco): exactly the machinery a frame extractor walks for ANY
# codec. The sample PAYLOAD here is uncompressed 8-bit grayscale (a
# custom 'rawg' entry) — decode is a slice, so the frame pipeline is
# fully real end-to-end; compressed codecs (H.264/VP9) would plug into
# the same walk and remain the documented out-of-scope stub.


def _walk_box(data: bytes, start: int, end: int, path: tuple):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise MediaError("truncated MP4 box header")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body_off = 16
        else:
            body_off = 8
        if size < body_off or pos + size > end:
            raise MediaError("malformed MP4 box size")
        if tag == path[0]:
            if len(path) == 1:
                return pos + body_off, pos + size
            return _walk_box(data, pos + body_off, pos + size, path[1:])
        pos += size
    raise MediaError(f"MP4 box {path[0]!r} not found")


def parse_mp4_frames(payload: bytes):
    """(width, height, fps, [frame_bytes]) from a 'rawg' video track:
    moov/trak/mdia walk → mdhd (timescale=fps, duration=frame count),
    stbl/stsd ('rawg' entry carrying width/height), stsz (sample
    sizes), stco (chunk offset; samples contiguous). Frame bytes are
    width*height grayscale."""
    data = bytes(payload)
    try:
        t0, t1 = _walk_box(data, 0, len(data), (b"moov", b"trak", b"mdia"))
        m0, m1 = _walk_box(data, t0, t1, (b"mdhd",))
        version = data[m0]
        if version == 1:
            timescale = struct.unpack(">I", data[m0 + 20 : m0 + 24])[0]
        else:
            timescale = struct.unpack(">I", data[m0 + 12 : m0 + 16])[0]
        s0, s1 = _walk_box(data, t0, t1, (b"minf", b"stbl"))
        d0, _d1 = _walk_box(data, s0, s1, (b"stsd",))
        # stsd: version/flags(4) entry_count(4) then entries
        fmt = data[d0 + 12 : d0 + 16]
        if fmt != b"rawg":
            raise MediaError(f"unsupported sample format {fmt!r}")
        width, height = struct.unpack(">HH", data[d0 + 16 : d0 + 20])
        z0, _z1 = _walk_box(data, s0, s1, (b"stsz",))
        sample_size, count = struct.unpack(">II", data[z0 + 4 : z0 + 12])
        if sample_size:
            sizes = [sample_size] * count
        else:
            sizes = list(
                struct.unpack(
                    ">%dI" % count, data[z0 + 12 : z0 + 12 + 4 * count]
                )
            )
        c0, _c1 = _walk_box(data, s0, s1, (b"stco",))
        n_chunks = struct.unpack(">I", data[c0 + 4 : c0 + 8])[0]
        if n_chunks != 1:
            raise MediaError("rawg tracks are single-chunk")
        offset = struct.unpack(">I", data[c0 + 8 : c0 + 12])[0]
    except (struct.error, IndexError) as exc:
        raise MediaError(f"malformed MP4 sample tables: {exc}") from exc
    frames = []
    pos = offset
    for size in sizes:
        frame = data[pos : pos + size]
        if len(frame) != size or size != width * height:
            raise MediaError("truncated or mis-sized video sample")
        frames.append(frame)
        pos += size
    if not timescale:
        raise MediaError("mdhd timescale is zero")
    return width, height, timescale, frames


def frame_stats_rows(payload: bytes):
    """Shared per-payload rows for the frame-extraction surface (the
    Spark UDF and the fixture golden MUST run this same function):
    sample the decoded frames at 1 fps (the frame_plan contract: one
    frame per second of media time, capped at 64) and report pixel
    statistics per sampled frame:
    [(frame_idx, src_frame, width, height, mean_pm, spread_pm)].
    None when the payload is not a parseable rawg video."""
    try:
        width, height, fps, frames = parse_mp4_frames(payload)
    except MediaError:
        return None
    if not frames:
        return None
    duration_s = len(frames) / fps
    n_samples = min(int(duration_s), 64)
    rows = []
    for i in range(n_samples):
        src = min(i * fps, len(frames) - 1)
        px = frames[src]
        mean_pm = round(1000 * (sum(px) / len(px)) / 255)
        spread_pm = round(1000 * (max(px) - min(px)) / 255)
        rows.append((i, src, width, height, mean_pm, spread_pm))
    return rows


def write_mp4_video(seed: int = 0, width: int = 24, height: int = 16,
                    n_frames: int = 12, fps: int = 2) -> bytes:
    """Deterministic raw-grayscale MP4: ftyp + mdat of contiguous
    width*height frames + moov carrying real mvhd AND a full video
    trak with mdhd/stsd('rawg')/stsz/stco sample tables."""
    frames = []
    for f in range(n_frames):
        frames.append(bytes(
            (seed * 31 + f * 47 + (x % width) * 3 + (x // width) * 7) % 256
            for x in range(width * height)
        ))
    mdat_body = b"".join(frames)
    ftyp = b"ftyp" + b"isom" + struct.pack(">I", 512) + b"isomiso2"
    ftyp = struct.pack(">I", 8 + len(ftyp) - 4) + ftyp
    # mdat directly after ftyp: stco offset = len(ftyp) + 8
    mdat = struct.pack(">I", 8 + len(mdat_body)) + b"mdat" + mdat_body
    data_offset = len(ftyp) + 8

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    timescale = fps
    duration = n_frames
    mvhd = bytes(4) + struct.pack(">II", seed, seed)
    mvhd += struct.pack(">II", 1000, round(1000 * n_frames / fps))
    mvhd += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100) + bytes(2)
    mvhd += bytes(8)
    mvhd += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd += bytes(24) + struct.pack(">I", 2)
    mdhd = bytes(4) + struct.pack(">II", seed, seed)
    mdhd += struct.pack(">II", timescale, duration) + bytes(4)
    stsd = bytes(4) + struct.pack(">I", 1) + box(
        b"rawg", struct.pack(">HH", width, height)
    )
    stsz = bytes(4) + struct.pack(">II", width * height, n_frames)
    stco = bytes(4) + struct.pack(">II", 1, data_offset)
    stbl = box(b"stsd", stsd) + box(b"stsz", stsz) + box(b"stco", stco)
    minf = box(b"stbl", stbl)
    mdia = box(b"mdhd", mdhd) + box(b"minf", minf)
    trak = box(b"mdia", mdia)
    moov = box(b"mvhd", mvhd) + box(b"trak", trak)
    return ftyp + mdat + box(b"moov", moov)


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio frame headers)
# ---------------------------------------------------------------------------

# bitrate tables in kbps, indexed [version_group][layer][bitrate_index];
# index 0 = "free format" (unsupported here), 15 = invalid
_MP3_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    # MPEG-2 / 2.5 share tables
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _mp3_header(data: bytes, pos: int):
    """Validated frame header at pos → (frame_len, samples, sample_rate,
    bitrate_kbps) or None."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3 = data[pos], data[pos + 1], data[pos + 2]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    ver_bits = (b2 >> 3) & 0x3      # 00=2.5, 01=reserved, 10=2, 11=1
    layer_bits = (b2 >> 1) & 0x3    # 01=III, 10=II, 11=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer = {1: 3, 2: 2, 3: 1}[layer_bits]
    bitrate_idx = (b3 >> 4) & 0xF
    rate_idx = (b3 >> 2) & 0x3
    padding = (b3 >> 1) & 0x1
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    vgroup = 1 if version == "1" else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    sample_rate = _MP3_RATES[version][rate_idx]
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        coef = 144 if (layer == 2 or vgroup == 1) else 72
        frame_len = coef * bitrate // sample_rate + padding
    if frame_len < 4:
        return None
    return frame_len, samples, sample_rate, bitrate // 1000


def parse_mp3_meta(payload: bytes) -> Tuple[int, int, int, int]:
    """(sample_rate, n_frames, total_samples, duration_ms) from a full
    frame-header walk. Skips a leading ID3v2 tag (syncsafe size), then
    requires back-to-back valid frames — VBR streams sum per-frame
    sample counts, so duration is exact without a Xing header. Trailing
    bytes that aren't a frame sync end the walk (ID3v1 tail etc.)."""
    data = bytes(payload)
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise MediaError("truncated ID3v2 header")
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + size
        # ID3v2.4 footer flag (header byte 5 bit 4): a 10-byte footer
        # follows the tag body and is NOT counted in the syncsafe size
        # (ADVICE r4 — without this the walk lands 10 bytes short of
        # the first frame and dies with 'no valid MPEG audio frames')
        if data[5] & 0x10:
            pos += 10
    n_frames = total_samples = 0
    sample_rate = None
    duration = 0.0
    while pos + 4 <= len(data):
        hdr = _mp3_header(data, pos)
        if hdr is None:
            break
        frame_len, samples, rate, _kbps = hdr
        if pos + frame_len > len(data):
            if n_frames == 0:
                raise MediaError("truncated MP3 frame")
            break  # final partial frame: stop, keep what decoded
        sample_rate = sample_rate or rate
        n_frames += 1
        total_samples += samples
        duration += samples / rate
        pos += frame_len
    if n_frames == 0:
        raise MediaError("no valid MPEG audio frames")
    return sample_rate, n_frames, total_samples, round(duration * 1000)


def media_meta_row(payload: bytes) -> Optional[Tuple]:
    """Shared per-payload row for the media-metadata surface (the
    Spark UDF and the fixture golden MUST run this same function):
    (media_kind, sample_rate, channels, n_samples, duration_ms,
    mean_pm, spread_pm, decoded) — decoded 'real' for WAV (PCM stats),
    'header-only' for MP4 (frame decode is a video codec, out of
    scope) and MP3 (frame-header walk: real rate/samples/duration;
    entropy decode out of scope), 'decode-error' when the body won't
    parse. None for unrecognized payloads."""
    kind = sniff_media_kind(payload)
    if kind is None:
        return None
    try:
        if kind == "wav":
            rate, ch, n, dur, mean_pm, spread_pm = wav_stats(payload)
            return ("wav", rate, ch, n, dur, mean_pm, spread_pm, "real")
        if kind == "mp3":
            rate, _frames, n, dur = parse_mp3_meta(payload)
            return ("mp3", rate, None, n, dur, None, None, "header-only")
        _ts, _units, dur = parse_mp4_meta(payload)
        return ("mp4", None, None, None, dur, None, None, "header-only")
    except MediaError:
        return (kind, None, None, None, None, None, None, "decode-error")


# ---------------------------------------------------------------------------
# Fixture writers (deterministic, structurally valid)
# ---------------------------------------------------------------------------

def synth_samples(seed: int, n_frames: int, channels: int = 1) -> list:
    """Deterministic PCM16 synth: per-channel integer sine-ish wave.
    Pure integer math so the oracle golden and any re-run agree
    bit-exactly across platforms."""
    out = []
    for i in range(n_frames):
        for c in range(channels):
            phase = (i * (7 + seed % 13 + 3 * c) + seed * 17) % 360
            out.append(int(12000 * math.sin(math.radians(phase))) + (seed % 97))
    return out


def write_wav(seed: int = 0, n_frames: int = 800, channels: int = 1,
              rate: int = 8000) -> bytes:
    samples = synth_samples(seed, n_frames, channels)
    pcm = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_mp3(seed: int = 0, n_frames: int = 40, rate_idx: int = 0,
              id3: bool = False, vbr: bool = False) -> bytes:
    """Deterministic MPEG-1 Layer III stream: valid frame headers with
    seed-derived (non-audio) payload bytes — exactly the surface the
    header walk parses. ``vbr`` varies the bitrate index per frame so
    the duration sum is exercised on non-constant streams; ``id3``
    prepends a syncsafe-sized ID3v2 tag."""
    out = bytearray()
    if id3:
        tag_body = (b"TAG%d" % seed) * 8
        size = len(tag_body)
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        ) + tag_body
    sample_rate = _MP3_RATES["1"][rate_idx]
    for i in range(n_frames):
        bitrate_idx = 9 if not vbr else 5 + ((seed + i) % 7)  # 128k / 64-160k
        b2 = 0xE0 | (0x3 << 3) | (0x1 << 1) | 0x1  # MPEG-1, Layer III
        padding = (seed + i) % 2
        b3 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
        header = bytes([0xFF, b2, b3, 0xC4])
        bitrate = _MP3_BITRATES[(1, 3)][bitrate_idx] * 1000
        frame_len = 144 * bitrate // sample_rate + padding
        body = bytes(
            (seed * 131 + i * 17 + k * 7) % 251 for k in range(frame_len - 4)
        )
        out += header + body
    return bytes(out)


def write_mp4(seed: int = 0, duration_ms: int = 5000) -> bytes:
    """Minimal ISO-BMFF shell: ftyp + moov/mvhd (version 0) carrying a
    real timescale/duration. No media tracks — frame decode is out of
    scope, the metadata is what the pipeline consumes."""
    timescale = 1000 + (seed % 7) * 100
    duration = round(duration_ms * timescale / 1000)
    ftyp = b"ftyp" + b"isom" + struct.pack(">I", 512) + b"isomiso2"
    ftyp = struct.pack(">I", 8 + len(ftyp) - 4) + ftyp
    mvhd_body = bytes(4)  # version 0 + flags
    mvhd_body += struct.pack(">II", seed, seed)  # creation/modification
    mvhd_body += struct.pack(">II", timescale, duration)
    mvhd_body += struct.pack(">I", 0x00010000)  # rate 1.0
    mvhd_body += struct.pack(">H", 0x0100) + bytes(2)  # volume + reserved
    mvhd_body += bytes(8)
    mvhd_body += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd_body += bytes(24)  # pre_defined
    mvhd_body += struct.pack(">I", seed + 2)  # next_track_ID
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov
