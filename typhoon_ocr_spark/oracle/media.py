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
    """'wav' | 'mp4' | None."""
    if payload is None:
        return None
    data = bytes(payload)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
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


def media_meta_row(payload: bytes) -> Optional[Tuple]:
    """Shared per-payload row for the media-metadata surface (the
    Spark UDF and the fixture golden MUST run this same function):
    (media_kind, sample_rate, channels, n_samples, duration_ms,
    mean_pm, spread_pm, decoded) — decoded 'real' for WAV (PCM stats),
    'header-only' for MP4 (frame decode is a video codec, out of
    scope), 'decode-error' when the body won't parse. None for
    unrecognized payloads."""
    kind = sniff_media_kind(payload)
    if kind is None:
        return None
    try:
        if kind == "wav":
            rate, ch, n, dur, mean_pm, spread_pm = wav_stats(payload)
            return ("wav", rate, ch, n, dur, mean_pm, spread_pm, "real")
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
