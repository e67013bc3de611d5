"""Dependency-free audio/video codecs for the multimodal operators.

Two REAL public container formats, parsed and produced from scratch so
the audio/video pipelines decode genuine payloads without ffmpeg/librosa
(absent in this container):

- WAV (RIFF / WAVE, PCM 16-bit LE): canonical RIFF chunk walk — ``fmt ``
  anywhere before ``data``, foreign chunks (LIST, fact, ...) skipped,
  odd-size pad bytes honored.
- Y4M (YUV4MPEG2, C420): plain-text stream header + ``FRAME\\n`` markers
  with raw 4:2:0 planes — the simplest real video container there is
  (mjpegtools / ffmpeg interchange format).

Same posture as ``imagecodec.py`` (BMP/PNG): the reference decodes real
media (crates/server/src/generation.rs:263-305); these codecs make the
Ray-side audio/video operators do the same, with the legacy fake
containers kept as a fallback dispatch path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono/LE)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE PCM file."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {samples.dtype}")
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF pad byte
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 -> (sample_rate, channels, int16 sample array).

    Walks the chunk list rather than assuming the canonical layout:
    tolerates LIST/fact/bext chunks in any order before ``data`` and
    odd-size pad bytes; raises ValueError on non-PCM16 encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    sr = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, sr, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV encoding {audio_fmt} (want PCM)")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # pad byte on odd chunk sizes
    if sr is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (want 16)")
    samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    return int(sr), int(channels), samples


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2 C420)
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames_y: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 C420jpeg stream (U/V
    planes neutral 128). h and w must be even (4:2:0 subsampling)."""
    if frames_y.ndim != 3 or frames_y.dtype != np.uint8:
        raise ValueError("encode_y4m wants (n, h, w) uint8 luma frames")
    n, h, w = frames_y.shape
    if h % 2 or w % 2:
        raise ValueError(f"C420 needs even dims, got {w}x{h}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    uv = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [header]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames_y[f].tobytes())
        out.append(uv)  # U
        out.append(uv)  # V
    return b"".join(out)


def decode_y4m(payload: bytes):
    """YUV4MPEG2 C420 -> (width, height, (n, h, w) uint8 luma array).
    Chroma planes are parsed (to advance correctly) but not returned —
    the downstream features are luma statistics."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420jpeg"
    for tok in payload[len(_Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    y_size, uv_size = w * h, (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        plane = payload[pos : pos + y_size]
        if len(plane) < y_size:
            raise ValueError("truncated Y plane")
        frames.append(np.frombuffer(plane, dtype=np.uint8).reshape(h, w))
        pos += y_size + 2 * uv_size
        if pos > len(payload):
            raise ValueError("truncated chroma planes")
    return w, h, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
