"""WAV (RIFF PCM16) and Y4M (YUV4MPEG2) codec tests: round-trips, chunk
walking, error posture, and real-vs-legacy container feature equality."""

import struct
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.ops.avcodec import decode_wav, decode_y4m, encode_wav, encode_y4m


def test_wav_round_trip_even_and_odd_lengths():
    rng = np.random.default_rng(1)
    for n in (0, 1, 2, 4096, 4097):
        s = rng.integers(-32768, 32767, n, dtype=np.int16)
        sr, ch, out = decode_wav(encode_wav(s, 22050))
        assert (sr, ch) == (22050, 1)
        assert np.array_equal(out, s)


def test_wav_chunk_walk_tolerates_foreign_chunks():
    """LIST chunk (odd size -> pad byte) before fmt/data must be skipped,
    not break the parse — the posture real WAV files require."""
    s = np.arange(-50, 50, dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = s.astype("<i2").tobytes()
    body = b"WAVE" + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, ch, out = decode_wav(payload)
    assert sr == 8000 and np.array_equal(out, s)


def test_wav_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_wav(b"NOPE" + b"\x00" * 40)
    # float32 WAV (format tag 3) must be refused, not mis-read
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_y4m_round_trip_and_guards():
    rng = np.random.default_rng(2)
    fr = rng.integers(0, 256, (7, 14, 22), dtype=np.uint8)
    w, h, got = decode_y4m(encode_y4m(fr, fps=30))
    assert (w, h) == (22, 14) and np.array_equal(got, fr)
    with pytest.raises(ValueError):
        encode_y4m(fr[:, :13, :])        # odd height, C420-illegal
    with pytest.raises(ValueError):
        decode_y4m(b"AVI1" + b"\x00" * 32)
    with pytest.raises(ValueError):      # truncated Y plane
        decode_y4m(encode_y4m(fr)[:-300])


def test_audio_features_equal_across_containers():
    """The same waveform in a real WAV and in the legacy AUD1 container
    must produce IDENTICAL features — the dispatch is a container
    parser, not a different computation."""
    import pyarrow as pa

    from engine.ops.multimodal import AudioFeatures, AUD_MAGIC, _doc_waveform

    stage = AudioFeatures()
    rows_wav, rows_legacy = [], []
    for doc_id in (0, 1, 17, 42):
        sr, samples = _doc_waveform(doc_id, f"doc {doc_id} text")
        rows_wav.append(encode_wav(samples, sr))
        rows_legacy.append(
            AUD_MAGIC
            + sr.to_bytes(4, "big")
            + len(samples).to_bytes(4, "big")
            + samples.astype("<i2").tobytes()
        )
    ids = pa.array([0, 1, 17, 42], pa.int64())
    got_wav = stage(pa.table({"doc_id": ids, "audio": pa.array(rows_wav, pa.binary())}))
    got_leg = stage(
        pa.table({"doc_id": ids, "audio": pa.array(rows_legacy, pa.binary())})
    )
    assert got_wav.equals(got_leg)
    assert got_wav["decode_ok"].to_pylist() == [True] * 4


def test_frame_sample_y4m_luma_means():
    """SampleFrames on a real Y4M stream: strided indices and per-frame
    luma means must match a direct numpy recompute."""
    import pyarrow as pa

    from engine.ops.multimodal import SampleFrames, _doc_frames

    frames = _doc_frames(5, "hello")
    payload = encode_y4m(frames)
    out = SampleFrames(stride=3)(
        pa.table(
            {"doc_id": pa.array([5], pa.int64()),
             "video": pa.array([payload], pa.binary())}
        )
    )
    idx = out["frame_idx"].to_pylist()
    assert idx == list(range(0, frames.shape[0], 3))
    for i, m in zip(idx, out["byte_mean"].to_pylist()):
        assert m == round(float(frames[i].mean()), 6)
