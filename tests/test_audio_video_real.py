"""REAL audio/video decode paths (round-4): RIFF/WAVE PCM and MJPEG
(concatenated JFIF). These replace the digest stubs for formats the
engine's own pure-NumPy codecs can decode; the stubs stay only for
container formats needing an ffmpeg-class demuxer."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.audio import wav_decode, wav_encode


def _tone(sr: int = 16000, seconds: float = 0.5, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds), dtype=np.float64) / sr
    return (0.6 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_wav_roundtrip_16bit():
    pcm = _tone()
    out, sr = wav_decode(wav_encode(pcm, 16000, bits=16))
    assert sr == 16000 and out.shape == pcm.shape
    assert float(np.abs(out - pcm).max()) < 1.0 / 32000


def test_wav_roundtrip_8bit_is_coarser_but_close():
    pcm = _tone()
    out, sr = wav_decode(wav_encode(pcm, 8000, bits=8))
    assert sr == 8000
    assert float(np.abs(out - pcm).max()) < 1.0 / 120


def test_wav_stereo_averages_to_mono():
    import struct

    left = _tone(hz=440.0)
    right = _tone(hz=880.0)
    inter = np.empty(2 * len(left), dtype=np.float32)
    inter[0::2], inter[1::2] = left, right
    data = (
        np.clip(np.round(inter.astype(np.float64) * 32767.0), -32768, 32767)
        .astype("<i2").tobytes()
    )
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 16000 * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    out, sr = wav_decode(wav)
    assert sr == 16000 and len(out) == len(left)
    assert float(np.abs(out - (left + right) / 2).max()) < 1e-3


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"OggS not a wav")
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)  # IEEE float
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="PCM"):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_real_wav_stage(spark):
    """audio/wav assets run the REAL decoder through the Spark stage and
    re-anchor to a single-process rerun with the same decode."""
    from vietnamese_ocr_spark.operators.multimodal import (
        ASSETS_DDL,
        _wav_pcm,
        audio_feature_row,
        audio_features,
    )

    payloads = {
        f"wav-{i}": wav_encode(_tone(hz=220.0 * (i + 1)), 16000) for i in range(3)
    }
    rows = [
        (aid, "audio", "audio/wav", bytearray(p), None, None, 16000, 500, None)
        for aid, p in payloads.items()
    ]
    assets = spark.createDataFrame(rows, ASSETS_DDL)
    got = {r["asset_id"]: r for r in audio_features(assets).collect()}
    for aid, p in payloads.items():
        want = audio_feature_row(p, 16000, 500, decode=_wav_pcm)
        assert got[aid]["features_md5"] == want["features_md5"]
        assert got[aid]["n_samples"] == 8000  # the FILE's length, not the hint


def test_mjpeg_frame_split_and_phash():
    from vietnamese_ocr_spark.functions.imaging import decode_image, perceptual_hash
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode
    from vietnamese_ocr_spark.operators.multimodal import _mjpeg_phash, mjpeg_frames

    rng = np.random.default_rng(6)
    base = (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(np.uint8)
    frames = [np.roll(base, 5 * i, axis=1) for i in range(4)]
    payload = b"".join(jpeg_encode(f, 90) for f in frames)
    split = mjpeg_frames(payload)
    assert len(split) == 4
    for i, fr in enumerate(split):
        assert _mjpeg_phash(payload, i) == perceptual_hash(decode_image(fr))
    with pytest.raises(ValueError, match="past end"):
        _mjpeg_phash(payload, 4)
    with pytest.raises(ValueError):
        mjpeg_frames(b"no frames here")


def test_video_frame_sample_real_mjpeg_stage(spark):
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode
    from vietnamese_ocr_spark.operators.multimodal import (
        ASSETS_DDL,
        _mjpeg_phash,
        video_frame_sample,
    )

    base = (np.add.outer(np.arange(32), np.arange(48)) % 256).astype(np.uint8)
    payload = b"".join(jpeg_encode(np.roll(base, i, axis=0), 85) for i in range(25))
    assets = spark.createDataFrame(
        [("clip-0", "video", "video/mjpeg", bytearray(payload),
          48, 32, None, None, 25)],
        ASSETS_DDL,
    )
    rows = video_frame_sample(assets, every_nth=10).collect()
    got = {r["frame_idx"]: r["phash"] for r in rows}
    assert set(got) == {0, 10, 20}
    for idx, ph in got.items():
        assert ph == _mjpeg_phash(payload, idx)
        assert len(ph) == 16 and int(ph, 16) >= 0


def test_aiff_and_au_roundtrip_and_quarantine():
    """Round-6: AIFF (BE PCM, 80-bit extended rate) and Sun AU (mu-law
    + linear) decode beside WAV."""
    import numpy as np
    import pytest

    from vietnamese_ocr_spark.functions.audio import (
        aiff_decode,
        aiff_encode,
        au_decode,
        au_encode,
    )

    t = np.sin(np.linspace(0, 40 * np.pi, 4000)).astype(np.float32) * 0.7
    out, sr = aiff_decode(aiff_encode(t, 16000))
    assert sr == 16000 and np.abs(out - t).max() < 1e-4
    out, sr = au_decode(au_encode(t, 8000))
    assert sr == 8000 and np.abs(out - t).max() < 1e-4
    out8, _ = au_decode(au_encode(t, 8000, encoding=2))
    assert np.abs(out8 - t).max() < 0.01
    for bad in (b"", b"FORMxxxxAIFC", b".snd" + b"\x00" * 8,
                aiff_encode(t, 16000)[:30]):
        with pytest.raises((ValueError, Exception)):
            aiff_decode(bad)
        with pytest.raises((ValueError, Exception)):
            au_decode(bad)


def test_aiff_au_through_spark_audio_stage(spark):
    """audio/aiff and audio/basic assets run the REAL decoders through
    the Spark audio_features stage, matching local decode+features."""
    import numpy as np

    from vietnamese_ocr_spark.functions.audio import aiff_encode, au_encode
    from vietnamese_ocr_spark.operators.multimodal import (
        ASSETS_DDL,
        audio_feature_row,
        audio_features,
        _aiff_pcm,
        _au_pcm,
    )

    def _tone(hz):
        x = np.linspace(0, 1, 8000, endpoint=False)
        return (0.5 * np.sin(2 * np.pi * hz * x)).astype(np.float32)

    payloads = {
        "aiff-0": ("audio/aiff", aiff_encode(_tone(220.0), 16000)),
        "au-0": ("audio/basic", au_encode(_tone(440.0), 16000)),
        "au-mu": ("audio/basic", au_encode(_tone(330.0), 16000, encoding=2)),
    }
    rows = [
        (aid, "audio", mime, bytearray(p), None, None, 16000, 500, None)
        for aid, (mime, p) in payloads.items()
    ]
    df = spark.createDataFrame(rows, ASSETS_DDL)
    got = {r["asset_id"]: r for r in audio_features(df).collect()}
    for aid, (mime, p) in payloads.items():
        decode = _aiff_pcm if mime == "audio/aiff" else _au_pcm
        want = audio_feature_row(p, 16000, 500, 512, decode=decode)
        assert got[aid]["features_md5"] == want["features_md5"], aid
        assert got[aid]["n_samples"] == want["n_samples"]


def test_avi_mjpeg_through_spark_video_stage(spark):
    """Round-6: video/x-msvideo (MJPEG AVI) demuxes + decodes for real
    through video_frame_sample, matching the raw concatenated-JFIF
    mime's phashes frame for frame."""
    import numpy as np

    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode
    from vietnamese_ocr_spark.operators.multimodal import (
        ASSETS_DDL,
        avi_encode_mjpeg,
        video_frame_sample,
    )

    rng = np.random.RandomState(7)
    frames = [
        jpeg_encode(rng.randint(0, 256, (16, 24), dtype=np.uint8), 85)
        for _ in range(25)
    ]
    rows = [
        ("avi-0", "video", "video/x-msvideo", bytearray(avi_encode_mjpeg(frames)),
         None, None, None, None, len(frames)),
        ("raw-0", "video", "video/mjpeg", bytearray(b"".join(frames)),
         None, None, None, None, len(frames)),
    ]
    df = spark.createDataFrame(rows, ASSETS_DDL)
    out = video_frame_sample(df, every_nth=10).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], {})[r["frame_idx"]] = r["phash"]
    assert by_asset["avi-0"] == by_asset["raw-0"]
    assert sorted(by_asset["avi-0"]) == [0, 10, 20]
