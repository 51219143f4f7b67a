"""Synthetic media corpus (sources/media_synth.py): determinism, real
decodability of every payload, and the multimodal_features registry row."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from lab_etl_batch_data_processing_pipeline__spark.operators import multimodal
from lab_etl_batch_data_processing_pipeline__spark.sources import media_synth

SF = "/root/testdata/sf0.001"


def test_payloads_are_deterministic():
    assert media_synth.synth_png(7) == media_synth.synth_png(7)
    assert media_synth.synth_wav(7) == media_synth.synth_wav(7)
    assert media_synth.synth_avi(7) == media_synth.synth_avi(7)
    assert media_synth.synth_png(7) != media_synth.synth_png(8)


def test_payloads_decode_for_real():
    w, h, mean = multimodal.decode_png(media_synth.synth_png(3, 10, 6))
    assert (w, h) == (10, 6) and 0.0 < mean < 1.0

    ch, rate, n_frames, dur, rms = multimodal.decode_wav(
        media_synth.synth_wav(3, n_samples=400)
    )
    assert (ch, rate, n_frames) == (1, 8000, 400) and 0.0 < rms <= 1.0

    avi = media_synth.synth_avi(3, width=8, height=6, n_frames=4)
    assert multimodal.decode_avi_header(avi)[:3] == (8, 6, 4)
    assert multimodal.decode_avi_stream_format(avi) == (8, 6, 24, 0)
    frames = list(multimodal.iter_avi_frames(avi))
    assert len(frames) == 4
    fw, fh, fch, pixels = multimodal.decode_dib_frame(frames[0], 8, 6, 24)
    assert (fw, fh, fch) == (8, 6, 3) and len(pixels) == 8 * 6 * 3


def test_multimodal_features_row(spark):
    out = {
        r.modality: r
        for r in entrymod.queries()["multimodal_features"](spark, SF).collect()
    }
    assert set(out) == {"image", "audio", "video"}
    assert out["image"].n_media == 40 and out["image"].n_feature_rows == 40
    assert out["audio"].n_feature_rows == 40
    # 40 videos x 3 sampled frames each (every 2nd of 6, capped at 3)
    assert out["video"].n_feature_rows == 120
    for r in out.values():
        assert r.payload_bytes > 0 and 0.0 < r.avg_signal < 1.0


def _palette_png_2x2() -> bytes:
    """Hand-built 2x2 palette PNG (color type 3, entries black+white,
    indices [0,1 / 1,0]) — a shape the pure-Python decoder rejects
    (ValueError) by design, driving decode_image's fallback chain:
    Pillow when present, deterministic stub otherwise."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color type 3
    plte = bytes((0, 0, 0, 255, 255, 255))
    raw = b"\x00" + bytes((0, 1)) + b"\x00" + bytes((1, 0))
    return (
        multimodal.PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


try:  # optional dependency — absent in this container
    import PIL  # noqa: F401
except ImportError:
    PIL = None


@pytest.mark.skipif(PIL is None, reason="Pillow not installed")
def test_decode_image_pillow_upgrade_path():
    """The moment the environment gains Pillow, the palette PNG must take
    the real Pillow decode (r12 verdict task 6): exact dimensions and a
    mean that is exact for a black/white palette regardless of Pillow's
    L-conversion rounding."""
    w, h, mean = multimodal.decode_image(_palette_png_2x2())
    assert (w, h) == (2, 2)
    assert mean == 0.5


def test_decode_image_palette_png_falls_back_to_stub_without_pillow():
    """Golden for the no-Pillow fallback route: the pure decoder raises on
    color type 3, Pillow is absent, so decode_image must return exactly
    the deterministic stub tuple (and the stub itself must stay stable —
    it feeds reproducible tests and the driver's multimodal oracle)."""
    if PIL is not None:
        pytest.skip("Pillow present: the upgrade path takes precedence")
    payload = _palette_png_2x2()
    with pytest.raises(ValueError):
        multimodal.decode_png(payload)
    assert multimodal.decode_image(payload) == multimodal.decode_image_stub(payload)
    checksum = sum(payload[:64])
    assert multimodal.decode_image_stub(payload) == (
        64 + checksum % 512,
        64 + (checksum * 7) % 512,
        (checksum % 256) / 255.0,
    )
