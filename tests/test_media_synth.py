"""Synthetic media corpus (sources/media_synth.py): determinism, real
decodability of every payload, and the multimodal_features registry row."""

from __future__ import annotations

import os
import sys

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
