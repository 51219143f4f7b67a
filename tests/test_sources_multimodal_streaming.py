from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lab_etl_batch_data_processing_pipeline__spark.operators import multimodal
from lab_etl_batch_data_processing_pipeline__spark.sources import (
    memory_table,
    read_csv,
    write_parquet,
)
from lab_etl_batch_data_processing_pipeline__spark.streaming import (
    streaming_bookings_per_window,
)


def test_read_csv_with_declared_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\n2,b\nnotanint,c\n")
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("name", T.StringType())]
    )
    rows = read_csv(spark, str(p), schema).orderBy("name").collect()
    assert [r.id for r in rows] == [1, 2, None]  # bad cell -> null, not inference flip


def test_write_parquet_partitioned_overwrite_idempotent(spark, tmp_path):
    df = memory_table(
        spark, [(1, "2024-01"), (2, "2024-02")], ["id", "month"]
    )
    path = str(tmp_path / "out")
    write_parquet(df, path, partition_by=["month"])
    write_parquet(df, path, partition_by=["month"])  # re-run must not duplicate
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert sorted(os.listdir(path))[:2] == ["month=2024-01", "month=2024-02"]


def test_image_features_mapinpandas(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes"), (10, 10, None)),
        (2, "image", "image/png", None, (None, None, None)),
        (3, "audio", "audio/wav", bytearray(b"RIFF"), (None, None, 1000)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.image_features(media).collect()}
    assert set(out) == {1, 2}  # audio row filtered out
    assert out[1].n_bytes == 15 and out[1].width > 0
    assert out[2].n_bytes == 0 and out[2].width == 0
    # deterministic fake decode: same payload -> same features
    again = {r.media_id: r for r in multimodal.image_features(media).collect()}
    assert again[1].payload_crc == out[1].payload_crc


def _make_png(width, height, rows, color_type, filters):
    """Build a real (CRC-valid) 8-bit non-interlaced PNG from pixel rows,
    encoding each scanline with the given PNG filter type."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * channels)
    for flat, f in zip([bytes(r) for r in rows], filters):
        if f == 0:
            enc = flat
        elif f == 1:  # Sub
            enc = bytes(
                (flat[i] - (flat[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(len(flat))
            )
        elif f == 2:  # Up
            enc = bytes((flat[i] - prev[i]) & 0xFF for i in range(len(flat)))
        else:
            raise ValueError(f)
        raw += bytes([f]) + enc
        prev = flat
    idat = zlib.compress(bytes(raw))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_png_golden_rgb():
    """Real decode of a real 2x2 RGB PNG (filters None + Up): known
    pixels -> known dimensions and mean intensity."""
    png = _make_png(
        2, 2,
        rows=[[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]],
        color_type=2,
        filters=[0, 2],
    )
    w, h, mean = multimodal.decode_png(png)
    assert (w, h) == (2, 2)
    assert mean == round(1530 / 12 / 255.0, 6)  # == 0.5 exactly


def test_decode_png_golden_grayscale_sub_filter():
    png = _make_png(
        3, 2, rows=[[10, 20, 30], [40, 50, 60]], color_type=0, filters=[1, 2]
    )
    assert multimodal.decode_png(png) == (3, 2, round(210 / 6 / 255.0, 6))


def test_image_features_real_png_end_to_end(spark):
    """A real PNG payload flows through the Arrow-batched mapInPandas
    pipeline and comes out with genuinely decoded dimensions."""
    png = _make_png(
        2, 2,
        rows=[[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]],
        color_type=2,
        filters=[0, 2],
    )
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(png), (2, 2, None))],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.image_features(media).collect()[0]
    assert (row.width, row.height) == (2, 2)
    assert row.mean_intensity == 0.5


def test_resize_png_golden_roundtrip():
    """Real resize: 4x2 RGB -> 2x1 nearest-neighbor picks the top-left
    pixel of each 2x2 cell; the output re-decodes as a valid PNG."""
    rows = [
        [255, 0, 0, 1, 1, 1, 0, 255, 0, 2, 2, 2],
        [9, 9, 9, 8, 8, 8, 7, 7, 7, 6, 6, 6],
    ]
    png = _make_png(4, 2, rows=rows, color_type=2, filters=[0, 0])
    out, ow, oh = multimodal.resize_png(png, 2, 1)
    assert (ow, oh) == (4, 2)
    w, h, ch, pixels = multimodal.decode_png_pixels(out)
    assert (w, h, ch) == (2, 1, 3)
    assert list(pixels) == [255, 0, 0, 0, 255, 0]  # pixels (0,0) and (2,0)


def test_encode_png_is_decode_inverse():
    pixels = bytes(range(24))  # 4x2 RGB
    png = multimodal.encode_png(4, 2, 3, pixels)
    w, h, ch, back = multimodal.decode_png_pixels(png)
    assert (w, h, ch) == (4, 2, 3) and bytes(back) == pixels


def test_resize_images_real_png_through_spark(spark):
    png = _make_png(
        2, 2,
        rows=[[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]],
        color_type=2,
        filters=[0, 2],
    )
    media = spark.createDataFrame(
        [
            (1, "image", "image/png", bytearray(png), (2, 2, None)),
            (2, "image", "image/jpeg", bytearray(b"\xff\xd8" + bytes(64)), (None, None, None)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.resize_images(media, 4, 4).collect()}
    real = out[1]
    assert (real.orig_width, real.orig_height) == (2, 2)
    # output is a REAL 4x4 PNG: upscaled nearest-neighbor, re-decodable
    w, h, ch, pixels = multimodal.decode_png_pixels(bytes(real.payload))
    assert (w, h, ch) == (4, 4, 3)
    assert list(pixels[:6]) == [255, 0, 0, 255, 0, 0]  # top-left 2x duplicated
    assert out[2].payload  # non-PNG keeps the stub path


def test_streaming_windowed_count(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "part1.csv").write_text(
        "ts,booking_status\n"
        "2024-01-01T00:00:00,confirmed\n"
        "2024-01-02T00:00:00,confirmed\n"
        "2024-01-02T01:00:00,canceled\n"
        "2024-01-10T00:00:00,confirmed\n"
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("booking_status", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("csv").option("header", "true").schema(schema).load(str(src))
    )
    agg = streaming_bookings_per_window(
        stream, "ts", "7 days", "1 day", "booking_status"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        str(r.window_start): r.total_bookings
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert sum(rows.values()) == 3  # canceled row excluded
    assert len(rows) == 2  # two 7-day windows


def test_stateful_streaming_totals_survive_restart(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.streaming import (
        streaming_user_totals,
    )

    src = tmp_path / "stateful_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("v", T.IntegerType())]
    )

    def run_batch():
        collected = []
        stream = (
            spark.readStream.format("csv").option("header", "true")
            .schema(schema).load(str(src))
        )
        q = (
            streaming_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _epoch: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.user_id: (r.batch_events, r.total_events) for r in collected}

    (src / "b1.csv").write_text("user_id,v\n1,0\n1,0\n2,0\n")
    first = run_batch()
    assert first[1] == (2, 2) and first[2] == (1, 1)

    # second run, new file only: state must carry totals across restart
    (src / "b2.csv").write_text("user_id,v\n1,0\n3,0\n")
    second = run_batch()
    assert second[1] == (1, 3)   # 2 from before + 1 new
    assert second[3] == (1, 1)


def test_audio_features_and_video_sampling(spark):
    rows = [
        (1, "audio", "audio/wav", bytearray(b"RIFF" * 100), (None, None, 250)),
        (2, "video", "video/mp4", bytearray(bytes(range(256))), (640, 480, 5000)),
        (3, "image", "image/png", bytearray(b"PNG"), (8, 8, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    audio = multimodal.audio_features(media).collect()
    assert len(audio) == 1 and audio[0].media_id == 1
    assert audio[0].n_frames == 250 * 16 and 0 <= audio[0].rms_level <= 1

    frames = multimodal.sample_video_frames(media, every_nth=50, max_frames=5).collect()
    assert [f.frame_index for f in frames] == [0, 50, 100, 150, 200]
    assert all(f.media_id == 2 for f in frames)


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _avi_bytes(
    width=4,
    height=2,
    frames=(b"\x10" * 8, b"\xff" * 8, b"\x00" * 8),
    bit_count=None,
    compression=0,
):
    """Minimal AVI: RIFF('AVI ' LIST hdrl(avih [LIST strl(strh strf)])
    LIST movi(00db*)). With ``bit_count`` set, a video stream format
    (BITMAPINFOHEADER) is declared — compression=0 is BI_RGB."""
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [
            40_000,  # dwMicroSecPerFrame (25 fps)
            0, 0, 0,
            len(frames),  # dwTotalFrames
            0, 1, 0,
            width, height,
            0, 0, 0, 0,
        ]
    )
    hdrl_body = b"hdrl" + _chunk(b"avih", avih)
    if bit_count is not None:
        strh = b"vids" + b"\x00" * 52
        strf = (
            (40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + bit_count.to_bytes(2, "little")
            + compression.to_bytes(4, "little")
            + b"\x00" * 20
        )
        hdrl_body += _chunk(
            b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
        )
    hdrl = _chunk(b"LIST", hdrl_body)
    movi = _chunk(b"LIST", b"movi" + b"".join(_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_avi_golden():
    payload = _avi_bytes()
    assert multimodal.decode_avi_header(payload) == (4, 2, 3, 120)  # 3 @ 25fps
    frames = list(multimodal.iter_avi_frames(payload))
    assert frames == [b"\x10" * 8, b"\xff" * 8, b"\x00" * 8]


def test_decode_avi_stream_format_golden():
    payload = _avi_bytes(bit_count=24, compression=0)
    assert multimodal.decode_avi_stream_format(payload) == (4, 2, 24, 0)
    assert multimodal.decode_avi_stream_format(_avi_bytes()) is None  # no strf


def test_decode_dib_frame_golden_bgr_bottom_up():
    """3x2 24-bit BI_RGB: rows are stored bottom-up, BGR, padded to 4
    bytes — the decode must flip rows, swap to RGB, and drop padding."""
    bottom_row = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]) + b"\xee\xee\xee"  # pad
    top_row = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9]) + b"\xee\xee\xee"
    w, h, ch, pixels = multimodal.decode_dib_frame(
        bottom_row + top_row, 3, 2, 24
    )
    assert (w, h, ch) == (3, 2, 3)
    # top row first (was stored second), each pixel BGR->RGB swapped
    assert bytes(pixels) == bytes(
        [3, 2, 1, 6, 5, 4, 9, 8, 7, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_sample_video_frames_decodes_bi_rgb_pixels(spark):
    """End-to-end third modality: a BI_RGB AVI's sampled frames come out
    with REAL decoded shape and an exact pixel mean that excludes the
    row-alignment padding bytes."""
    # 3x2, stride 12: 9 pixel bytes + 3 padding bytes (0xFF) per row
    frame = (bytes([10] * 9) + b"\xff\xff\xff") * 2
    payload = _avi_bytes(width=3, height=2, frames=(frame,), bit_count=24)
    media = spark.createDataFrame(
        [(1, "video", "video/avi", bytearray(payload), (3, 2, None))],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.sample_video_frames(media, every_nth=1, max_frames=5).collect()[0]
    assert (row.frame_width, row.frame_height, row.n_channels) == (3, 2, 3)
    # raw-byte mean would be polluted by the 0xFF padding (~0.107);
    # the real pixel mean is exactly 10/255
    assert row.frame_mean == round(10 / 255.0, 6)


def test_sample_video_frames_real_avi(spark):
    rows = [
        (1, "video", "video/avi", bytearray(_avi_bytes()), (4, 2, None)),
        (2, "video", "video/mp4", bytearray(bytes(range(64))), (None, None, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_video_frames(media, every_nth=2, max_frames=5).collect()
    avi = [r for r in out if r.media_id == 1]
    # frames 0 and 2 sampled (every 2nd of 3 real frames)
    assert [r.frame_index for r in avi] == [0, 2]
    assert abs(avi[0].frame_mean - 0x10 / 255) < 1e-6
    assert avi[1].frame_mean == 0.0
    stub = [r for r in out if r.media_id == 2]  # non-AVI keeps stub slicing
    assert [r.frame_index for r in stub] == [0, 2, 4, 6, 8]


def _wav_bytes(channels=1, rate=8000, width=2, samples=(1000, -1000) * 4) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            frames = bytes((s + 128) & 0xFF for s in samples)
        elif width == 2:
            frames = struct.pack(f"<{len(samples)}h", *samples)
        else:
            frames = b"".join(
                int(s).to_bytes(width, "little", signed=True) for s in samples
            )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_golden():
    """Real WAV decode: duration/channels/RMS come from the sample data."""
    n_ch, rate, n_frames, dur, rms = multimodal.decode_wav(_wav_bytes())
    assert (n_ch, rate, n_frames, dur) == (1, 8000, 8, 1)
    assert abs(rms - 1000 / 32768) < 1e-6
    # 8-bit unsigned PCM: midpoint-centered
    n_ch, rate, n_frames, dur, rms = multimodal.decode_wav(
        _wav_bytes(width=1, samples=(64, -64) * 8)
    )
    assert (n_ch, n_frames) == (1, 16) and abs(rms - 64 / 128) < 1e-6
    # stereo 24-bit
    n_ch, rate, n_frames, dur, rms = multimodal.decode_wav(
        _wav_bytes(channels=2, width=3, samples=(100000, -100000) * 4)
    )
    assert (n_ch, n_frames) == (2, 4)  # 8 samples / 2 channels
    assert abs(rms - 100000 / 8388608) < 1e-6


def test_audio_features_real_wav_through_spark(spark):
    """A real WAV payload flows through the Arrow-batched mapInPandas and
    overrides the (wrong) metadata duration with the decoded one."""
    rows = [
        (7, "audio", "audio/wav", bytearray(_wav_bytes()), (None, None, 999)),
        (8, "audio", "audio/ogg", bytearray(b"OggS" + b"\x00" * 64), (None, None, 250)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.audio_features(media).collect()}
    real = out[7]
    assert (real.n_channels, real.sample_rate, real.n_frames) == (1, 8000, 8)
    assert real.duration_ms == 1  # 8 frames @ 8 kHz — decoded, not meta's 999
    assert abs(real.rms_level - 1000 / 32768) < 1e-6
    stub = out[8]  # non-WAV codec: labeled stub path, channels/rate unknown
    assert (stub.n_channels, stub.sample_rate) == (0, 0)
    assert stub.n_frames == 250 * 16


def test_streaming_dedup(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.streaming import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    (src / "a.csv").write_text(
        "id,ts\n1,2024-01-01T00:00:00\n1,2024-01-01T01:00:00\n2,2024-01-01T02:00:00\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    stream = (
        spark.readStream.format("csv").option("header", "true").schema(schema).load(str(src))
    )
    out = []
    q = (
        streaming_dedup(stream, ["id"], "ts")
        .writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(r.id for r in out) == [1, 2]  # duplicate id=1 dropped


def test_streaming_enrich_stream_static_join(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.streaming import streaming_enrich

    src = tmp_path / "enrich_src"
    src.mkdir()
    (src / "a.csv").write_text("id,currency\n1,USD\n2,EUR\n3,XXX\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("currency", T.StringType())]
    )
    rates = spark.createDataFrame(
        [("USD", 1.0), ("EUR", 1.1)], "currency string, usd_rate double"
    )
    stream = (
        spark.readStream.format("csv").option("header", "true").schema(schema).load(str(src))
    )
    out = []
    q = (
        streaming_enrich(stream, rates, "currency")
        .writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.id: r.usd_rate for r in out}
    assert got == {1: 1.0, 2: 1.1, 3: None}  # unknown currency -> NULL survives


def test_streaming_click_attribution_interval_join(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.streaming import (
        streaming_click_attribution,
    )

    clicks_dir = tmp_path / "clicks"
    purchases_dir = tmp_path / "purchases"
    clicks_dir.mkdir()
    purchases_dir.mkdir()
    (clicks_dir / "c.csv").write_text(
        "user_id,ts\n"
        "1,2024-01-01 10:00:00\n"   # 20 min before purchase -> attributed
        "1,2024-01-01 08:00:00\n"   # 2h20m before -> outside window
        "2,2024-01-01 10:30:00\n"   # after user 2's purchase -> excluded
    )
    (purchases_dir / "p.csv").write_text(
        "user_id,ts\n1,2024-01-01 10:20:00\n2,2024-01-01 10:10:00\n"
    )
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    read = lambda d: (  # noqa: E731
        spark.readStream.format("csv").option("header", "true")
        .schema(schema).load(str(d))
    )
    out = []
    q = (
        streaming_click_attribution(read(clicks_dir), read(purchases_dir))
        .writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = sorted((r.user_id, r.click_ts.hour, r.click_ts.minute) for r in out)
    assert pairs == [(1, 10, 0)]  # only the in-window click attributes


def test_resize_images_binary_roundtrip(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes" * 40), (10, 10, None)),
        (2, "image", "image/png", None, (None, None, None)),
        (3, "video", "video/mp4", bytearray(b"mp4"), (None, None, 500)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.resize_images(media, 64, 64).collect()}
    assert set(out) == {1, 2}  # video row filtered out
    assert out[1].width == 64 and out[1].height == 64
    assert out[1].orig_width > 0 and len(out[1].payload) > 0
    assert out[2].payload == bytearray(b"")  # empty payload survives
    # composes with the feature extractor downstream (binary-in contract)
    feats = multimodal.image_features(
        spark.createDataFrame(
            [(r.media_id, "image", "image/png", r.payload, (None, None, None))
             for r in out.values()],
            multimodal.MEDIA_SCHEMA,
        )
    ).collect()
    assert len(feats) == 2


def test_write_csv_single_file(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        write_csv_single_file,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = str(tmp_path / "single_csv")
    write_csv_single_file(df, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # coalesce(1): exactly one part file
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2


def test_ensure_timestamp_all_encodings_same_epoch(spark):
    """ensure_timestamp must yield the same instant for the same event time
    under every physical encoding a regenerated input can arrive in:
    nanos-since-epoch LongType, TIMESTAMP_NTZ, and instant TIMESTAMP.
    2024-01-01T00:00:07.179575 UTC = 1704067207.179575."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        ensure_timestamp,
    )

    epoch_us = 1_704_067_207_179_575
    as_long = spark.createDataFrame(
        [(epoch_us * 1000,)], T.StructType([T.StructField("ts", T.LongType())])
    )
    as_ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:07.179575' AS ts"
    )
    as_inst = spark.sql(
        "SELECT TIMESTAMP '2024-01-01 00:00:07.179575+00:00' AS ts"
    )
    for df in (as_long, as_ntz, as_inst):
        out = df.select(ensure_timestamp(df, "ts").alias("t")).select(
            F.unix_micros("t").alias("us")
        )
        assert out.collect()[0].us == epoch_us
        assert out.schema["us"].dataType == T.LongType()


def test_ensure_timestamp_rejects_non_nanos_longs(spark):
    """The LongType branch's contract is nanos-only; a regenerated input
    that stores micros (or millis) as raw INT64 must fail the job with a
    pointed message, not silently decode to ~1970-era instants."""
    import pytest

    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        ensure_timestamp,
    )

    micros_not_nanos = spark.createDataFrame(
        [(1_704_067_207_179_575,)], T.StructType([T.StructField("ts", T.LongType())])
    )
    with pytest.raises(Exception, match="too small for nanos"):
        micros_not_nanos.select(ensure_timestamp(micros_not_nanos, "ts")).collect()


def test_ensure_timestamp_ntz_is_timezone_independent(spark):
    """The NTZ branch interprets wall time AS UTC regardless of the session
    timezone — a cast("timestamp") would shift epochs by the tz offset in
    any consumer session not pinned to UTC (e.g. the driver's)."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        ensure_timestamp,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:07.179575' AS ts")
        out = df.select(F.unix_micros(ensure_timestamp(df, "ts")).alias("us"))
        assert out.collect()[0].us == 1_704_067_207_179_575
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_streaming_event_counts_append_mode_watermark_eviction(spark, tmp_path):
    """Append-mode replay with controlled micro-batch order (one file per
    trigger, mtime-ordered): a window is emitted exactly once when the
    watermark passes its end, rows later than the watermark are DROPPED
    (the closed window is not re-emitted), in-window late rows are still
    accepted, and a window the watermark never passes is never emitted.
    These are the semantics a 100 TB production stream actually runs —
    the driver-checked row uses complete mode, which evicts nothing."""
    import os as _os

    from lab_etl_batch_data_processing_pipeline__spark.streaming import (
        streaming_event_type_counts,
    )

    src = tmp_path / "append_src"
    src.mkdir()
    # batch 0: two rows in [10:00,10:10) + one at 10:21 that advances the
    # watermark to 10:16 once the batch completes
    (src / "a.csv").write_text(
        "ts,event_type\n"
        "2024-01-01 10:00:00,view\n"
        "2024-01-01 10:02:00,view\n"
        "2024-01-01 10:21:00,view\n"
    )
    # batch 1: an accepted late row into the still-open [10:20,10:30)
    # window; runs under watermark 10:16, so [10:00,10:10) is emitted and
    # its state evicted at this batch's end
    (src / "b.csv").write_text("ts,event_type\n2024-01-01 10:25:00,view\n")
    # batch 2: a row for the ALREADY-CLOSED first window — beyond the
    # watermark, must be dropped (not re-emitted, not resurrected as a
    # count-1 window) — plus a 10:40 row that advances the watermark to
    # 10:35 and closes [10:20,10:30)
    (src / "c.csv").write_text(
        "ts,event_type\n2024-01-01 10:03:00,view\n2024-01-01 10:40:00,view\n"
    )
    now = _os.stat(src / "c.csv").st_mtime
    _os.utime(src / "a.csv", (now - 120, now - 120))  # strict mtime order
    _os.utime(src / "b.csv", (now - 60, now - 60))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("event_type", T.StringType())]
    )
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .schema(schema)
        .load(str(src))
    )
    agg = streaming_event_type_counts(
        stream, window_duration="10 minutes", watermark_delay="5 minutes"
    )
    out = []
    q = (
        agg.writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.window_start_sec: r.n_events for r in out}
    w1 = 1704103200  # 2024-01-01 10:00:00 UTC
    assert got == {
        w1: 2,            # closed with its on-time rows; late 10:03 dropped
        w1 + 1200: 2,     # [10:20,10:30): 10:21 + accepted-late 10:25
    }
    # the dropped 10:03 must not resurrect w1 as a count-1 re-emission,
    # and [10:40,10:50) is never finalized -> never emitted in append mode
    assert len(out) == len(got), "a window was emitted more than once"


def test_upsert_parquet_is_idempotent_and_partition_scoped(spark, tmp_path):
    """Key-upsert semantics: latest version wins, replaying the same
    batch changes nothing (the reference's append-on-rerun duplication
    class), untouched partitions' files are not rewritten."""
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        upsert_parquet,
    )

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [
            (1, "2024-01", 10.0, 0),
            (2, "2024-01", 20.0, 0),
            (3, "2024-02", 30.0, 0),
        ],
        "id long, month string, amount double, version int",
    )
    upsert_parquet(spark, path, base, ["id"], "version", partition_by=["month"])
    feb_files = sorted(os.listdir(os.path.join(path, "month=2024-02")))

    updates = spark.createDataFrame(
        [(1, "2024-01", 11.0, 1), (4, "2024-01", 40.0, 1)],
        "id long, month string, amount double, version int",
    )
    upsert_parquet(spark, path, updates, ["id"], "version", partition_by=["month"])
    got = {
        r.id: (r.month, r.amount, r.version)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("2024-01", 11.0, 1),   # updated
        2: ("2024-01", 20.0, 0),   # untouched key in touched partition
        3: ("2024-02", 30.0, 0),   # untouched partition
        4: ("2024-01", 40.0, 1),   # inserted
    }
    # untouched partition was not rewritten (same files on disk)
    assert sorted(os.listdir(os.path.join(path, "month=2024-02"))) == feb_files

    # replaying the identical batch is a no-op on the data
    upsert_parquet(spark, path, updates, ["id"], "version", partition_by=["month"])
    again = {
        r.id: (r.month, r.amount, r.version)
        for r in spark.read.parquet(path).collect()
    }
    assert again == got


def test_sorted_write_produces_prunable_row_groups(spark, tmp_path):
    """write_parquet(cluster_by=...) must yield files/row groups whose
    min/max stats cover narrow disjoint slices of the key domain —
    that's what lets a point/range predicate skip them entirely at scan
    time. An unsorted shuffled write gives near-full-range stats."""
    import pyarrow.parquet as pq

    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        write_parquet,
    )

    df = (
        spark.range(200_000)
        .selectExpr("pmod(hash(id), 100000) AS k", "id AS v")
        .repartition(2)
    )
    sorted_p = str(tmp_path / "sorted")
    unsorted_p = str(tmp_path / "unsorted")
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        # at test scale AQE coalesces the tiny range shuffle to ONE
        # partition (correct at 200k rows; at real scale there are many)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        write_parquet(df, sorted_p, cluster_by=["k"])
        write_parquet(df, unsorted_p)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)

    def ranges(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # k
                out.append((col.statistics.min, col.statistics.max))
        return out

    def coverage(rs):
        # mean fraction of the full key range each row group spans
        return sum(mx - mn for mn, mx in rs) / (len(rs) * 100_000)

    sorted_rs, unsorted_rs = ranges(sorted_p), ranges(unsorted_p)
    assert len(sorted_rs) >= 2
    # sorted: each row group covers a narrow slice; unsorted: nearly all
    assert coverage(sorted_rs) < 0.6 * coverage(unsorted_rs), (
        sorted_rs,
        unsorted_rs,
    )


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    """File-sink durability: with a checkpoint, stopping after batch 1
    and restarting with new input must process each input row exactly
    once — no batch-1 duplicates on replay, no missed rows. (The other
    half of streaming durability next to the stateful-restart test.)"""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )

    def run_once():
        q = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema(schema)
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "a.csv").write_text("id,v\n1,x\n2,y\n")
    run_once()
    (src / "b.csv").write_text("id,v\n3,z\n")
    run_once()   # restart from the checkpoint: must NOT re-emit a.csv
    rows = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
    assert rows == [(1, "x"), (2, "y"), (3, "z")]


def test_upsert_parquet_partition_migration_caveat_is_real(spark, tmp_path):
    """Documents (and pins) the stated caveat: a key whose PARTITION
    VALUE changes in an update leaves its old row in the old partition —
    partition-scoped upserts cannot see rows outside the touched
    partitions. If this test starts failing, the caveat docs must change
    too."""
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        upsert_parquet,
    )

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0, 0)], "id long, month string, amount double, version int"
    )
    upsert_parquet(spark, path, base, ["id"], "version", partition_by=["month"])
    moved = spark.createDataFrame(
        [(1, "2024-02", 11.0, 1)], "id long, month string, amount double, version int"
    )
    upsert_parquet(spark, path, moved, ["id"], "version", partition_by=["month"])
    rows = sorted((r.id, r.month, r.version) for r in spark.read.parquet(path).collect())
    # both versions exist — the old partition's row survives (the caveat)
    assert rows == [(1, "2024-01", 0), (1, "2024-02", 1)]


def test_compact_parquet_reduces_files_and_preserves_content(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        table_manifest,
    )
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "frag")
    spark.range(10_000).selectExpr(
        "id AS k", "CAST(id % 97 AS STRING) AS v"
    ).repartition(40).write.parquet(path)

    before = table_manifest(spark.read.parquet(path), ["k", "v"], "t").first()
    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1 == stats["target_files"]
    after_df = spark.read.parquet(path)
    after = table_manifest(after_df, ["k", "v"], "t").first()
    # byte-identical content, order notwithstanding
    assert (after.n_rows, after.content_xor) == (before.n_rows, before.content_xor)
    # no temp/backup litter
    import os
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_compact_parquet_rejects_empty_dir(spark, tmp_path):
    import pytest
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        compact_parquet,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        compact_parquet(spark, str(empty))



def test_jsonl_roundtrip_preserves_hostile_strings(spark, tmp_path):
    """JSONL write->read must survive newlines, quotes, backslashes,
    unicode and NULLs byte-exactly (the reason the format escapes)."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        read_jsonl,
        write_jsonl,
    )

    rows = [
        (1, 'line1\nline2\r\nline3'),
        (2, 'quote " and backslash \\ and tab\t'),
        (3, "unicode: caf" + chr(0xE9) + " " + chr(0x4F60) + chr(0x597D)),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs.jsonl")
    write_jsonl(df, path)
    back = {r.doc_id: r.text for r in read_jsonl(spark, path, df.schema).collect()}
    # Spark's JSON sink drops NULL fields entirely on write; the schema'd
    # read restores them as NULL — the documented round-trip semantics
    assert back == {r[0]: r[1] for r in rows}


def test_read_jsonl_malformed_rows_become_nulls(spark, tmp_path):
    """Schema'd JSONL read: malformed lines surface as all-NULL rows
    (no schema mutation, no job failure) — the declared-schema
    discipline's failure mode, visible and countable."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "not-a-number", "text": "type clash"}\n'
    )
    out = read_jsonl(
        spark, str(p), spark.createDataFrame([], "doc_id long, text string").schema
    ).collect()
    good = {r.doc_id: r.text for r in out if r.doc_id is not None}
    assert good == {1: "ok", 2: "also ok"}
    # malformed + type-clash rows survive as NULL-keyed rows, not errors
    assert sum(1 for r in out if r.doc_id is None) == 2


def test_compact_parquet_partitioned_dataset(spark, tmp_path):
    """Compaction over a hive-partitioned dataset: recursive part-file
    discovery, content preserved (partition column included), temp/old
    dirs cleaned."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        table_manifest,
    )
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "part_ds")
    spark.range(2_000).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).repartition(12).write.partitionBy("p").parquet(path)
    before = table_manifest(spark.read.parquet(path), ["k", "p"], "t").first()
    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] > stats["files_after"]
    after = table_manifest(spark.read.parquet(path), ["k", "p"], "t").first()
    assert (after.n_rows, after.content_xor) == (before.n_rows, before.content_xor)


def test_compact_parquet_preserves_partition_layout_when_asked(spark, tmp_path):
    import glob as _glob
    import os as _os

    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "keep_parts")
    spark.range(3_000).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).repartition(12).write.partitionBy("p").parquet(path)
    compact_parquet(spark, path, target_file_bytes=10**9, partition_by=["p"])
    # hive layout intact: p=0/1/2 dirs each holding exactly one file
    for v in ("0", "1", "2"):
        files = _glob.glob(_os.path.join(path, f"p={v}", "*.parquet"))
        assert len(files) == 1, (v, files)
    # pruning still works
    assert spark.read.parquet(path).filter("p = '1'").count() == 1000


def test_read_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql import types as T
    from lab_etl_batch_data_processing_pipeline__spark.sources import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,3.5\n"
        "2,bob,notanumber\n"
        "junk\n"
        "3,carol,7.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(tmp_path), schema, header=True)
    assert sorted((r.id, r.name, r.score) for r in good.collect()) == [
        (1, "alice", 3.5),
        (3, "carol", 7.25),
    ]
    bad_rows = sorted(
        ((r.id, r.name, r.score, r._corrupt_record) for r in bad.collect()),
        key=lambda t: t[3],  # raw line — never NULL on the quarantine side
    )
    # partially-parsed fields survive alongside the raw line
    assert bad_rows == [
        (2, "bob", None, "2,bob,notanumber"),
        (None, None, None, "junk"),
    ]
    # schema collision guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_quarantine(
            spark,
            str(tmp_path),
            T.StructType(
                [T.StructField("_corrupt_record", T.StringType())]
            ),
        )


def test_streaming_session_windows_append_emits_closed_only(spark, tmp_path):
    """Mode contract pin: on a bounded replay, append emits only sessions
    the final watermark already closed (possibly none), while complete
    emits the full final state — which is why the oracle row runs
    complete. Also pins that the complete-mode sessions equal the batch
    F.session_window aggregate."""
    from pyspark.sql import functions as F
    from lab_etl_batch_data_processing_pipeline__spark.streaming import (
        streaming_session_windows,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (1, "2024-01-03 09:00:00"), (2, "2024-01-01 05:00:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "events")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = {}
    for mode in ("complete", "append"):
        sess = streaming_session_windows(
            stream, "ts", gap="12 hours", watermark_delay="1 hour"
        )
        sink = f"sess_mode_{mode}"
        q = (
            sess.writeStream.format("memory").queryName(sink)
            .outputMode(mode).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        out[mode] = {
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.table(sink).collect()
        }
    batch = {
        (r.user_id, str(r.w.start), str(r.w.end), r.n_events)
        for r in df.groupBy(
            "user_id", F.session_window("ts", "12 hours").alias("w")
        ).agg(F.count(F.lit(1)).alias("n_events")).collect()
    }
    assert out["complete"] == batch
    assert out["append"] <= out["complete"]  # only watermark-closed sessions
    # the session still open at end-of-input never appears in append
    open_session = max(batch, key=lambda s: s[1])
    assert open_session not in out["append"]


def test_read_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql import types as T
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": "notanint", "text": "bad id type"}\n'
        'truncated {"doc_id": 3\n'
        '{"doc_id": 4}\n'  # missing field -> NULL, NOT quarantined
        '{"doc_id": 5, "text": "ok"}\n'
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, bad = read_jsonl_quarantine(spark, str(tmp_path), schema)
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "hello world"),
        (4, None),
        (5, "ok"),
    ]
    bad_raw = sorted(r._corrupt_record for r in bad.collect())
    assert bad_raw == [
        'truncated {"doc_id": 3',
        '{"doc_id": "notanint", "text": "bad id type"}',
    ]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Bounded-state mode: dropDuplicatesWithinWatermark dedups repeats
    inside the horizon; on a single bounded replay it equals distinct."""
    from lab_etl_batch_data_processing_pipeline__spark.streaming import streaming_dedup

    src = tmp_path / "dedup_wm_src"
    src.mkdir()
    (src / "a.csv").write_text(
        "id,ts\n1,2024-01-01T00:00:00\n1,2024-01-01T00:30:00\n"
        "2,2024-01-01T01:00:00\n2,2024-01-01T01:00:00\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    stream = (
        spark.readStream.format("csv").option("header", "true")
        .schema(schema).load(str(src))
    )
    out = []
    q = (
        streaming_dedup(stream, ["id"], "ts", watermark_delay="2 hours",
                        within_watermark=True)
        .writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(r.id for r in out) == [1, 2]


def test_xml_roundtrip_nulls_need_schema(spark, tmp_path):
    """XML omits NULL fields as elements; an explicit read schema
    resurrects them as NULLs — the declared-schema discipline the
    reader documents."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        read_xml,
        write_xml,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None)], "id long, name string, v double"
    )
    dest = str(tmp_path / "xml")
    write_xml(df, dest, row_tag="r", root_tag="rs")
    back = read_xml(spark, dest, row_tag="r", schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_upsert_parquet_dynamic_overwrite_without_session_conf(spark, tmp_path):
    """The partition-scoped overwrite must be pinned PER WRITE: under a
    session whose partitionOverwriteMode is the STATIC default (the
    driver's vanilla session), an upsert touching one partition must
    still leave every other partition intact. Regression for the r9
    cold-cache vanilla failure (the second upsert pass wiped all
    untouched months)."""
    from lab_etl_batch_data_processing_pipeline__spark.sources.writers import upsert_parquet

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0, 0), (2, "2024-02", 20.0, 0), (3, "2024-03", 30.0, 0)],
        ["id", "month", "amount", "version"],
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        upsert_parquet(spark, path, base, ["id"], "version", partition_by=["month"])
        updates = spark.createDataFrame(
            [(2, "2024-02", 25.0, 1)], ["id", "month", "amount", "version"]
        )
        upsert_parquet(spark, path, updates, ["id"], "version", partition_by=["month"])
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    got = {(r.id, r.month): r.amount for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024-01"): 10.0, (2, "2024-02"): 25.0, (3, "2024-03"): 30.0}
