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


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _palette_png_2x2(bit_depth: int = 8) -> bytes:
    """Hand-built 2x2 palette PNG (color type 3, entries black+white,
    indices [0,1 / 1,0]) at any legal palette depth — since the r14
    PLTE support this is a shape the pure-Python decoder handles
    natively (the r13 verdict task 4 'fallback golden flipped' fixture).
    Sub-byte depths pack both row indices into one byte, high bits
    first per spec."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, bit_depth, 3, 0, 0, 0)
    plte = bytes((0, 0, 0, 255, 255, 255))
    if bit_depth == 8:
        rows = (bytes((0, 1)), bytes((1, 0)))
    else:  # indices 0,1 then 1,0 packed high-bits-first
        shift = 8 - 2 * bit_depth
        rows = (
            bytes(((0 << bit_depth | 1) << shift,)),
            bytes(((1 << bit_depth | 0) << shift,)),
        )
    raw = b"".join(b"\x00" + r for r in rows)
    return (
        multimodal.PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _gray16_png_2x2() -> bytes:
    """Hand-built 2x2 16-bit grayscale PNG, 0x0000/0xFFFF checkerboard
    — natively decoded since the r14 full-shape decoder (16-bit
    samples reduce to their high byte)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    raw = (
        b"\x00" + b"\x00\x00" + b"\xff\xff"
        + b"\x00" + b"\xff\xff" + b"\x00\x00"
    )
    return (
        multimodal.PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


try:  # optional dependency — absent in this container
    import PIL  # noqa: F401
except ImportError:
    PIL = None


@pytest.mark.parametrize("bit_depth", [1, 2, 4, 8])
def test_decode_image_palette_png_decodes_natively(bit_depth):
    """PLTE support (r13 verdict task 4): indexed-color PNGs decode on
    the pure-Python path at every legal palette depth — exact expanded
    RGB pixels, exact 0.5 mean for the black/white checker — instead of
    falling through to the stub. This flips the r12-era fallback golden
    into a real-decode golden."""
    payload = _palette_png_2x2(bit_depth)
    w, h, ch, pixels = multimodal.decode_png_pixels(payload)
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(pixels) == bytes(
        (0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0)
    )
    assert multimodal.decode_image(payload) == (2, 2, 0.5)


def test_decode_png_16bit_natively():
    """16-bit samples decode natively since r14, reducing to the high
    byte — exact 0.5 mean for the full-scale checker."""
    payload = _gray16_png_2x2()
    w, h, ch, px = multimodal.decode_png_pixels(payload)
    assert (w, h, ch) == (2, 2, 1)
    assert bytes(px) == bytes((0, 255, 255, 0))
    assert multimodal.decode_image(payload) == (2, 2, 0.5)


def test_decode_image_malformed_png_falls_back_to_stub():
    """With every legal PNG shape decoded natively, the fallback chain
    is reserved for MALFORMED streams: the pure decoder raises, then
    Pillow (when present) or the deterministic stub takes over. The
    fixture is a structurally-truncated PNG (valid signature + IHDR,
    IDAT shorter than one scanline), which Pillow also rejects — so
    the stub tuple is pinned on both routes."""
    import struct
    import zlib

    payload = (
        multimodal.PNG_SIGNATURE
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01"))  # 2 of 52 bytes
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        multimodal.decode_png(payload)
    assert multimodal.decode_image(payload) == multimodal.decode_image_stub(payload)
    checksum = sum(payload[:64])
    assert multimodal.decode_image_stub(payload) == (
        64 + checksum % 512,
        64 + (checksum * 7) % 512,
        (checksum % 256) / 255.0,
    )


def test_decode_png_truncated_plte_reports_malformed_plte():
    """A PLTE whose declared length overruns the remaining payload (a
    truncated stream) must fail with the malformed-PLTE message, not
    surface later as an opaque pixel-slice length mismatch (r14
    ADVICE): the chunk walk slices data from the payload, so len(data)
    can silently be < the declared length."""
    import struct

    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    # declared 6-byte (2-entry) palette, but only 4 bytes present: the
    # chunk-length field says 6 and the payload ends mid-palette.
    plte = _png_chunk(b"PLTE", b"\x10\x20\x30\x40\x50\x60")
    truncated = plte[: 8 + 4]  # keep length+type+4 of 6 data bytes
    payload = multimodal.PNG_SIGNATURE + ihdr + truncated
    with pytest.raises(ValueError, match="malformed PLTE"):
        multimodal.decode_png_pixels(payload)


def test_decode_png_palette_randomized_all_filters():
    """Randomized palette-decode golden: random index images at every
    legal palette depth, rows filtered with ALL five PNG filter types
    (the spec's bpp=1 packed-byte filter domain for sub-byte depths),
    must decode to the exact palette-expanded RGB buffer. Seeded, so
    deterministic; the hand fixture above only exercises filter 0."""
    import random
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def apply_filter(ft, line, prev, bpp):
        out = bytearray()
        for i in range(len(line)):
            x = line[i]
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[ft]
            out.append((x - pred) & 0xFF)
        return out

    rng = random.Random(1405)
    for _trial in range(40):
        depth = rng.choice([1, 2, 4, 8])
        w, h = rng.randint(1, 9), rng.randint(1, 6)
        n_entries = rng.randint(1, 1 << depth)
        palette = bytes(rng.randrange(256) for _ in range(3 * n_entries))
        idx = [[rng.randrange(n_entries) for _ in range(w)] for _ in range(h)]
        stride = (w * depth + 7) // 8
        packed = []
        for row in idx:
            cur = bytearray(stride)
            bit = 0
            for v in row:
                cur[bit // 8] |= v << (8 - depth - bit % 8)
                bit += depth
            packed.append(cur)
        raw = bytearray()
        prev = bytearray(stride)
        for row in packed:
            ft = rng.randrange(5)
            raw.append(ft)
            raw += apply_filter(ft, row, prev, 1)
            prev = row
        png = (
            multimodal.PNG_SIGNATURE
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0))
            + _png_chunk(b"PLTE", palette)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        got_w, got_h, got_ch, px = multimodal.decode_png_pixels(png)
        assert (got_w, got_h, got_ch) == (w, h, 3)
        expect = bytearray()
        for row in idx:
            for v in row:
                expect += palette[3 * v : 3 * v + 3]
        assert bytes(px) == bytes(expect)


def test_decode_png_full_shape_matrix_randomized():
    """Randomized golden over the COMPLETE legal PNG shape matrix:
    every (color type, bit depth) pair the spec allows, both interlace
    methods (Adam7 included), all five filter types, random dims —
    decoded pixels must equal the reference image exactly (palette
    expanded; 16-bit reduced to high byte; sub-byte gray scaled to
    full range). Seeded; 60 cases cover each shape at least twice."""
    import random
    import struct
    import zlib

    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def filt_row(ft, line, prev, bpp):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[ft]
            out.append((line[i] - pred) & 0xFF)
        return out

    def pack_row(pxs, depth, channels):
        if depth == 8:
            return bytearray(v for px in pxs for v in px)
        if depth == 16:
            out = bytearray()
            for px in pxs:
                for v in px:
                    out += struct.pack(">H", v)
            return out
        out = bytearray((len(pxs) * depth + 7) // 8)
        bit = 0
        for px in pxs:
            out[bit // 8] |= px[0] << (8 - depth - bit % 8)
            bit += depth
        return out

    def encode(w, h, depth, ct, channels, img, palette, interlace, rng):
        raw = bytearray()
        passes = ((0, 0, 1, 1),) if interlace == 0 else ADAM7
        bpp = max(1, channels * depth // 8)
        for x0, y0, dx, dy in passes:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            prev = bytearray(stride)
            for ry in range(ph):
                rowpx = [img[y0 + ry * dy][x0 + rx * dx] for rx in range(pw)]
                packed = pack_row(rowpx, depth, channels)
                ft = rng.randrange(5)
                raw.append(ft)
                raw += filt_row(ft, packed, prev, bpp)
                prev = packed
        png = multimodal.PNG_SIGNATURE + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
        )
        if palette is not None:
            png += _png_chunk(b"PLTE", palette)
        return png + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
            b"IEND", b""
        )

    CASES = [
        (ct, d, il)
        for ct, depths in (
            (0, (1, 2, 4, 8, 16)), (2, (8, 16)), (3, (1, 2, 4, 8)),
            (4, (8, 16)), (6, (8, 16)),
        )
        for d in depths
        for il in (0, 1)
    ]
    CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    rng = random.Random(2014)
    for trial in range(2 * len(CASES)):
        ct, d, il = CASES[trial % len(CASES)]
        channels = CH[ct]
        w, h = rng.randint(1, 13), rng.randint(1, 11)
        palette = None
        if ct == 3:
            n_entries = rng.randint(1, 1 << d)
            palette = bytes(rng.randrange(256) for _ in range(3 * n_entries))
            maxv = n_entries - 1
        else:
            maxv = (1 << d) - 1
        img = [
            [tuple(rng.randint(0, maxv) for _ in range(channels)) for _ in range(w)]
            for _ in range(h)
        ]
        png = encode(w, h, d, ct, channels, img, palette, il, rng)
        got_w, got_h, got_ch, px = multimodal.decode_png_pixels(png)
        out_ch = 3 if ct == 3 else channels
        assert (got_w, got_h, got_ch) == (w, h, out_ch), (trial, ct, d, il)
        exp = bytearray()
        for y in range(h):
            for x in range(w):
                v = img[y][x]
                if ct == 3:
                    exp += palette[v[0] * 3 : v[0] * 3 + 3]
                elif d == 16:
                    exp += bytes(s >> 8 for s in v)
                elif d == 8:
                    exp += bytes(v)
                else:
                    exp += bytes((v[0] * (255 // maxv),))
        assert bytes(px) == bytes(exp), (trial, ct, d, il, w, h)


def test_resize_png_accepts_every_legal_shape_and_matches_replica():
    """resize_png over formerly-fallback input shapes (palette,
    sub-byte gray, 16-bit, Adam7) — decode now succeeds, the
    nearest-neighbor resample must equal the index-arithmetic replica,
    and the re-encode normalizes to 8-bit non-interlaced (decodable by
    the same decoder, bit-identical pixels)."""
    import random
    import struct
    import zlib

    rng = random.Random(77)

    def build(ct, depth, interlace, w, h):
        channels = {0: 1, 2: 3, 3: 1}[ct]
        palette = None
        if ct == 3:
            n_entries = rng.randint(1, 1 << depth)
            palette = bytes(rng.randrange(256) for _ in range(3 * n_entries))
            maxv = n_entries - 1
        else:
            maxv = (1 << depth) - 1
        img = [
            [tuple(rng.randint(0, maxv) for _ in range(channels)) for _ in range(w)]
            for _ in range(h)
        ]
        # filter-0 rows, optionally Adam7-ordered
        ADAM7 = (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        passes = ((0, 0, 1, 1),) if interlace == 0 else ADAM7
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            for ry in range(ph):
                rowpx = [img[y0 + ry * dy][x0 + rx * dx] for rx in range(pw)]
                if depth == 8:
                    line = bytearray(v for px in rowpx for v in px)
                elif depth == 16:
                    line = bytearray()
                    for px in rowpx:
                        for v in px:
                            line += struct.pack(">H", v)
                else:
                    line = bytearray((pw * depth + 7) // 8)
                    bit = 0
                    for px in rowpx:
                        line[bit // 8] |= px[0] << (8 - depth - bit % 8)
                        bit += depth
                raw += b"\x00" + line
        png = multimodal.PNG_SIGNATURE + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
        )
        if palette is not None:
            png += _png_chunk(b"PLTE", palette)
        return png + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
            b"IEND", b""
        )

    for ct, depth, interlace in ((3, 4, 0), (0, 2, 0), (0, 16, 1), (2, 8, 1)):
        w, h = rng.randint(2, 9), rng.randint(2, 7)
        tw, th = rng.randint(1, 6), rng.randint(1, 6)
        png = build(ct, depth, interlace, w, h)
        src_w, src_h, ch, src_px = multimodal.decode_png_pixels(png)
        out_png, ow, oh = multimodal.resize_png(png, tw, th)
        assert (ow, oh) == (w, h)
        rw, rh, rch, rpx = multimodal.decode_png_pixels(out_png)
        assert (rw, rh, rch) == (tw, th, ch)
        for ty in range(th):
            sy = min(h - 1, ty * h // th)
            for tx in range(tw):
                sx = min(w - 1, tx * w // tw)
                s = (sy * w + sx) * ch
                d = (ty * tw + tx) * ch
                assert rpx[d : d + ch] == src_px[s : s + ch], (ct, depth, interlace)


def test_decode_wav_full_shape_matrix_randomized():
    """Randomized golden over the legal PCM WAV shape matrix (the WAV
    twin of the PNG matrix golden, r14 verdict task 4): every sample
    width the decoder claims (8-bit unsigned, 16/24/32-bit signed LE)
    x mono/stereo x the common sample rates, random frame counts —
    container bytes are hand-built here (RIFF/fmt/data via struct, NOT
    the ``wave`` module the decoder itself uses), and every decoded
    field including the 6-dp RMS must match an in-test replica."""
    import random
    import struct

    def encode_wav(channels, rate, width, samples):
        if width == 1:
            frames = bytes((s + 128) & 0xFF for s in samples)
        elif width == 3:
            frames = b"".join(
                s.to_bytes(3, "little", signed=True) for s in samples
            )
        else:
            fmt = {2: "h", 4: "i"}[width]
            frames = struct.pack(f"<{len(samples)}{fmt}", *samples)
        block = channels * width
        fmt_chunk = struct.pack(
            "<HHIIHH", 1, channels, rate, rate * block, block, width * 8
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(frames)) + frames
            + (b"\x00" if len(frames) % 2 else b"")  # RIFF word align
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    FULL_SCALE = {1: 128.0, 2: 32768.0, 3: 8388608.0, 4: 2147483648.0}
    MAXV = {1: 127, 2: 32767, 3: 8388607, 4: 2147483647}
    RATES = (8000, 11025, 16000, 22050, 44100)
    CASES = [(w, ch) for w in (1, 2, 3, 4) for ch in (1, 2)]
    rng = random.Random(2015)
    for trial in range(3 * len(CASES)):
        width, channels = CASES[trial % len(CASES)]
        rate = RATES[rng.randrange(len(RATES))]
        n_frames = rng.randint(1, 300)
        lo, hi = -MAXV[width] - 1, MAXV[width]
        samples = [
            rng.randint(lo, hi) for _ in range(n_frames * channels)
        ]
        payload = encode_wav(channels, rate, width, samples)
        got = multimodal.decode_wav(payload)
        n = len(samples)
        exp_rms = round(
            (sum(v * v for v in samples) / n) ** 0.5 / FULL_SCALE[width], 6
        )
        exp = (
            channels,
            rate,
            n_frames,
            round(n_frames * 1000 / rate),
            exp_rms,
        )
        assert got == exp, (trial, width, channels, rate, n_frames, got, exp)


def test_decode_avi_full_shape_matrix_randomized():
    """Randomized golden over the AVI/DIB shape matrix (the video twin
    of the PNG matrix golden, r14 verdict task 4): BI_RGB bit depths
    8/24 x bottom-up AND top-down (negative strf height) x random dims
    chosen to exercise 4-byte row-stride padding x random frame counts.
    The container is hand-built here (independent of media_synth's
    encoder); header fields, stream format, frame iteration, and every
    decoded pixel must match the in-test reference image exactly."""
    import random

    def riff(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + len(data).to_bytes(4, "little") + data + pad

    def encode_avi(w, h_signed, bits, imgs, usec_per_frame):
        h = abs(h_signed)
        channels = bits // 8
        stride = (w * channels + 3) & ~3
        frames = []
        for img in imgs:  # img: top-down rows of pixel tuples
            buf = bytearray()
            rows = range(h) if h_signed < 0 else range(h - 1, -1, -1)
            for y in rows:
                row = bytearray()
                for px in img[y]:
                    row += bytes(px[::-1]) if channels == 3 else bytes(px)
                row += b"\x00" * (stride - len(row))
                buf += row
            frames.append(bytes(buf))
        avih = b"".join(
            v.to_bytes(4, "little")
            for v in [usec_per_frame, 0, 0, 0, len(imgs), 0, 1, 0, w, h, 0, 0, 0, 0]
        )
        strh = b"vids" + b"\x00" * 52
        strf = (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h_signed.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + bits.to_bytes(2, "little")
            + (0).to_bytes(4, "little")  # BI_RGB
            + b"\x00" * 20
        )
        hdrl = riff(
            b"LIST",
            b"hdrl"
            + riff(b"avih", avih)
            + riff(b"LIST", b"strl" + riff(b"strh", strh) + riff(b"strf", strf)),
        )
        movi = riff(
            b"LIST", b"movi" + b"".join(riff(b"00db", f) for f in frames)
        )
        # a non-frame trailing chunk the walkers must skip, not choke on
        body = b"AVI " + hdrl + movi + riff(b"idx1", b"\x00" * 16)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    CASES = [
        (bits, top_down) for bits in (8, 24) for top_down in (False, True)
    ]
    rng = random.Random(2016)
    for trial in range(4 * len(CASES)):
        bits, top_down = CASES[trial % len(CASES)]
        channels = bits // 8
        # odd widths force nonzero stride padding for both depths
        w, h = rng.randint(1, 13), rng.randint(1, 9)
        n_frames = rng.randint(1, 5)
        usec = rng.choice((33_333, 40_000, 66_667))
        imgs = [
            [
                [tuple(rng.randrange(256) for _ in range(channels)) for _ in range(w)]
                for _ in range(h)
            ]
            for _ in range(n_frames)
        ]
        h_signed = -h if top_down else h
        payload = encode_avi(w, h_signed, bits, imgs, usec)
        assert multimodal.decode_avi_header(payload) == (
            w, h, n_frames, round(n_frames * usec / 1000)
        ), (trial, bits, top_down)
        assert multimodal.decode_avi_stream_format(payload) == (
            w, h_signed, bits, 0
        ), (trial, bits, top_down)
        frames = list(multimodal.iter_avi_frames(payload))
        assert len(frames) == n_frames, (trial, bits, top_down)
        for img, frame in zip(imgs, frames):
            fw, fh, fch, px = multimodal.decode_dib_frame(
                frame, w, h_signed, bits
            )
            exp = b"".join(
                bytes(p) for row in img for p in row
            )
            assert (fw, fh, fch) == (w, h, channels), (trial, bits, top_down)
            assert px == exp, (trial, bits, top_down, w, h)
