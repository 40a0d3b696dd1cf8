"""REAL pixel/sample decode tests: PNG (zlib + scanline unfiltering)
and PCM WAV (frame decode), plus the Spark stats operators over them.

The encoder/decoder pair could in principle share a bug, so the first
tests use HAND-ASSEMBLED byte vectors (filtered bytes computed on
paper from PNG spec §6) before any roundtrip property runs."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hypermap_etl_spark.operators.multimodal import (
    _paeth,
    audio_sample_stats,
    decode_png_pixels,
    decode_wav_samples,
    encode_png,
    pixel_stats,
)
from hypermap_etl_spark.schemas import MEDIA_SCHEMA


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + typ + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png(w, h, depth, ct, raw, plte=None, interlace=0):
    ihdr = struct.pack(">II", w, h) + bytes([depth, ct, 0, 0, interlace])
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_png_hand_vector_sub_and_up():
    # 2x2 gray [[10,20],[30,70]]; row0 Sub → 01 0a 0a, row1 Up → 02 14 32
    raw = bytes([1, 10, 10, 2, 20, 50])
    d = decode_png_pixels(_png(2, 2, 8, 0, raw))
    assert d is not None
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 1)
    assert list(d["pixels"]) == [10, 20, 30, 70]


def test_png_hand_vector_average_and_paeth_rgb():
    # 2x2 RGB, bpp=3. Row 0 Average (up=0 → pred = left//2):
    # pixels row0 = (10,20,30),(40,60,80)
    #   filtered: 10,20,30, 40-5=35, 60-10=50, 80-15=65
    # Row 1 Paeth: pixels row1 = (12,22,32),(50,70,90)
    #   x<3: pred=paeth(0,up,0)=up → 12-10=2, 22-20=2, 32-30=2
    #   x>=3: left=(12,22,32) up=(40,60,80) ul=(10,20,30)
    #     p = left+up-ul = (42,62,82); |p-a|=30 |p-b|=2 |p-c|=32 → up
    #     → 50-40=10, 70-60=10, 90-80=10
    raw = bytes([3, 10, 20, 30, 35, 50, 65, 4, 2, 2, 2, 10, 10, 10])
    d = decode_png_pixels(_png(2, 2, 8, 2, raw))
    assert d is not None and d["channels"] == 3
    assert list(d["pixels"]) == [10, 20, 30, 40, 60, 80, 12, 22, 32, 50, 70, 90]


def test_png_palette_expansion():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1, 0, 2, 1])  # two rows, filter 0: [0,1], [2,1]
    d = decode_png_pixels(_png(2, 2, 8, 3, raw, plte=pal))
    assert d is not None and d["channels"] == 3
    assert list(d["pixels"]) == [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0]
    # palette index out of range → honest None, not garbage pixels
    bad = bytes([0, 0, 3, 0, 0, 0])
    assert decode_png_pixels(_png(2, 2, 8, 3, bad, plte=pal)) is None


def test_png_out_of_scope_variants_return_none():
    raw = bytes([0, 10, 20, 0, 30, 40])
    assert decode_png_pixels(_png(2, 2, 8, 0, raw)) is not None
    assert decode_png_pixels(_png(2, 2, 4, 0, raw)) is None  # sub-byte depth
    assert decode_png_pixels(_png(2, 2, 16, 0, raw)) is None
    assert decode_png_pixels(_png(2, 2, 8, 0, raw, interlace=1)) is None
    assert decode_png_pixels(_png(2, 2, 8, 3, raw)) is None  # PLTE missing
    # corrupt deflate stream / wrong decompressed size
    sig = _png(2, 2, 8, 0, raw)
    assert decode_png_pixels(sig[:-20] + b"x" * 20) is None
    assert decode_png_pixels(_png(2, 3, 8, 0, raw)) is None
    assert decode_png_pixels(b"\xff\xd8\xff\xc0" + b"\x00" * 40) is None


def test_paeth_predictor_spec_cases():
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 30) == 10  # p=0 → closest to a
    assert _paeth(100, 101, 100) == 101  # p=101 → pb=0 wins over pa=1
    assert _paeth(5, 9, 7) == 7  # pc=0 beats the pa=pb tie
    assert _paeth(5, 5, 9) == 5  # pa=pb=4 < pc=8 → left wins (spec order)


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),
    st.integers(1, 8),
    st.integers(1, 8),
    st.data(),
)
def test_png_roundtrip_property(ct_ch, w, h, data):
    ct, ch = ct_ch
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    d = decode_png_pixels(encode_png(w, h, px, color_type=ct, row_filters=filters))
    assert d is not None
    assert d["pixels"] == px
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)


def _wav(rate, ch, bits, samples, declared_extra=0):
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(s + 128 for s in samples)
    ba = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ba, ba, bits)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data) + declared_extra) + data
    )


def test_wav_sample_decode_16_and_8_bit():
    s16 = [0, -32768, 32767, 1000, -1, 5, 6, 7]
    d = decode_wav_samples(_wav(8000, 2, 16, s16))
    assert d is not None and d["bits"] == 16 and d["channels"] == 2
    assert list(d["samples"]) == s16
    s8 = [-128, 127, 0, 64, -5]
    d8 = decode_wav_samples(_wav(44100, 1, 8, s8))
    assert d8 is not None and d8["bits"] == 8
    assert list(d8["samples"]) == s8


def test_wav_sample_decode_clamps_and_rejects():
    # declared data size beyond the bytes present: clamp to whole frames
    s16 = [1, 2, 3, 4, 5, 6]
    d = decode_wav_samples(_wav(8000, 2, 16, s16, declared_extra=100))
    assert list(d["samples"]) == s16
    # stereo 16-bit with a ragged trailing byte: truncate to whole frames
    ragged = _wav(8000, 2, 16, s16)[:-1]
    ragged = ragged[:40] + struct.pack("<I", 11) + ragged[44:]
    dr = decode_wav_samples(ragged)
    assert dr is not None and list(dr["samples"]) == s16[:4]
    # IEEE-float (format 3) is codec territory → None
    f = _wav(8000, 1, 16, s16).replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1
    )
    assert decode_wav_samples(f) is None
    assert decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_wav_samples(b"\xff\xfb\x90\xc0" + b"x" * 50) is None


def _media_rows(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_pixel_stats_real_decode_and_header_fallback(spark):
    px = bytes(range(12))  # 2x2 RGB ramp 0..11
    png = encode_png(2, 2, px, color_type=2, row_filters=[4, 3])
    jpeg = (
        b"\xff\xd8\xff\xc0\x00\x11\x08" + struct.pack(">HH", 45, 123)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    rows = [
        (1, "image", bytearray(png), "image/png", (9999, 9999, None, None)),
        (2, "image", bytearray(jpeg), "image/jpeg", (9999, 9999, None, None)),
        (3, "image", bytearray(b"garbage"), "application/octet-stream",
         (77, 88, None, None)),
    ]
    out = {
        r["media_id"]: r.asDict()
        for r in pixel_stats(_media_rows(spark, rows)).collect()
    }
    assert out[1]["fmt"] == "png" and out[1]["channels"] == 3
    assert out[1]["px_count"] == 12 and out[1]["px_sum"] == sum(range(12))
    assert out[1]["px_min"] == 0 and out[1]["px_max"] == 11
    # entropy-coded: header dims real, pixel columns NULL — never faked
    assert out[2]["fmt"] == "jpeg" and out[2]["width"] == 123
    assert out[2]["px_sum"] is None and out[2]["channels"] is None
    assert out[3]["fmt"] is None and out[3]["width"] == 77
    assert out[3]["px_sum"] is None

    with pytest.raises(Exception, match="NotImplementedError|stdlib-decodable"):
        pixel_stats(_media_rows(spark, rows), strict=True).collect()


def test_audio_sample_stats_real_decode_and_fallback(spark):
    s = [100, -100, 50, -50, 0, 200, -1, 1]  # mono: 8 frames
    wav = _wav(8000, 1, 16, s)
    mp3 = bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"x" * 100
    rows = [
        (1, "audio", bytearray(wav), "audio/wav", (None, None, None, 9999)),
        (2, "audio", bytearray(mp3), "audio/mp3", (None, None, None, 9999)),
        (3, "audio", bytearray(b"junk"), "application/octet-stream",
         (None, None, None, 4242)),
    ]
    out = {
        r["media_id"]: r.asDict()
        for r in audio_sample_stats(_media_rows(spark, rows)).collect()
    }
    a = out[1]
    assert a["fmt"] == "wav" and a["n_frames"] == 8 and a["bits"] == 16
    assert a["peak_abs"] == 200
    assert a["abs_sum"] == sum(abs(x) for x in s)
    assert a["sq_sum"] == sum(x * x for x in s)
    # sign flips: 100→-100, -100→50, 50→-50 , -50→0 (no), 0→200 (no),
    # 200→-1, -1→1 → 5
    assert a["zero_cross"] == 5
    # mp3: header facts real, sample columns NULL
    assert out[2]["fmt"] == "mp3" and out[2]["sample_rate"] == 128 * 0 + 44100
    assert out[2]["n_frames"] is None and out[2]["sq_sum"] is None
    assert out[3]["fmt"] is None and out[3]["n_frames"] is None

    with pytest.raises(Exception, match="NotImplementedError|not a PCM WAV"):
        audio_sample_stats(_media_rows(spark, rows), strict=True).collect()


def test_audio_sample_stats_stereo_channel0_crossings(spark):
    # interleaved stereo: ch0 = [10,-10,10], ch1 = [1,1,1] → ch0 flips 2
    s = [10, 1, -10, 1, 10, 1]
    rows = [(1, "audio", bytearray(_wav(8000, 2, 16, s)), "audio/wav",
             (None, None, None, None))]
    out = audio_sample_stats(_media_rows(spark, rows)).collect()[0]
    assert out["n_frames"] == 3 and out["channels"] == 2
    assert out["zero_cross"] == 2


def _gate_parity(spark, fn, oracle, sf):
    from tests.test_oracle_parity import _duck, _rows_to_set

    sdf = fn(spark, sf)
    srows = sdf.collect()
    scols = sdf.columns
    con = _duck(sf)
    try:
        ores = con.execute(oracle)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows) > 0
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    oset = _rows_to_set(ocols, orows)
    assert sset == oset
    return srows


def test_doc_media_pixels_matches_oracle_locally(spark):
    """Local parity for the UNREGISTERED pixel-decode gate
    (doc_media_pixels) — staged for r10 registration, the
    doc_media_video precedent: the exact driver-style DuckDB oracle
    comparison runs here so registering later is a one-line change with
    evidence already attached. strict=True inside the gate means any
    planted PNG the decoder cannot fully invert fails loudly."""
    from hypermap_etl_spark.plans.doc_queries import (
        DOC_MEDIA_PIXELS_ORACLE,
        doc_media_pixels,
    )
    from tests.test_oracle_parity import SF_SMOKE

    srows = _gate_parity(
        spark, doc_media_pixels, DOC_MEDIA_PIXELS_ORACLE, SF_SMOKE
    )
    # all four color-type branches really exercised
    assert {r["media_id"] % 4 for r in srows} == {0, 1, 2, 3}
    by_branch = {r["media_id"] % 4: r for r in srows}
    assert by_branch[0]["channels"] == 1
    assert by_branch[3]["channels"] == 3 and by_branch[3]["px_min"] is None


def test_doc_media_pcm_matches_oracle_locally(spark):
    """Local parity for the UNREGISTERED PCM-decode gate
    (doc_media_pcm) — staged for r10 registration."""
    from hypermap_etl_spark.plans.doc_queries import (
        DOC_MEDIA_PCM_ORACLE,
        doc_media_pcm,
    )
    from tests.test_oracle_parity import SF_SMOKE

    srows = _gate_parity(spark, doc_media_pcm, DOC_MEDIA_PCM_ORACLE, SF_SMOKE)
    bits = {r["media_id"] % 5 == 0: r["bits"] for r in srows}
    assert bits.get(True) == 8 and bits.get(False) == 16
    assert {r["media_id"] % 2 + 1 for r in srows} == {1, 2}


def test_image_neardup_exact_vs_bruteforce(spark):
    """Blocking + verify must return EXACTLY the hamming<=k pairs: check
    the operator against an in-python brute force over random images."""
    import random

    from hypermap_etl_spark.operators.multimodal import (
        ahash_bits,
        image_ahash,
        image_neardup_pairs,
    )

    rng = random.Random(7)
    rows, hashes = [], {}
    for mid in range(1, 25):
        w, h = rng.randint(3, 12), rng.randint(3, 12)
        # a few base patterns + noisy copies → some near pairs exist
        base = rng.choice([17, 201, 90])
        px = bytes(
            (base * (1 + (i // w) % 3) + (7 if rng.random() < 0.08 else 0)) % 256
            for i in range(w * h)
        )
        rows.append(
            (mid, "image", bytearray(encode_png(w, h, px, color_type=0)),
             "image/png", (None, None, None, None))
        )
        hashes[mid] = ahash_bits(px, w, h, 1)
    rows.append((99, "image", bytearray(b"junk"), "x", (None, None, None, None)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = image_ahash(df)
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in image_neardup_pairs(sigs, max_hamming=5).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 5:
                want[(a, b)] = d
    assert got == want and len(want) > 0
    # the undecodable row must never appear in any pair
    assert not any(99 in p for p in got)


def test_image_ahash_properties(spark):
    import pytest

    from hypermap_etl_spark.operators.multimodal import (
        ahash_bits,
        image_ahash,
        image_neardup_pairs,
    )

    # solid image: no sample strictly above the mean → hash 0
    assert ahash_bits(bytes([42] * 100), 10, 10, 1) == 0
    # left-bright / right-dark: exactly the bright half's bits set
    px = bytes(255 if (i % 8) < 4 else 0 for i in range(64))
    hv = ahash_bits(px, 8, 8, 1)
    assert bin(hv).count("1") == 32
    # luma uses BT.601 weights: pure-green brighter than pure-blue
    g = bytes(b"\x00\xff\x00" * 4 + b"\x00\x00\xff" * 4)
    assert ahash_bits(g, 4, 2, 3) != 0
    with pytest.raises(ValueError, match="grid"):
        image_ahash(None, grid=4)
    with pytest.raises(ValueError, match="complete"):
        image_neardup_pairs(None, max_hamming=8)


def test_doc_media_ahash_matches_oracle_locally(spark):
    """Local parity for the UNREGISTERED perceptual-hash/near-dup gate
    (doc_media_ahash) — staged for r10 registration."""
    from hypermap_etl_spark.plans.doc_queries import (
        DOC_MEDIA_AHASH_ORACLE,
        doc_media_ahash,
    )
    from tests.test_oracle_parity import SF_SMOKE

    srows = _gate_parity(
        spark, doc_media_ahash, DOC_MEDIA_AHASH_ORACLE, SF_SMOKE
    )
    # bit-63 rows really are negative longs, and near-dup groups exist
    assert any(r["ahash"] < 0 for r in srows)
    assert any(r["n_neardups"] > 0 for r in srows)


def test_audio_spectral_stats_finds_planted_tones(spark):
    """A planted sinusoid's dominant bin must come back within one bin
    width — real FFT, not a fake: 440 Hz at 8 kHz over 800 frames
    (10 Hz resolution), and a stereo clip whose ch0 is 1 kHz while ch1
    is 3 kHz noise-bait (channel-0 extraction pinned)."""
    import math

    from hypermap_etl_spark.operators.multimodal import (
        audio_spectral_stats,
        encode_wav,
    )

    def tone(freq, rate, n, amp=10000):
        return [int(amp * math.sin(2 * math.pi * freq * t / rate))
                for t in range(n)]

    mono = encode_wav(8000, 1, 16, tone(440, 8000, 800))
    ch0 = tone(1000, 8000, 400)
    ch1 = tone(3000, 8000, 400)
    inter = [v for pair in zip(ch0, ch1) for v in pair]
    stereo = encode_wav(8000, 2, 16, inter)
    silent = encode_wav(8000, 1, 16, [0] * 100)
    mp3 = bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"x" * 50
    rows = [
        (1, "audio", bytearray(mono), "audio/wav", (None, None, None, None)),
        (2, "audio", bytearray(stereo), "audio/wav", (None, None, None, None)),
        (3, "audio", bytearray(silent), "audio/wav", (None, None, None, None)),
        (4, "audio", bytearray(mp3), "audio/mp3", (None, None, None, None)),
    ]
    out = {
        r["media_id"]: r.asDict()
        for r in audio_spectral_stats(_media_rows(spark, rows)).collect()
    }
    assert abs(out[1]["dominant_hz"] - 440) <= 10
    assert abs(out[1]["centroid_hz"] - 440) <= 25  # leakage-tolerant
    assert out[1]["bandwidth_hz"] < 200
    assert abs(out[2]["dominant_hz"] - 1000) <= 20  # ch0, not the 3 kHz ch1
    assert out[3]["dominant_hz"] == 0.0 and out[3]["bandwidth_hz"] == 0.0
    assert out[4]["fmt"] == "mp3" and out[4]["dominant_hz"] is None


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_decoders_never_raise_on_mutations(data):
    """Parser robustness contract: any byte mutation / truncation of a
    valid container either decodes or returns None — NEVER raises.
    (The operators run strict=False over arbitrary lake bytes; an
    exception would kill the whole Arrow batch.)"""
    from hypermap_etl_spark.operators.multimodal import (
        parse_audio_header,
        parse_image_header,
        parse_video_header,
    )

    base = data.draw(
        st.sampled_from(
            [
                encode_png(3, 3, bytes(range(27)), color_type=2),
                _wav(8000, 2, 16, [5, -5, 10, -10]),
                b"\x89PNG\r\n\x1a\n" + b"\x00" * 30,
            ]
        )
    )
    b = bytearray(base)
    for _ in range(data.draw(st.integers(0, 8))):
        pos = data.draw(st.integers(0, len(b) - 1))
        b[pos] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(b)))
    mutated = bytes(b[:cut])
    for fn in (decode_png_pixels, decode_wav_samples, parse_image_header,
               parse_audio_header, parse_video_header):
        res = fn(mutated)  # must not raise
        assert res is None or isinstance(res, dict)


def test_incremental_ahash_store_exact_and_bucketed(spark, tmp_path):
    """Cross-batch image near-dup: (1) store+batch pairs together must
    equal the brute-force hamming<=k set over ALL images, with src
    marking which side; (2) the persisted store side of the join scans
    pre-bucketed — no exchange above the 100 TB historical scan."""
    import random

    from hypermap_etl_spark.operators.multimodal import (
        ahash_store_append,
        incremental_ahash_pairs,
    )

    rng = random.Random(11)

    def sig(base, flips):
        v = base
        for b in rng.sample(range(64), flips):
            v ^= 1 << b
        return v - (1 << 64) if v >= (1 << 63) else v

    base1, base2 = rng.getrandbits(64), rng.getrandbits(64)
    hist = [(i, "png", sig(base1 if i % 2 else base2, rng.randint(0, 4)))
            for i in range(1, 13)]
    new = [(100 + i, "png", sig(base1 if i % 2 else base2, rng.randint(0, 4)))
           for i in range(6)]
    new.append((200, "png", None))  # undecodable row must drop out
    hist_df = spark.createDataFrame(hist, "media_id long, fmt string, ahash long")
    new_df = spark.createDataFrame(new, "media_id long, fmt string, ahash long")

    name = "ahash_store_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    ahash_store_append(
        hist_df.filter("media_id <= 6"), name, path=str(tmp_path / "store")
    )
    ahash_store_append(hist_df.filter("media_id > 6"), name)
    assert spark.table(name).count() == 12 * 8

    pairs = incremental_ahash_pairs(new_df, name, max_hamming=5)
    got = {(r["media_a"], r["media_b"]): (r["hamming"], r["src"])
           for r in pairs.collect()}

    hmap = dict([(m, a) for m, _, a in hist] + [(m, a) for m, _, a in new
                                                if a is not None])

    def hd(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    want = {}
    for m, _, a in new:
        if a is None:
            continue
        for hm, ha in hmap.items():
            if hm == m or (hm >= 100 and hm <= m):
                continue
            d = hd(a, ha)
            if d <= 5:
                key = (m, hm) if hm < 100 else (min(m, hm), max(m, hm))
                want[key] = (d, "store" if hm < 100 else "batch")
    assert got == want and any(s == "store" for _, s in got.values())
    assert not any(200 in k for k in got)

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_media_dedup_stream_cross_batch(spark, tmp_path):
    """Streaming image dedup end-to-end: batch 1 plants an in-batch
    near-copy (dropped, min-id survives); batch 2 replants a copy of a
    batch-1 survivor (dropped against the STORE) plus a fresh image and
    an undecodable payload (both accepted — NULL hashes never collide).
    Restart-with-new-files uses the same checkpoint (only new files
    process)."""
    import os

    from hypermap_etl_spark.streaming.curate import start_media_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    name = "media_dedup_stream_store"
    spark.sql(f"DROP TABLE IF EXISTS {name}")

    def img(mid, pattern, w=8, h=8):
        # aHash is brightness-invariant by design, so distinct images
        # must differ STRUCTURALLY, not by a constant offset
        pats = {
            "rampx": lambda i: (i % w) * 32 % 256,
            "rampy": lambda i: (i // w) * 32 % 256,
            "checker": lambda i: 255 * ((i % w + i // w) % 2),
            "stripes": lambda i: 255 * ((i % w) // 2 % 2),
        }
        px = bytes(pats[pattern](i) for i in range(w * h))
        return (mid, "image", bytearray(encode_png(w, h, px, color_type=0)),
                "image/png", (None, None, None, None))

    progress = []
    b1 = _media_rows(spark, [img(1, "rampx"), img(2, "rampx"), img(3, "rampy")])
    b1.write.mode("append").parquet(src)
    q = start_media_dedup_stream(
        spark, src, out, ckpt, name, store_path=str(tmp_path / "store"),
        on_progress=progress.append,
    )
    q.awaitTermination(120)
    got1 = {r["media_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3}  # 2 is the in-batch copy of 1
    assert progress[-1]["neardup_dropped"] == 1

    b2 = _media_rows(
        spark,
        [img(4, "rampx"),  # copy of stored 1 → dropped vs store
         img(5, "checker"),  # fresh
         (6, "image", bytearray(b"junk"), "x", (None, None, None, None))],
    )
    b2.write.mode("append").parquet(src)
    q2 = start_media_dedup_stream(
        spark, src, out, ckpt, name, store_path=str(tmp_path / "store"),
        on_progress=progress.append,
    )
    q2.awaitTermination(120)
    got2 = {r["media_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 3, 5, 6}
    assert progress[-1]["accepted"] == 2 and progress[-1]["hashed"] == 2
    # the store indexes only decodable survivors: (1,3,5) x 8 chunks
    assert spark.table(name).count() == 3 * 8
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _bmff(*top_boxes):
    ftyp = struct.pack(">I", 24) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00" + b"isomiso2"
    return ftyp + b"".join(top_boxes)


def _box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _stbl_video(sizes=None, const=0, n=0, sync=None, stts=None, timescale=1000):
    if sizes is not None:
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, len(sizes))
                    + b"".join(struct.pack(">I", s) for s in sizes))
    else:
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", const, n))
    inner = stsz
    if sync is not None:
        inner += _box(b"stss", b"\x00" * 4 + struct.pack(">I", len(sync))
                      + b"".join(struct.pack(">I", s) for s in sync))
    if stts is not None:
        inner += _box(b"stts", b"\x00" * 4 + struct.pack(">I", len(stts))
                      + b"".join(struct.pack(">II", c, d) for c, d in stts))
    mdhd = _box(b"mdhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, 0)
                + b"\x00" * 4)
    stbl = _box(b"stbl", inner)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    return _box(b"moov", _box(b"trak", mdia))


def test_parse_video_samples_tables():
    from hypermap_etl_spark.operators.multimodal import parse_video_samples

    p = _bmff(_stbl_video(sizes=[100, 50, 200, 50], sync=[1, 3],
                          stts=[(4, 250)]))
    got = parse_video_samples(p)
    assert got == {
        "fmt": "mp4", "n_samples": 4, "n_keyframes": 2,
        "total_sample_bytes": 400, "max_sample_bytes": 200,
        "duration_ms": 1000,
    }
    # constant-size samples; ABSENT stss ⇒ every sample is sync (spec)
    got2 = parse_video_samples(_bmff(_stbl_video(const=77, n=5)))
    assert got2["n_samples"] == 5 and got2["n_keyframes"] == 5
    assert got2["total_sample_bytes"] == 385 and got2["duration_ms"] is None
    # no sample table → None; garbage → None; truncated → never raises
    assert parse_video_samples(_bmff(_box(b"moov", b""))) is None
    assert parse_video_samples(b"junk" * 10) is None
    for cut in range(0, len(p), 7):
        r = parse_video_samples(p[:cut])
        assert r is None or isinstance(r, dict)


def test_video_frame_index_operator(spark):
    from hypermap_etl_spark.operators.multimodal import video_frame_index

    vid = _bmff(_stbl_video(sizes=[100, 50, 200, 50], sync=[1, 3],
                            stts=[(4, 250)]))
    rows = [
        (1, "video", bytearray(vid), "video/mp4", (None, None, None, None)),
        (2, "video", bytearray(b"not video"), "x", (None, None, None, None)),
    ]
    out = {
        r["media_id"]: r.asDict()
        for r in video_frame_index(_media_rows(spark, rows)).collect()
    }
    assert out[1]["n_samples"] == 4 and out[1]["keyframe_ratio"] == 0.5
    assert out[1]["max_sample_bytes"] == 200 and out[1]["duration_ms"] == 1000
    assert out[2]["fmt"] is None and out[2]["n_samples"] is None


def test_stats_operators_survive_hostile_headers(spark):
    """Container fields are attacker-declared: dims/rates that overflow
    int32 (or products that overflow int64) must come back NULL in
    non-strict mode — never a pd.array cast error killing the Arrow
    batch (code-review regression)."""
    # PNG IHDR declaring width 2^32-1 at an undecodable depth (16)
    png_evil = _png(0xFFFFFFFF, 2, 16, 0, b"")
    # structurally valid PCM WAV whose declared rate is 0x80000000
    # (patched in place: rate LE32 lives at offset 24 of the canonical
    # layout; byte_rate would overflow the builder's struct pack)
    wav_evil = bytearray(_wav(8000, 1, 16, [1, 2, 3, 4]))
    wav_evil[24:28] = struct.pack("<I", 0x80000000)
    wav_evil = bytes(wav_evil)
    # stsz const-size path: declared count 2^32-1 needs no entry bytes
    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 1, 0xFFFFFFFF))
    stts = _box(b"stts", b"\x00" * 4 + struct.pack(">I", 1)
                + struct.pack(">II", 0xFFFFFFFF, 0xFFFFFFFF))
    mdhd = _box(b"mdhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1, 0)
                + b"\x00" * 4)
    mp4_evil = _bmff(_box(b"moov", _box(b"trak", _box(
        b"mdia", mdhd + _box(b"minf", _box(b"stbl", stsz + stts))))))

    rows = [
        (1, "image", bytearray(png_evil), "x", (None, None, None, None)),
        (2, "audio", bytearray(wav_evil), "x", (None, None, None, None)),
        (3, "video", bytearray(mp4_evil), "x", (None, None, None, None)),
    ]
    df = _media_rows(spark, rows)

    from hypermap_etl_spark.operators.multimodal import (
        audio_sample_stats,
        audio_spectral_stats,
        decode_audio,
        decode_media,
        pixel_stats,
        video_frame_index,
    )

    px = {r["media_id"]: r.asDict() for r in pixel_stats(df).collect()}
    assert px[1]["fmt"] == "png" and px[1]["width"] is None

    dm = {r["media_id"]: r.asDict() for r in decode_media(df).collect()}
    assert dm[1]["width"] is None  # not a negative/int32-wrapped lie

    au = {r["media_id"]: r.asDict() for r in audio_sample_stats(df).collect()}
    assert au[2]["fmt"] == "wav" and au[2]["sample_rate"] is None
    assert au[2]["n_frames"] == 4  # payload-bounded facts stay real

    sp = {r["media_id"]: r.asDict()
          for r in audio_spectral_stats(df).collect()}
    assert sp[2]["sample_rate"] is None

    da = {r["media_id"]: r.asDict() for r in decode_audio(df).collect()}
    assert da[2]["fmt"] == "wav" and da[2]["sample_rate"] is None

    vf = {r["media_id"]: r.asDict() for r in video_frame_index(df).collect()}
    assert vf[3]["fmt"] == "mp4" and vf[3]["n_samples"] is None
    assert vf[3]["duration_ms"] is None  # count*delta/timescale > int64


def test_png_decoder_caps_zlib_bombs():
    """A small DEFLATE bomb must be rejected by the expected-size cap,
    not inflated to completion (code-review regression): inflation
    stops at geometry+1 bytes, and gigapixel declared dims are out of
    the per-item decoder's scope entirely."""
    import time

    # 2x2 gray geometry (expected 6 raw bytes) but ~1 MB of zeros
    bomb = zlib.compress(b"\x00" * 1_000_000)
    t0 = time.monotonic()
    assert decode_png_pixels(_png(2, 2, 8, 0, b"", )[:33]  # sig+IHDR only
                             + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
                             ) is None
    assert time.monotonic() - t0 < 2.0
    # gigapixel declared dims: rejected before any allocation
    huge = _png(40000, 40000, 8, 2, b"")
    assert decode_png_pixels(huge) is None


def test_media_dedup_stream_replay_idempotent(spark, tmp_path):
    """Crash-redelivery contract: wiping the streaming checkpoint (so
    EVERY file redelivers) must not change the accepted lake or the
    store — the accepted output is the state (code-review regression:
    a replayed survivor used to meet its own store row, skip the a!=b
    guard, and be accepted twice)."""
    import os

    from hypermap_etl_spark.streaming.curate import start_media_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    name = "media_dedup_replay_store"
    spark.sql(f"DROP TABLE IF EXISTS {name}")

    px = bytes((i * 3) % 256 for i in range(64))
    rows = [(1, "image", bytearray(encode_png(8, 8, px, color_type=0)),
             "image/png", (None, None, None, None))]
    _media_rows(spark, rows).write.mode("append").parquet(src)

    progress = []
    q = start_media_dedup_stream(
        spark, src, out, ckpt, name, store_path=str(tmp_path / "st"),
        on_progress=progress.append,
    )
    q.awaitTermination(120)
    assert {r["media_id"] for r in spark.read.parquet(out).collect()} == {1}
    n_store = spark.table(name).count()

    # simulate the lost checkpoint: everything redelivers
    import shutil

    shutil.rmtree(ckpt)
    q2 = start_media_dedup_stream(
        spark, src, out, ckpt, name, store_path=str(tmp_path / "st"),
        on_progress=progress.append,
    )
    q2.awaitTermination(120)
    out_rows = spark.read.parquet(out).collect()
    assert [r["media_id"] for r in out_rows] == [1]  # no duplicate row
    assert spark.table(name).count() == n_store
    assert progress[-1]["replayed_skipped"] == 1
    assert progress[-1]["accepted"] == 0
    spark.sql(f"DROP TABLE IF EXISTS {name}")


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_incremental_ahash_fuzz_exactness(spark, data):
    """Property: for ANY hash population and ANY store/batch split,
    store-pairs ∪ batch-pairs == the exact hamming<=k relation between
    (batch x store) and (batch x batch) — blocking completeness and
    the src attribution hold under random structure, not just the
    planted fixture."""
    from hypermap_etl_spark.operators.multimodal import (
        incremental_ahash_pairs,
    )

    rng_bits = st.integers(0, (1 << 64) - 1)
    base = data.draw(rng_bits)
    n = data.draw(st.integers(4, 14))
    flips = st.integers(0, 63)
    sigs = []
    for i in range(n):
        v = base
        for b in data.draw(st.lists(flips, min_size=0, max_size=8)):
            v ^= 1 << b
        sigs.append(v)
    split = data.draw(st.integers(1, n - 1))
    k = data.draw(st.integers(0, 7))

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    store_rows = [(i, "png", signed(sigs[i])) for i in range(split)]
    batch_rows = [(100 + i, "png", signed(sigs[i])) for i in range(split, n)]
    schema = "media_id long, fmt string, ahash long"
    store_df = spark.createDataFrame(store_rows, schema)
    batch_df = spark.createDataFrame(batch_rows, schema)
    from hypermap_etl_spark.operators.multimodal import ahash_chunk_buckets

    got = {
        (r["media_a"], r["media_b"], r["src"])
        for r in incremental_ahash_pairs(
            batch_df, ahash_chunk_buckets(store_df), max_hamming=k
        ).collect()
    }
    want = set()
    for bi in range(split, n):
        for si in range(split):
            if bin(sigs[bi] ^ sigs[si]).count("1") <= k:
                want.add((100 + bi, si, "store"))
        for bj in range(bi + 1, n):
            if bin(sigs[bi] ^ sigs[bj]).count("1") <= k:
                want.add((100 + bi, 100 + bj, "batch"))
    assert got == want


def test_media_dedup_stream_lake_holds_full_media_rows(spark, tmp_path):
    """ADVICE r10: out_path is the curated media LAKE — survivors'
    full MEDIA_SCHEMA rows (payload included), not signature rows; a
    downstream consumer reads it directly without re-joining the
    source. Signatures live only in the store table."""
    import os

    from hypermap_etl_spark.streaming.curate import start_media_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    name = "media_dedup_lake_store"
    spark.sql(f"DROP TABLE IF EXISTS {name}")

    px = bytes((i * 7) % 256 for i in range(64))
    png = encode_png(8, 8, px, color_type=0)
    rows = [(1, "image", bytearray(png), "image/png", (8, 8, None, None))]
    _media_rows(spark, rows).write.mode("append").parquet(src)
    q = start_media_dedup_stream(
        spark, src, out, ckpt, name, store_path=str(tmp_path / "st")
    )
    q.awaitTermination(120)
    lake = spark.read.parquet(out)
    assert set(lake.columns) == {"media_id", "kind", "payload", "mime", "meta"}
    r = lake.collect()[0]
    assert r["media_id"] == 1 and r["kind"] == "image"
    assert bytes(r["payload"]) == png and r["mime"] == "image/png"
    # signatures are in the store, not the lake
    assert set(spark.table(name).columns) == {"media_id", "ahash", "bh"}
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_entropy_coded_scope_decision_pinned(spark):
    """PERMANENT SCOPE DECISION (VERDICT r9 task 7, recorded in
    README): JPEG/GIF pixel planes and MP3/MP4 coded frames stay out
    of this stdlib-only engine — entropy decoding is codec-library
    territory. The contract this test pins, for every entropy-coded
    format at once: (1) headers still parse for real, (2) every
    content-derived column is NULL — never fabricated, (3)
    strict=True raises NotImplementedError. Plugging a codec library
    in happens at the decode_png_pixels/decode_wav_samples seams."""
    import pytest

    from hypermap_etl_spark.operators.multimodal import (
        audio_sample_stats,
        image_ahash,
        pixel_stats,
    )

    jpeg = (
        b"\xff\xd8\xff\xc0\x00\x11\x08" + struct.pack(">HH", 45, 123)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 6
    mp3 = b"\xff\xfb\x90\x00" + b"\x00" * 64  # MPEG1 L3 128k 44100
    rows = [
        (1, "image", bytearray(jpeg), "image/jpeg", (None,) * 4),
        (2, "image", bytearray(gif), "image/gif", (None,) * 4),
    ]
    out = {r["media_id"]: r for r in pixel_stats(_media_rows(spark, rows)).collect()}
    # headers real, pixel columns NULL on BOTH entropy-coded formats
    assert out[1]["fmt"] == "jpeg" and out[2]["fmt"] == "gif"
    for mid in (1, 2):
        for c in ("px_count", "px_sum", "px_min", "px_max"):
            assert out[mid][c] is None, (mid, c)
    ah = {r["media_id"]: r for r in image_ahash(_media_rows(spark, rows)).collect()}
    assert ah[1]["ahash"] is None and ah[2]["ahash"] is None
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        pixel_stats(_media_rows(spark, rows), strict=True).collect()
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        image_ahash(_media_rows(spark, rows), strict=True).collect()

    arows = [(3, "audio", bytearray(mp3), "audio/mpeg", (None,) * 4)]
    aout = audio_sample_stats(_media_rows(spark, arows)).collect()[0]
    assert aout["fmt"] == "mp3"
    for c in ("n_frames", "peak_abs", "abs_sum", "sq_sum", "zero_cross"):
        assert aout[c] is None, c
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        audio_sample_stats(_media_rows(spark, arows), strict=True).collect()


def test_png_unfilter_vector_path_roundtrip():
    """The numpy unfilter path (strides >= _VEC_MIN_STRIDE) must
    reconstruct the exact original plane for every color type and
    every filter, including mixed per-row filters — the r10 vectorized
    rewrite may never diverge from the spec inversion the scalar path
    implements (the small-image property test above exercises that
    one; this pins the large-stride branch it cannot reach)."""
    import random

    from hypermap_etl_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _VEC_MIN_STRIDE,
    )

    pal = bytes(v for j in range(256) for v in (j, 255 - j, (2 * j) % 256))
    rng = random.Random(20261)
    for ct in (0, 2, 3, 4, 6):
        ch = _PNG_CHANNELS[ct]
        # wide enough that stride = w*ch clears the vector threshold
        w = (_VEC_MIN_STRIDE // ch) + 3
        h = 11
        assert w * ch >= _VEC_MIN_STRIDE
        for fpat in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3]):
            raw = bytes(rng.randrange(256) for _ in range(w * h * ch))
            filters = [fpat[r % len(fpat)] for r in range(h)]
            d = decode_png_pixels(
                encode_png(
                    w, h, raw, color_type=ct,
                    palette=pal if ct == 3 else None,
                    row_filters=filters,
                )
            )
            assert d is not None
            if ct == 3:
                expect = b"".join(pal[i * 3:i * 3 + 3] for i in raw)
                assert d["channels"] == 3
            else:
                expect = raw
                assert d["channels"] == _PNG_CHANNELS[ct]
            assert d["pixels"] == expect, (ct, fpat)
            assert (d["width"], d["height"]) == (w, h)
