"""T1-T5 streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.operators.multimodal import (
    decode_media,
    media_feature_topk,
    sample_frames,
)
from hypermap_etl_spark.schemas import MEDIA_SCHEMA
from hypermap_etl_spark.sources.raw_logs import build_raw_logs
from hypermap_etl_spark.streaming.scan import (
    high_water_mark,
    start_ingest_stream,
    windowed_event_counts,
)
from tests.helpers import ev, events_df, h


def _raw_chunk(spark, start, n):
    rows = [
        ev(eventType="Mint", blockNumber=start + i, logIndex=0, parenthash=h(1),
           childhash=h(1000 + start + i), labelhash=h(2), label=f"b{start + i}",
           transactionHash="0x" + format(start + i, "064x"))
        for i in range(n)
    ]
    return build_raw_logs(events_df(spark, rows))


def test_streaming_ingest_catchup_and_resume(spark):
    base = tempfile.mkdtemp()
    src, tbl, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    os.makedirs(src)

    # chunk 1 lands; catch-up with AvailableNow (T1 backfill mode)
    _raw_chunk(spark, 100, 5).write.mode("append").parquet(src)
    q = start_ingest_stream(spark, src, tbl, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(tbl).count() == 5
    assert high_water_mark(spark, tbl) == 104

    # chunk 2 (+ a duplicate re-delivery of chunk 1) lands; resume from
    # checkpoint → only new files processed, dups absorbed by MERGE (T3)
    _raw_chunk(spark, 100, 5).write.mode("append").parquet(src)
    _raw_chunk(spark, 105, 3).write.mode("append").parquet(src)
    q2 = start_ingest_stream(spark, src, tbl, ckpt)
    q2.awaitTermination(120)
    tblr = spark.read.parquet(tbl)
    assert tblr.count() == 8
    assert tblr.select("event_id").distinct().count() == 8
    assert high_water_mark(spark, tbl) == 107


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(i, f"2024-01-01 00:{i % 50:02d}:00", "click" if i % 2 else "view") for i in range(40)],
        "event_id long, ts_str string, event_type string",
    ).select(F.col("event_id"), F.to_timestamp("ts_str").alias("ts"), "event_type").write.parquet(src)

    stream = spark.readStream.schema("event_id long, ts timestamp, event_type string").parquet(src)
    agg = windowed_event_counts(stream, window="10 minutes", watermark="20 minutes")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed
    res = spark.read.parquet(out)
    assert set(res.columns) == {"window_start", "window_end", "event_type", "n"}
    closed = res.filter(F.col("event_type") == "click").agg(F.sum("n")).collect()[0][0]
    assert closed and closed > 0


def _media_df(spark):
    rows = [
        (1, "image", bytearray(b"img-bytes-1"), "image/png", (64, 48, None, None)),
        (2, "image", bytearray(b"img-bytes-2"), "image/png", (32, 32, None, None)),
        (3, "video", bytearray(b"vid-bytes"), "video/mp4", (640, 480, 9000, None)),
        (4, "audio", bytearray(b"aud-bytes"), "audio/wav", (None, None, 4000, 16000)),
        (5, "image", None, "image/png", (8, 8, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_fake_and_strict(spark):
    out = decode_media(_media_df(spark)).collect()
    d = {r["media_id"]: r.asDict() for r in out}
    assert d[1]["width"] == 64 and d[1]["n_bytes"] == 11
    assert len(d[1]["feat"]) == 16 and all(0 <= x < 1 for x in d[1]["feat"])
    assert d[5]["n_bytes"] == 0 and d[5]["feat"] == [0.0] * 16
    # determinism
    out2 = {r["media_id"]: r["feat"] for r in decode_media(_media_df(spark)).collect()}
    assert out2[2] == d[2]["feat"]

    import pytest

    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_media(_media_df(spark), strict=True).collect()


def test_sample_frames(spark):
    frames = sample_frames(_media_df(spark), every_n=2, max_frames=4).collect()
    assert {r["media_id"] for r in frames} == {3}
    assert [r["frame_idx"] for r in frames] == list(range(4))
    assert len({r["frame_md5"] for r in frames}) == 4


def test_media_feature_topk_composes(spark):
    decoded = decode_media(_media_df(spark))
    topk = media_feature_topk(decoded, k=2, allow_full_scan=True)
    assert topk.groupBy("query_id").count().filter(F.col("count") != 2).count() == 0


def test_brute_force_topk_guards_accidental_full_scan(spark):
    """Unfiltered top-k is an N² scan — must be an explicit opt-in."""
    import pytest

    from hypermap_etl_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="full N x N"):
        brute_force_topk(emb)
    with pytest.raises(ValueError, match="full N x N"):
        media_feature_topk(emb.select(F.col("vec_id").alias("media_id"), F.col("embedding").alias("feat")))
    assert brute_force_topk(emb, k=1, allow_full_scan=True).count() == 2


def test_streaming_exact_dedup_drops_in_window_duplicates(spark):
    """dropDuplicatesWithinWatermark keeps exactly ONE arrival per
    content key within the lateness bound (which one is arrival-order
    dependent inside a micro-batch); distinct docs all pass."""
    import tempfile as tf

    from hypermap_etl_spark.streaming.dedup import dedup_stream_exact

    base = tf.mkdtemp()
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    rows = [
        (0, "2024-01-01 00:00:00", "same text"),
        (1, "2024-01-01 00:00:30", "same text"),       # dup within window
        (2, "2024-01-01 00:01:00", "different text"),
        (3, "2024-01-01 00:02:00", "same text"),       # still within 10 min
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts string, text string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.write.mode("append").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        dedup_stream_exact(stream, "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert len(got) == 2 and 2 in got
    assert sum(1 for d in got if d in (0, 1, 3)) == 1


def test_streaming_keyed_dedup_exact_across_batches(spark):
    """dropDuplicates on event keys is exact across micro-batches of a
    finite catch-up (bounded key domain)."""
    import tempfile as tf

    from hypermap_etl_spark.streaming.dedup import dedup_stream_keyed

    base = tf.mkdtemp()
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b"), (3, "c")], "k long, v string")
    df1.write.mode("append").parquet(src)
    df2.write.mode("append").parquet(src)
    stream = spark.readStream.schema(df1.schema).parquet(src)
    q = (
        dedup_stream_keyed(stream, ["k"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_windowed_distinct_users_sketch_state(spark, tmp_path):
    """HLL++-backed per-window distinct users: sketch-sized streaming
    state, exact at small cardinalities, dup user ids inside a window
    collapse."""
    from hypermap_etl_spark.streaming.scan import windowed_distinct_users

    src = str(tmp_path / "ev")
    # two closed 10-min windows: 00:00-00:10 (users 0..9, each twice)
    # and 00:10-00:20 (users 0..4); a late 00:59 row keeps the
    # watermark open past both
    rows = (
        [(i, f"2024-01-01 00:0{i % 10}:00", i % 10) for i in range(20)]
        + [(100 + i, f"2024-01-01 00:1{i}:00", i) for i in range(5)]
        + [(999, "2024-01-01 00:59:00", 7)]
    )
    spark.createDataFrame(
        rows, "event_id long, ts_str string, user_id long"
    ).select(
        "event_id", F.to_timestamp("ts_str").alias("ts"), "user_id"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long"
    ).parquet(src)
    agg = windowed_distinct_users(stream, window="10 minutes", watermark="5 minutes")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = {
        r["window_start"].minute: (r["approx_users"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # HLL++ rsd default 5%: exact at these cardinalities
    assert res[0] == (10, 20) and res[10] == (5, 5)


def test_parse_image_header_formats():
    """Real stdlib header parsing: PNG IHDR (BE32), JPEG SOFn behind an
    APP0/DQT marker walk (BE16, height-first), GIF screen descriptor
    (LE16); garbage/truncated/None → None, never an exception."""
    import struct

    from hypermap_etl_spark.operators.multimodal import parse_image_header

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + bytes([8, 6, 0, 0, 0]) + b"\x00" * 4
    )
    assert parse_image_header(png) == {"fmt": "png", "width": 640, "height": 480}
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"trailer"
    assert parse_image_header(gif) == {"fmt": "gif", "width": 320, "height": 200}
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 1080, 1920) + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    jpg = b"\xff\xd8" + app0 + dqt + sof0 + b"scan-data"
    assert parse_image_header(jpg) == {"fmt": "jpeg", "width": 1920, "height": 1080}
    # progressive (SOF2) behind the same walk
    sof2 = (
        b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 7, 9) + b"\x03" + bytes(9)
    )
    assert parse_image_header(b"\xff\xd8" + app0 + sof2) == {
        "fmt": "jpeg", "width": 9, "height": 7,
    }
    # DHT (0xC4) is a table, not a frame — must be skipped, not parsed
    dht = b"\xff\xc4" + struct.pack(">H", 5) + bytes(3)
    assert parse_image_header(b"\xff\xd8" + dht + sof0) == {
        "fmt": "jpeg", "width": 1920, "height": 1080,
    }
    assert parse_image_header(b"hello world bytes") is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\nxx") is None
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00") is None


def test_decode_media_parses_header_over_lying_metadata(spark):
    """decode_media must take dims from the BYTES when the payload is a
    real container, even when metadata disagrees — and fall back to
    metadata only for unrecognized payloads."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 123, 45) + bytes([8, 6, 0, 0, 0]) + b"\x00" * 4
    ) + b"body"
    rows = [
        (1, "image", bytearray(png), "image/png", (9999, 9999, None, None)),
        (2, "image", bytearray(b"not an image"), "application/octet-stream",
         (77, 88, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "png" and out[1]["width"] == 123 and out[1]["height"] == 45
    assert out[2]["fmt"] is None and out[2]["width"] == 77 and out[2]["height"] == 88


def _wav_bytes(rate=22050, channels=2, data=b"abcdef", extra_chunk=False):
    byte_rate = rate * channels * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    pre = b""
    if extra_chunk:  # odd-sized chunk before fmt: exercises word align
        pre = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    body = b"WAVE" + pre + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _mp3_bytes(br_idx=9, sr_idx=0, mono=True, body=b"x" * 100, id3=0):
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2),
                 0xC0 if mono else 0x00])
    pre = b""
    if id3:
        pre = (b"ID3" + bytes([3, 0, 0])
               + bytes([(id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F,
                        (id3 >> 7) & 0x7F, id3 & 0x7F]) + b"\x00" * id3)
    return pre + hdr + body


def test_parse_audio_header_wav():
    from hypermap_etl_spark.operators.multimodal import parse_audio_header

    got = parse_audio_header(_wav_bytes(rate=8000, channels=1, data=b"z" * 4000))
    assert got == {"fmt": "wav", "sample_rate": 8000, "channels": 1,
                   "duration_ms": 4000 * 1000 // (8000 * 1 * 2)}
    # chunk walk skips unknown odd-sized chunks with word alignment
    got = parse_audio_header(_wav_bytes(rate=44100, channels=2,
                                        data=b"q" * 17, extra_chunk=True))
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["duration_ms"] == 17 * 1000 // (44100 * 2 * 2)


def test_parse_audio_header_mp3_and_id3_skip():
    from hypermap_etl_spark.operators.multimodal import parse_audio_header

    # V1 Layer III, idx 9 = 128 kbps, sr_idx 0 = 44100, mono
    got = parse_audio_header(_mp3_bytes(br_idx=9, sr_idx=0, mono=True,
                                        body=b"x" * 1596))
    assert got == {"fmt": "mp3", "sample_rate": 44100, "channels": 1,
                   "duration_ms": 1600 * 8 // 128}
    # stereo + different indexes, behind an ID3v2 tag (tag bytes are
    # NOT audio: duration counts from the frame header)
    got = parse_audio_header(_mp3_bytes(br_idx=11, sr_idx=1, mono=False,
                                        body=b"y" * 96, id3=40))
    assert got == {"fmt": "mp3", "sample_rate": 48000, "channels": 2,
                   "duration_ms": 100 * 8 // 192}


def test_parse_audio_header_rejects_garbage():
    from hypermap_etl_spark.operators.multimodal import parse_audio_header

    assert parse_audio_header(None) is None
    assert parse_audio_header(b"") is None
    assert parse_audio_header(b"RIFFxxxxWAV?" + b"\x00" * 40) is None
    assert parse_audio_header(b"RIFF\x04\x00\x00\x00WAVE") is None  # no fmt
    # reserved version bits / bad bitrate index / bad sr index
    assert parse_audio_header(bytes([0xFF, 0xEB, 0x90, 0xC0]) + b"x" * 50) is None
    assert parse_audio_header(bytes([0xFF, 0xFB, 0xF0, 0xC0]) + b"x" * 50) is None
    assert parse_audio_header(bytes([0xFF, 0xFB, 0x9C, 0xC0]) + b"x" * 50) is None
    # ID3 with a non-syncsafe size byte is not a valid tag
    assert parse_audio_header(b"ID3\x03\x00\x00\x00\x00\x00\x80" + b"x" * 50) is None
    assert parse_audio_header(b"plain text, no container") is None


def test_decode_audio_parses_header_over_lying_metadata(spark):
    from hypermap_etl_spark.operators.multimodal import decode_audio

    rows = [
        (1, "audio", bytearray(_wav_bytes(rate=8000, channels=1,
                                          data=b"z" * 800)),
         "audio/wav", (None, None, 9999, 9999)),
        (2, "audio", bytearray(_mp3_bytes(br_idx=9, sr_idx=2, mono=False,
                                          body=b"b" * 60)),
         "audio/mpeg", (None, None, 9999, 9999)),
        # headerless: metadata fallback (channels unknowable)
        (3, "audio", bytearray(b"not a container"), "audio/x",
         (None, None, 1234, 4242)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in decode_audio(df).collect()}
    assert got[1]["fmt"] == "wav" and got[1]["sample_rate"] == 8000
    assert got[1]["channels"] == 1 and got[1]["duration_ms"] == 50
    assert got[2]["fmt"] == "mp3" and got[2]["sample_rate"] == 32000
    assert got[2]["channels"] == 2
    assert got[3]["fmt"] is None and got[3]["sample_rate"] == 4242
    assert got[3]["duration_ms"] == 1234 and got[3]["channels"] is None
    # strict mode refuses the unparseable payload loudly
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_audio(df, strict=True).collect()


def _box(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _mp4_bytes(width=640, height=360, timescale=1000, duration=42_000,
               mvhd_v1=False, tkhd_v1=False, audio_track_first=False):
    if mvhd_v1:
        mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
                + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big"))
    else:
        mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
                + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big"))

    def tkhd(w, h, v1=False):
        if v1:
            body = b"\x01" + b"\x00" * 3 + b"\x00" * 32 + b"\x00" * 16 + b"\x00" * 36
        else:
            body = b"\x00" + b"\x00" * 3 + b"\x00" * 20 + b"\x00" * 16 + b"\x00" * 36
        body += (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
        return _box(b"tkhd", body)

    traks = b""
    if audio_track_first:  # zero presentation size, like real audio tracks
        traks += _box(b"trak", tkhd(0, 0))
    traks += _box(b"trak", tkhd(width, height, v1=tkhd_v1))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"fake-samples")


def test_parse_video_header_mp4():
    from hypermap_etl_spark.operators.multimodal import parse_video_header

    got = parse_video_header(_mp4_bytes())
    assert got == {"fmt": "mp4", "width": 640, "height": 360,
                   "duration_ms": 42_000}
    # version-1 boxes (64-bit times) and an audio track in front
    got = parse_video_header(
        _mp4_bytes(width=1920, height=1080, timescale=90_000,
                   duration=90_000 * 7 + 45_000, mvhd_v1=True, tkhd_v1=True,
                   audio_track_first=True)
    )
    assert got == {"fmt": "mp4", "width": 1920, "height": 1080,
                   "duration_ms": 7_500}
    # not a BMFF container / truncated
    assert parse_video_header(b"RIFFxxxxAVI LIST") is None
    assert parse_video_header(_mp4_bytes()[:10]) is None
    assert parse_video_header(None) is None
    # a box whose declared size overruns the payload stops the walk
    # instead of raising
    broken = bytearray(_mp4_bytes())
    # moov starts right after the 24-byte ftyp box; corrupt its size
    broken[24:28] = (2**30).to_bytes(4, "big")
    got = parse_video_header(bytes(broken))
    assert got == {"fmt": "mp4", "width": None, "height": None,
                   "duration_ms": None}


def test_decode_media_uses_mp4_dims_over_lying_metadata(spark):
    from hypermap_etl_spark.operators.multimodal import decode_media

    rows = [
        (7, "video", bytearray(_mp4_bytes(width=320, height=240)),
         "video/mp4", (9999, 9999, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(df).collect()[0]
    assert got["fmt"] == "mp4"
    assert got["width"] == 320 and got["height"] == 240


def test_doc_media_video_matches_oracle_locally(spark):
    """Local parity for the UNREGISTERED video gate (doc_media_video)
    — the r9 registration freeze allows only the verdict-demanded audio
    gate, so the video twin lands implementation-first with the same
    oracle comparison the driver would run; r10 registers it by adding
    one DOC_QUERIES line."""
    from hypermap_etl_spark.plans.doc_queries import (
        DOC_MEDIA_VIDEO_ORACLE,
        doc_media_video,
    )
    from tests.test_oracle_parity import SF_SMOKE, _duck, _rows_to_set

    sdf = doc_media_video(spark, SF_SMOKE)
    srows = sdf.collect()
    scols = sdf.columns
    con = _duck(SF_SMOKE)
    try:
        ores = con.execute(DOC_MEDIA_VIDEO_ORACLE)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    oset = _rows_to_set(ocols, orows)
    assert sset == oset
    # and the branches really exercised the parser: mp4 dims present
    by_branch = {r["media_id"] % 4: r for r in srows}
    for b in (0, 1, 2):
        assert by_branch[b]["fmt"] == "mp4"
    assert by_branch[3]["fmt"] is None


def test_parse_video_header_v1_mvhd_short_payload_yields_null_duration():
    """ADVICE r10: a version-1 mvhd with 20-31 payload bytes passes the
    outer >= 20 guard but can't hold the v1 timescale/duration fields;
    reading the 64-bit creation/modification times at the v0 offsets
    would fabricate a duration from a truncated/hostile header. The
    parser must leave duration_ms None instead."""
    from hypermap_etl_spark.operators.multimodal import parse_video_header

    # v1 mvhd truncated to 24 payload bytes: version byte + flags +
    # 20 junk bytes that would read as a huge 'duration' at v0 offsets
    short_mvhd = b"\x01" + b"\x00" * 3 + b"\xff" * 20
    moov = _box(b"moov", _box(b"mvhd", short_mvhd))
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    got = parse_video_header(ftyp + moov)
    assert got == {"fmt": "mp4", "width": None, "height": None,
                   "duration_ms": None}
    # the boundary case: exactly 32 payload bytes IS a complete v1 box
    full_mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
                 + (1000).to_bytes(4, "big") + (5000).to_bytes(8, "big"))
    got = parse_video_header(ftyp + _box(b"moov", _box(b"mvhd", full_mvhd)))
    assert got["duration_ms"] == 5000
