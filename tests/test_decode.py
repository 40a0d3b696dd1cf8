"""P1-P7 decode semantics against hand-built raw-log fixtures, including
the golden sanity histogram {Note: 8, Transfer: 4, Mint: 2} from
/root/reference/docs/SANITY_CHECKS.md:9-11.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hypermap_etl_spark.constants import CONTRACT_ADDRESS, TOPIC0
from hypermap_etl_spark.operators.decode import (
    decode_raw_logs,
    parse_raw_logs,
    skipped_log_count,
)
from hypermap_etl_spark.schemas import RAW_LOG_SCHEMA
from tests.helpers import addr, h


def _pad_addr(a: str) -> str:
    return "0x" + a[2:].rjust(64, "0")


def _abi_bytes(payload_hex: str) -> str:
    ln = len(payload_hex) // 2
    words = -(-len(payload_hex) // 64) if payload_hex else 0
    return (
        format(32, "064x")
        + format(ln, "064x")
        + payload_hex.ljust(words * 64, "0")
    )


def _abi_two(p1: str, p2: str) -> str:
    w1 = -(-len(p1) // 64) if p1 else 0
    off2 = 64 + 32 + 32 * w1
    ln1, ln2 = len(p1) // 2, len(p2) // 2
    w2 = -(-len(p2) // 64) if p2 else 0
    return (
        format(64, "064x")
        + format(off2, "064x")
        + format(ln1, "064x")
        + p1.ljust(w1 * 64, "0")
        + format(ln2, "064x")
        + p2.ljust(w2 * 64, "0")
    )


def raw(block, log_idx, topics, data="0x", address=CONTRACT_ADDRESS):
    return (
        address,
        block,
        "0x" + "ee" * 32,
        "0x" + format(block * 1000 + log_idx, "064x"),
        0,
        log_idx,
        topics,
        data,
    )


def _golden_rows():
    rows = []
    # 8 Notes, 4 Transfers, 2 Mints in blocks 27,430,000-27,434,999
    for i in range(8):
        rows.append(
            raw(27_430_000 + i, i,
                [TOPIC0["Note"], h(1), h(40 + i), h(80 + i)],
                "0x" + _abi_two("6e6f7465", "c0ffee"))  # label 'note'
        )
    for i in range(4):
        rows.append(
            raw(27_431_000 + i, i,
                [TOPIC0["Transfer"], _pad_addr(addr(1)), _pad_addr(addr(2)), h(200 + i)])
        )
    for i in range(2):
        rows.append(
            raw(27_432_000 + i, i,
                [TOPIC0["Mint"], h(1), h(300 + i), h(400 + i)],
                "0x" + _abi_bytes("6d696e742d6c6162656c"))  # 'mint-label'
        )
    # undecodable: foreign topic0 on our contract + foreign address
    rows.append(raw(27_433_000, 0, ["0x" + "12" * 32]))
    rows.append(raw(27_433_001, 0, [TOPIC0["Note"], h(1), h(2), h(3)],
                    "0x" + _abi_two("78", "79"),
                    address="0x00000000000000000000000000000000deadbeef"))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, RAW_LOG_SCHEMA)


def test_golden_histogram(spark):
    """The reference's golden sanity check, decoded by our operator."""
    events = parse_raw_logs(_df(spark, _golden_rows()))
    hist = {r["eventType"]: r["count"] for r in events.groupBy("eventType").count().collect()}
    assert hist == {"Note": 8, "Transfer": 4, "Mint": 2}
    assert skipped_log_count(_df(spark, _golden_rows())) == 2


def test_decoded_fields(spark):
    events = {
        (r["eventType"], r["logIndex"]): r.asDict()
        for r in parse_raw_logs(_df(spark, _golden_rows())).collect()
    }
    note = events[("Note", 0)]
    assert note["label"] == "note"
    assert note["data"] == "0xc0ffee"
    assert note["parenthash"] == h(1)
    assert note["notehash"] == h(40)
    assert note["timestamp"] is None

    tr = events[("Transfer", 1)]
    assert tr["from"] == addr(1)
    assert tr["to"] == addr(2)
    assert tr["id"] == h(201)

    mint = events[("Mint", 0)]
    assert mint["label"] == "mint-label"
    assert mint["childhash"] == h(300)
    assert mint["event_id"].endswith("_0")


def test_empty_label_and_all_types(spark):
    rows = [
        raw(1, 0, [TOPIC0["Mint"], h(1), h(2), h(3)], "0x" + _abi_bytes("")),
        raw(1, 1, [TOPIC0["Gene"], h(5), _pad_addr(addr(7))]),
        raw(1, 2, [TOPIC0["Zero"], _pad_addr(addr(8))]),
        raw(1, 3, [TOPIC0["Upgraded"], _pad_addr(addr(9))]),
        raw(1, 4, [TOPIC0["Fact"], h(1), h(6), h(3)], "0x" + _abi_two("6b", "")),
    ]
    out = {r["eventType"]: r.asDict() for r in parse_raw_logs(_df(spark, rows)).collect()}
    assert out["Mint"]["label"] == ""  # '' fallback (events.ts:134)
    assert out["Gene"]["entry"] == h(5) and out["Gene"]["gene"] == addr(7)
    assert out["Zero"]["zeroTba"] == addr(8)
    assert out["Upgraded"]["implementation"] == addr(9)
    assert out["Fact"]["label"] == "k" and out["Fact"]["data"] == "0x"


def test_null_flagging(spark):
    df = decode_raw_logs(_df(spark, _golden_rows()))
    assert df.filter(F.col("eventType").isNull()).count() == 2
    assert df.count() == 16


def test_jsonl_source_roundtrip(spark, tmp_path):
    """S1 JSONL path: an eth_getLogs-style JSONL dump read through
    read_raw_logs (declared schema, no inference) decodes identically
    to the parquet path, and predicates still prune."""
    from hypermap_etl_spark.sources.raw_logs import read_raw_logs

    src = _df(spark, _golden_rows())
    jdir = str(tmp_path / "logs.jsonl")
    src.write.mode("overwrite").json(jdir)
    back = read_raw_logs(spark, jdir)  # format inferred from extension
    # JSON scans mark every field (and array element) nullable; names
    # and type names must match the declared schema
    assert [(f.name, f.dataType.typeName()) for f in back.schema.fields] == [
        (f.name, f.dataType.typeName()) for f in RAW_LOG_SCHEMA.fields
    ]
    got = {
        r["eventType"]: r["cnt"]
        for r in parse_raw_logs(back).groupBy("eventType")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == {"Note": 8, "Transfer": 4, "Mint": 2}
    # explicit fmt + block-range predicate
    pruned = read_raw_logs(spark, jdir, fmt="json", from_block=10**9)
    assert pruned.count() == 0
