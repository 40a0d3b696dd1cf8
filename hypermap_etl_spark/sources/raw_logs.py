"""Raw-log source + ABI-encoding fixture builder.

``read_raw_logs`` is the S1/S2 scan path: parquet/json logs with the
contract-address and block-range predicates expressed declaratively so
Catalyst pushes them into the scan (the Spark analog of the reference
pushing address+range into eth_getLogs,
/root/reference/scripts/extract-events.ts:225-230).

``build_raw_logs`` is the inverse of operators/decode.py: it ABI-encodes
a decoded event table back into (topics, data) raw logs — entirely with
built-in column expressions. Used by tests and the driver-gate
decode-roundtrip query; doubles as the FIXTURES.md §1 generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hypermap_etl_spark.constants import CONTRACT_ADDRESS, TOPIC0


def read_raw_logs(
    spark,
    path: str,
    contract: str = CONTRACT_ADDRESS,
    from_block: int | None = None,
    to_block: int | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """S1: scan raw logs with pushed-down address/block-range predicates.

    ``fmt`` is 'parquet' (default) or 'json' — JSONL is what an
    eth_getLogs dump naturally lands as. The JSON read uses the
    declared RAW_LOG_SCHEMA (schema inference would scan the whole
    input once just to guess types — never at lake scale); malformed
    lines surface as nulls and fall out at the decode stage's
    skip-don't-fail filter rather than failing the scan.
    """
    if fmt is None:
        fmt = "json" if path.rstrip("/").endswith((".json", ".jsonl")) else "parquet"
    if fmt == "json":
        from hypermap_etl_spark.schemas import RAW_LOG_SCHEMA

        df = spark.read.schema(RAW_LOG_SCHEMA).json(path)
    else:
        df = spark.read.parquet(path)
    df = df.filter(F.lower(F.col("address")) == contract.lower())
    if from_block is not None:
        df = df.filter(F.col("blockNumber") >= from_block)
    if to_block is not None:
        df = df.filter(F.col("blockNumber") <= to_block)
    return df


# ------------------------------------------------------- ABI encoding ------

def _hex_body(col: Column) -> Column:
    return F.regexp_replace(col, r"^0x", "")


def _utf8_hex(col: Column) -> Column:
    """UTF-8 string → bare hex chars (lowercase)."""
    return F.lower(F.hex(F.encode(F.coalesce(col, F.lit("")), "UTF-8")))


def _uint_word(n: Column) -> Column:
    """Integer column → 64-char hex word."""
    return F.lpad(F.lower(F.conv(n.cast("string"), 10, 16)), 64, "0")


def _padded_bytes(hex_payload: Column) -> Column:
    """Right-pad a hex payload to a multiple of 64 hex chars ('' stays '')."""
    n_words = F.ceil(F.length(hex_payload) / F.lit(64.0)).cast("int")
    return F.rpad(hex_payload, (n_words * 64).cast("int"), "0")


def _abi_one_bytes(payload_hex: Column) -> Column:
    """ABI encoding of (bytes): offset word + length word + padded payload."""
    byte_len = (F.length(payload_hex) / 2).cast("long")
    return F.concat(
        F.lit("0x"),
        _uint_word(F.lit(32)),
        _uint_word(byte_len),
        _padded_bytes(payload_hex),
    )


def _abi_two_bytes(p1_hex: Column, p2_hex: Column) -> Column:
    """ABI encoding of (bytes, bytes): two head offsets + two tails."""
    len1 = (F.length(p1_hex) / 2).cast("long")
    len2 = (F.length(p2_hex) / 2).cast("long")
    words1 = F.ceil(F.length(p1_hex) / F.lit(64.0)).cast("long")
    off2 = F.lit(64) + F.lit(32) + words1 * 32
    return F.concat(
        F.lit("0x"),
        _uint_word(F.lit(64)),
        _uint_word(off2),
        _uint_word(len1),
        _padded_bytes(p1_hex),
        _uint_word(len2),
        _padded_bytes(p2_hex),
    )


def _addr_topic(addr: Column) -> Column:
    """20-byte address → left-padded 32-byte topic."""
    return F.concat(F.lit("0x"), F.lpad(_hex_body(addr), 64, "0"))


def build_raw_logs(events: DataFrame, contract: str = CONTRACT_ADDRESS) -> DataFrame:
    """Decoded wide events → raw (topics, data) logs, per the ABI in
    /root/reference/src/abi/hypermap.abi.json:8-14."""
    et = F.col("eventType")
    sig = F.lit(None).cast("string")
    for name, topic in TOPIC0.items():
        sig = F.when(et == name, F.lit(topic)).otherwise(sig)

    topics = (
        F.when(et.isin("Mint"), F.array(sig, F.col("parenthash"), F.col("childhash"), F.col("labelhash")))
        .when(et == "Fact", F.array(sig, F.col("parenthash"), F.col("facthash"), F.col("labelhash")))
        .when(et == "Note", F.array(sig, F.col("parenthash"), F.col("notehash"), F.col("labelhash")))
        .when(et == "Gene", F.array(sig, F.col("entry"), _addr_topic(F.col("gene"))))
        .when(
            et == "Transfer",
            F.array(sig, _addr_topic(F.col("from")), _addr_topic(F.col("to")), F.col("id")),
        )
        .when(et == "Zero", F.array(sig, _addr_topic(F.col("zeroTba"))))
        .when(et == "Upgraded", F.array(sig, _addr_topic(F.col("implementation"))))
    )

    data = (
        F.when(et == "Mint", _abi_one_bytes(_utf8_hex(F.col("label"))))
        .when(et.isin("Fact", "Note"), _abi_two_bytes(_utf8_hex(F.col("label")), _hex_body(F.col("data"))))
        .otherwise(F.lit("0x"))
    )

    return events.select(
        F.lit(contract).alias("address"),
        F.col("blockNumber").cast("long").alias("blockNumber"),
        "blockHash",
        "transactionHash",
        F.col("transactionIndex").cast("int").alias("transactionIndex"),
        F.col("logIndex").cast("int").alias("logIndex"),
        topics.alias("topics"),
        data.alias("data"),
    )
