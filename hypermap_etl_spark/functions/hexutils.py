"""Scalar hex/UTF-8/uint256 helpers — composed built-ins first, UDF last.

These are the only custom scalar functions the engine needs (SURVEY.md
§2.10): everything runs JVM-side via pyspark.sql.functions except the
uint256 decimal↔hex conversion (exceeds 64-bit ``conv``), which is a
tiny driver-registered UDF off the hot path.

Reference behavior:
  - UTF-8 label decode: ethers.toUtf8String with '' fallback
    (/root/reference/src/lib/services/events.ts:134,148,163)
  - event id: `${txHash}_${logIndex}`
    (/root/reference/scripts/extract-events.ts:89-91)
  - hex shorten 0xabcd...1234 (/root/reference/src/lib/services/events.ts:260-263)
  - epoch→ISO with 'Unknown' fallback (src/lib/services/events.ts:253-255)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip0x(col: Column) -> Column:
    """Remove a leading 0x if present; pure string op, codegen-friendly."""
    return F.regexp_replace(col, r"^0x", "")


def norm_hex(col: Column) -> Column:
    """Canonical lowercase 0x-prefixed hex."""
    return F.concat(F.lit("0x"), F.lower(strip0x(col)))


def hex_to_utf8(col: Column) -> Column:
    """Decode 0x-hex bytes to UTF-8 with '' fallback (null/empty → '').

    Mirrors `args[3] ? ethers.toUtf8String(args[3]) : ''`
    (src/lib/services/events.ts:134).
    """
    return F.coalesce(F.decode(F.unhex(strip0x(col)), "UTF-8"), F.lit(""))


def utf8_to_hex(col: Column) -> Column:
    """UTF-8 string → lowercase 0x-hex bytes (inverse of hex_to_utf8)."""
    return F.concat(F.lit("0x"), F.lower(F.hex(F.encode(col, "UTF-8"))))


def event_id(tx_hash: Column, log_index: Column) -> Column:
    """Primary key `${transactionHash}_${logIndex}` (extract-events.ts:89-91)."""
    return F.concat_ws("_", tx_hash, log_index.cast("string"))


def shorten_hex(col: Column, chars: int = 4) -> Column:
    """`0xabcd...1234` display truncation (src/lib/services/events.ts:260-263)."""
    return F.when(
        F.length(col) <= 2 + 2 * chars, col
    ).otherwise(
        F.concat(
            F.substring(col, 1, 2 + chars),
            F.lit("..."),
            F.substring(col, -chars, chars),
        )
    )


def format_timestamp_iso(ts_seconds: Column) -> Column:
    """Epoch seconds → ISO-8601 string, 'Unknown' on null
    (src/lib/services/events.ts:253-255)."""
    return F.coalesce(
        F.date_format(
            F.to_timestamp(F.from_unixtime(ts_seconds)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ),
        F.lit("Unknown"),
    )


def topic_to_address(col: Column) -> Column:
    """32-byte topic → 20-byte address (last 40 hex chars), 0x-lowercase."""
    return F.concat(F.lit("0x"), F.lower(F.substring(strip0x(col), 25, 40)))


def uint256_topic_to_hex(col: Column) -> Column:
    """32-byte topic holding a uint256 → canonical 0x-hex-64 (kept as hex;
    decimal would overflow LongType/DecimalType(38,0), SURVEY.md §7.4.5)."""
    return norm_hex(col)


def register_udfs(spark) -> None:
    """Register the few Python-side scalar helpers for SQL use.

    - uint256_hex_to_dec / uint256_dec_to_hex: arbitrary-precision
      conversion (reference stores Transfer id as decimal string,
      src/lib/services/events.ts:185; we canonicalize to hex and provide
      lossless conversion both ways).
    - namehash: keccak256 (functions/keccak.py) of the input bytes-hex.
    """
    from pyspark.sql.types import StringType

    from hypermap_etl_spark.functions.keccak import keccak256

    def hex_to_dec(h):
        if h is None:
            return None
        return str(int(h[2:] if h.startswith("0x") else h, 16))

    def dec_to_hex(d):
        if d is None:
            return None
        return "0x" + format(int(d), "064x")

    def namehash(h):
        if h is None:
            return None
        raw = bytes.fromhex(h[2:] if h.startswith("0x") else h)
        return "0x" + keccak256(raw).hex()

    spark.udf.register("uint256_hex_to_dec", hex_to_dec, StringType())
    spark.udf.register("uint256_dec_to_hex", dec_to_hex, StringType())
    spark.udf.register("namehash", namehash, StringType())
