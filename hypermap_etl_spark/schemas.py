"""Fixed StructTypes for the data model (SURVEY.md §1).

The reference declares fixed Mongoose schemas (a wide sparse union for
events, /root/reference/src/schemas/index.ts:4-43; entries
src/schemas/index.ts:46-60). Spark StructTypes reproduce them exactly;
hex quantities stay lowercase ``0x…`` strings (uint256 exceeds both
LongType and DecimalType(38,0) — SURVEY.md §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw, undecoded contract log — stand-in for eth_getLogs output
# (scripts/extract-events.ts:225-230; FIXTURES.md §1).
RAW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType(), False),
        T.StructField("blockNumber", T.LongType(), False),
        T.StructField("blockHash", T.StringType(), False),
        T.StructField("transactionHash", T.StringType(), False),
        T.StructField("transactionIndex", T.IntegerType(), False),
        T.StructField("logIndex", T.IntegerType(), False),
        T.StructField("topics", T.ArrayType(T.StringType(), False), False),
        T.StructField("data", T.StringType(), False),
    ]
)

# Block-number → timestamp dimension (src/lib/services/events.ts:44-78;
# FIXTURES.md §2).
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("blockNumber", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

# Decoded wide event table — discriminated union on eventType
# (src/types/index.ts:9-76, src/schemas/index.ts:4-43; FIXTURES.md §3).
# Column order matters for union-by-position writers; keep stable.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("eventType", T.StringType(), False),
        T.StructField("blockNumber", T.LongType(), False),
        T.StructField("blockHash", T.StringType(), False),
        T.StructField("transactionHash", T.StringType(), False),
        T.StructField("transactionIndex", T.IntegerType(), False),
        T.StructField("logIndex", T.IntegerType(), False),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("parenthash", T.StringType(), True),
        T.StructField("childhash", T.StringType(), True),
        T.StructField("facthash", T.StringType(), True),
        T.StructField("notehash", T.StringType(), True),
        T.StructField("labelhash", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("data", T.StringType(), True),
        T.StructField("entry", T.StringType(), True),
        T.StructField("gene", T.StringType(), True),
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("zeroTba", T.StringType(), True),
        T.StructField("implementation", T.StringType(), True),
    ]
)

# Materialized entry state (src/types/index.ts:94-106,
# src/schemas/index.ts:46-60; FIXTURES.md §4).
ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("namehash", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("parentHash", T.StringType(), False),
        T.StructField("fullName", T.StringType(), True),
        T.StructField("owner", T.StringType(), True),
        T.StructField("gene", T.StringType(), True),
        T.StructField("notes", T.MapType(T.StringType(), T.StringType(), False), False),
        T.StructField("facts", T.MapType(T.StringType(), T.StringType(), False), False),
        T.StructField("children", T.ArrayType(T.StringType(), False), False),
        T.StructField("creationBlock", T.LongType(), False),
        T.StructField("lastUpdateBlock", T.LongType(), False),
        # persisted M3 marker (beyond the reference's schema): the delta
        # merge gates the placeholder→Mint identity upgrade on this flag
        # rather than inferring placeholder-ness from attacker-
        # controllable label/parent values (operators/materialize.py).
        T.StructField("isPlaceholder", T.BooleanType(), False),
    ]
)

# Columns that only apply to some event variants (null elsewhere).
VARIANT_COLUMNS: dict[str, list[str]] = {
    "Mint": ["parenthash", "childhash", "labelhash", "label"],
    "Fact": ["parenthash", "facthash", "labelhash", "label", "data"],
    "Note": ["parenthash", "notehash", "labelhash", "label", "data"],
    "Gene": ["entry", "gene"],
    "Transfer": ["from", "to", "id"],
    "Zero": ["zeroTba"],
    "Upgraded": ["implementation"],
}

# Multimodal media table (north-star extension): opaque binary payload +
# typed metadata; see operators/multimodal.py.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
