"""Engine constants mirroring the reference's public configuration.

Citations into /root/reference:
  - contract address: src/constants.ts:6
  - chain id (Base mainnet): src/constants.ts:11
  - ROOT_HASH: src/constants.ts:7
  - default start block: scripts/extract-events.ts:63
  - chunk sizes / poll interval: src/constants.ts:15-16,
    scripts/extract-events.ts:191, scripts/scan-events.ts:123,129
  - event ABI (7 events): src/abi/hypermap.abi.json:8-14
"""

from __future__ import annotations

from hypermap_etl_spark.functions.keccak import event_topic0

CONTRACT_ADDRESS = "0x000000000044c6b8cb4d8f0f889a3e47664eaeda"
CHAIN_ID = 8453
ROOT_HASH = "0x" + "00" * 32
DEFAULT_START_BLOCK = 27_270_000
EXTRACT_CHUNK_SIZE = 20_000
INDEX_CHUNK_SIZE = 5_000
CHAIN_HEAD_CHECK_INTERVAL_S = 30

EVENT_TYPES = ["Mint", "Fact", "Note", "Gene", "Transfer", "Zero", "Upgraded"]

# Event signatures from src/abi/hypermap.abi.json:8-14; topic0 = keccak256(sig).
EVENT_SIGNATURES: dict[str, str] = {
    "Mint": "Mint(bytes32,bytes32,bytes,bytes)",
    "Fact": "Fact(bytes32,bytes32,bytes,bytes,bytes)",
    "Note": "Note(bytes32,bytes32,bytes,bytes,bytes)",
    "Gene": "Gene(bytes32,address)",
    "Transfer": "Transfer(address,address,uint256)",
    "Zero": "Zero(address)",
    "Upgraded": "Upgraded(address)",
}

TOPIC0: dict[str, str] = {name: event_topic0(sig) for name, sig in EVENT_SIGNATURES.items()}
TOPIC0_TO_EVENT: dict[str, str] = {v: k for k, v in TOPIC0.items()}

# Serving-layer pagination bounds (src/app/events/actions.ts:22-24).
PAGE_LIMIT_DEFAULT = 20
PAGE_LIMIT_MAX = 100
