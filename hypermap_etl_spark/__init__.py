"""hypermap_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of basilesportif/hypermap-etl.

Brand-new, Spark-first implementation (DataFrame/SQL + Catalyst), NOT a
port of the reference's Node.js row-at-a-time execution model.

Layout:
  session      SparkSession builder tuned for large-scale batch
  schemas      fixed StructTypes for the event/entry data model
  constants    contract address, topic0 signatures, ROOT_HASH
  functions/   scalar helpers (hex/UTF-8, keccak256, uint256)
  sources/     parquet star-schema loaders + raw-log source
  operators/   decode, enrich, merge, materialize, dedup, similarity,
               textstats, multimodal
  plans/       serving queries (get_status/get_events/...) and the
               derived-table definitions used by the driver gate
  streaming/   Structured Streaming catch-up + continuous tail
"""

__version__ = "0.1.0"
