from hypermap_etl_spark.functions import hexutils, keccak  # noqa: F401
