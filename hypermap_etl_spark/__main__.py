from hypermap_etl_spark.cli import main

main()
