from streaming_parquet_spark.cli import main

raise SystemExit(main())
