"""Sources & sinks: Avro-schema bridge, binary/raw-file ingestion,
connector protocol, and format helpers. The reference ships data as
Avro container files through S3 (``S3DataFileHandler.scala``); here
the same layout is produced with Spark writers (parquet internally,
avro when the spark-avro jar is on the classpath)."""
