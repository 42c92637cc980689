"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``smohiudd/gtfs-realtime-etl`` reference system.

The reference (see ``/root/reference``, SURVEY.md) is an AWS-serverless
GTFS-Realtime ETL + DuckDB analytics stack.  This package re-expresses its
entire capability surface — ingest, enrichment, partitioned lake,
compaction, and the schedule-deviation analytics — as idiomatic PySpark
(DataFrame / SQL / Structured Streaming), and extends it with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) needed at 100 TB scale.

Layout
------
``functions/``  scalar/column function library (geo, time, stats, text, vector)
``sources/``    readers & writers (GTFS static CSV, partitioned lake, protobuf feed)
``operators/``  relational + domain operators (deviation query, dedup, similarity)
``streaming/``  Structured Streaming ingest + maintenance (compaction)
``plans/``      reusable query plans / entry-point query registry
"""

__version__ = "0.1.0"
