"""yacy_grid_crawler_spark — a from-scratch PySpark-native URL frontier
and fetch-scheduler engine reproducing the crawl semantics of
yacy/yacy_grid_crawler (reference, read-only at /root/reference).

This is NOT a port: the reference is a RabbitMQ/Elasticsearch message-
driven Java service (see SURVEY.md); this engine re-expresses the same
semantics as declarative DataFrame plans over columnar state tables,
with a driver-side BFS wave loop replacing the queue consumer.

Layout
------
functions/   pure-Python kernels (URL canonicalization, hashing) shared
             by the Spark pandas UDFs and the executable-spec oracle
operators/   one module per SURVEY.md §2 operator family
sources/     state store (parquet-snapshot tables; Iceberg when jars
             are present) + synthetic spans-document derivation
plans/       the per-wave pipeline and the driver crawl loop
oracle/      pure-Python single-node executable spec (SURVEY.md §5.1)
fixtures/    deterministic seeded spans-corpus generator
streaming/   Structured Streaming frontier variant
"""

__version__ = "0.1.0"
