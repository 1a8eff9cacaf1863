"""CiteConnect-DataPipeline, rebuilt as an idiomatic PySpark-native engine.

A from-scratch Spark implementation of the query/data-processing
capabilities of the reference pandas/asyncio pipeline
(Cite-Connect/CiteConnect-DataPipeline): relational core (dedup,
anti/semi joins, slicing aggregations, windowed QA), text pipeline
(clean -> chunk -> enrich), embedding similarity search, dedup at
scale (exact hash, MinHash-LSH, SimHash, n-gram Jaccard), and
structured-streaming analogues over event data.

Design stance (SURVEY.md SS7.1): everything expressible as native
DataFrame/SQL stays native so Catalyst can optimize (pushdown,
pruning, broadcast, AQE); Python appears only inside Arrow-batched
``mapInPandas``/``pandas_udf`` stages for model inference and other
genuinely non-relational work. All operators are partition-parallel
-- no driver-side collects except final small aggregates.
"""

__version__ = "0.1.0"
