"""data_collection_ieee_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference repo BI-BIG-DATA/Data-Collection-IEEE
(an IEEE Xplore / ACM DL bibliographic scraper: reference main.py /
mainn.py), widened into a full DataFrame analytics surface:

- reference-semantics ingestion (bronze all-string schemas with ""-as-null,
  silver typed normalization, cross-source schema-drift union)
- the full relational core (joins, aggregates, windows, sorts, set ops)
- streaming-shaped operators with Structured Streaming parity
- LLM-data-pipeline operators (dedup exact/minhash/simhash, embedding
  similarity search, multimodal column plumbing, text analysis)

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and whole-stage codegen; Python only enters
via Arrow-batched pandas UDFs where built-ins cannot express semantics.
"""

__version__ = "0.1.0"
