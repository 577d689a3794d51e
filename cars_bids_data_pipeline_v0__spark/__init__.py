"""cars_bids_data_pipeline_v0__spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ELT pipeline (BrianOyollo/Cars-Bids-Data-Pipeline-v0-):

* nested-JSON ingest with dual-format normalization (bronze),
* a scalar transform library with pandas-exact null/coerce semantics (silver),
* keep-latest dedup + partitioned merge sinks,
* a star-schema warehouse maintained by idempotent merge operators (gold),
* an analytics query surface (joins / aggregations / windows),
* large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis, and
  multimodal column plumbing,
* Structured Streaming incremental variants.

Everything is declared through the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join planning, and whole-stage codegen; Python UDFs are
reserved for genuinely non-expressible operators (none in the core inventory).
"""

__version__ = "0.1.0"
