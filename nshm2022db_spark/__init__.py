"""nshm2022db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ucgmsim/NSHM2022DB, rebuilt Spark-first.

The reference (read-only at /root/reference) is a SQLite+DuckDB engine for
the NZ 2022 National Seismic Hazard Model. This package re-expresses its
entire operator surface (see SURVEY.md §2) as declarative PySpark DataFrame
plans — one engine, Catalyst-optimized, designed for 100 TB scale — plus the
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing, streaming).

Layout:
    session.py    SparkSession factory tuned for local[$SPARK_GRAFT_CPUS]
    schemas.py    explicit StructTypes (no inference) for every table
    dsl/          the boolean fault-membership DSL: lexer → Pratt parser →
                  Spark Column compiler (reference: nshmdb/query.py)
    operators/    relational operators from SURVEY §2 (joins, aggs, top-k,
                  as-of nearest match, set ops, reshaping)
    sources/      readers for parquet/CSV/ragged-CSV/GeoJSON
    functions/    scalar/column helpers (geo projection, vector math)
    plans/        the composed query pipelines (advanced query, rates)
    api/          NSHMDB-parity point-access API over parquet tables
    etl/          ingestion pipeline (unpivot, explode, weighted merge,
                  surrogate keys, upsert)
    extensions/   LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    streaming/    Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
