"""pos_dlt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``databricks-industry-solutions/pos-dlt``
reference (a Delta Live Tables retail-lakehouse accelerator), re-expressed
Spark-first on open-source PySpark.

Layout
------
- ``session``    : SparkSession factory tuned for local[32] test runs and
                   documented conf for multi-executor clusters.
- ``schemas``    : explicit StructTypes for every table in the reference
                   (SURVEY.md §1.3) plus the training-data extension tables.
- ``sources``    : batch CSV / parquet scans, Auto-Loader-equivalent file
                   streams, Kafka wrapper, deterministic replay generator.
- ``operators``  : silver parse chain, CDC apply_changes, gold inventory
                   query, dedup family, similarity search, text analysis,
                   multimodal column plumbing.
- ``pipeline``   : DLT-like declarative table registry + DAG runner
                   (topological order, per-table refresh intervals).
- ``streaming``  : checkpointed stream runner utilities.

The reference implements everything as Databricks DLT notebooks
(``03_Bronze-to-Silver ETL.py``, ``04_Silver-to-Gold ETL.sql``); this engine
keeps the same table names, schemas and semantics but runs on stock PySpark
(Structured Streaming + parquet-backed tables; Delta-free).
"""

__version__ = "0.1.0"
