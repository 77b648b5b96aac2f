"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``snowflake_to_bq_pipeline`` reference.

The reference (GCP Cloud Functions, row-at-a-time Python against warehouse
APIs) is re-expressed as declarative Spark DataFrame plans over columnar
storage: sync/reconciliation operators, latest-record dedup, budget-vs-actual
analytical views, monitoring/data-quality checks, plus LLM-training-data
operators (near-dup detection, ANN similarity search, text analysis) designed
for 100 TB scale.
"""

__version__ = "0.1.0"
