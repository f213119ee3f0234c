"""aws_csp_datapipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference system (``bhasker1996/AWS_CSP_Datapipeline``, surveyed in
``SURVEY.md``), re-expressed Spark-first:

- DataFrame/SQL declarative plans; Catalyst does all optimization.
- Every reference capability is a pure ``DataFrame -> DataFrame``
  operator (``operators/``).
- Structured Streaming for incremental ingest (``streaming/``).
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) as first-class modules.

No code is ported from the reference — it is a Redshift-backed Lambda
CRUD service; this library re-implements *what* it computes on Spark's
execution model (see SURVEY.md §4.2 for what we deliberately do NOT
replicate: row-at-a-time writes, poll loops, table locks).
"""

from aws_csp_datapipeline_spark.session import get_spark
from aws_csp_datapipeline_spark.catalog import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
