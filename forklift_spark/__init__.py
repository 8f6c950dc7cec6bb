"""forklift_spark — a PySpark-native data movement & analytics engine.

A brand-new engine with the query and data-processing capabilities of
taskrabbit/forklift (reference: /root/reference, a Ruby batch-ETL tool),
re-expressed Spark-first: YAML connections -> DataFrame readers/writers,
paginated read->write loops -> single distributed jobs, pipe/incremental
patterns -> merge/overwrite plans, plus large-scale training-data operators
(dedup, similarity search, text analysis) the reference never had.

Design discipline (100 TB): no collect() in any operator's data path; the
only driver-visible scalars are high-water marks and counts; every operator
is a single declarative DataFrame plan that Catalyst can optimize.
"""

from forklift_spark.session import get_spark, session_builder
from forklift_spark.engine import Engine
from forklift_spark.plan import Plan

__version__ = "0.1.0"

__all__ = ["Engine", "Plan", "get_spark", "session_builder", "__version__"]
