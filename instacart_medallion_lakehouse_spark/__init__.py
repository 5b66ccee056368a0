"""instacart_medallion_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference medallion lakehouse
(dheerajunni/instacart-medallion-lakehouse): bronze/silver/gold layering,
quality gates, star-schema gold marts, plus large-scale training-data
pipeline extensions (dedup, similarity search, text analysis, multimodal
plumbing, structured streaming).

Everything is expressed on the DataFrame / Spark SQL API so Catalyst +
Tungsten choose the physical plan; there are no row-at-a-time Python UDFs
in any hot path (design constraint for the 100 TB target — see
reference utils/quality.py which is likewise pure-DataFrame composition).
"""

__version__ = "0.1.0"

# Export the vendored-protobuf path (vendor/google/protobuf) into
# PYTHONPATH at import time, before any SparkSession/JVM exists — the
# driver's plain-session path never calls build_session, but every
# entry point imports this package first. No-op when the real protobuf
# wheel is installed. See session.ensure_vendored_protobuf.
from .session import ensure_vendored_protobuf as _evp  # noqa: E402

_evp()
del _evp
