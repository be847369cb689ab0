"""PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of openGauss gs_datachecker
(opengauss-mirror/openGauss-tools-datachecker-performance, reference
checkout at /root/reference): per-partition digest-tree data
consistency checking (insert/update/delete diffs), schema checks,
per-column stats, uniqueness, referential integrity, distribution
drift — over tables of interleaved text+media documents — plus the
training-data-pipeline operators a 100 TB corpus needs (dedup
families, similarity search, text analysis, multimodal plumbing).

The reference runs three Spring services wired by Kafka
(datachecker-extract x2 + datachecker-check); here the whole
pipeline is one Spark job: driver = check service, executors =
extract workers, shuffle = Kafka.  See SURVEY.md for the full
operator-by-operator mapping.
"""

__version__ = "0.1.0"

from opengauss_tools_datachecker_performance_spark.session import get_spark  # noqa: F401
