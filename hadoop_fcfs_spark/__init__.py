"""hadoop_fcfs_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capability surface of the reference
(simbadzina/hadoop-fcfs, a Hadoop 3.0.0-SNAPSHOT MapReduce tree) as thin,
idiomatic PySpark: DataFrame/SQL declarative plans optimized by Catalyst,
executed by Tungsten. See SURVEY.md for the operator inventory this
package covers and the reference file:line citations in each module.

Design stance (SURVEY.md §7.1):
- A dataset is a DataFrame with an explicit schema; the reference's
  generic ``(key, value)`` record is the degenerate 2-column case.
- Zero custom execution machinery: every operator is a composition of
  built-in DataFrame ops, falling back to Arrow-batched Pandas UDFs only
  where the built-ins genuinely can't express the semantics.
- Every operator is designed for 100 TB / 1000-executor scale: broadcast
  small sides, keep expressions inside whole-stage codegen, avoid
  driver-side loops, let AQE handle skew.
"""

__version__ = "0.1.0"

from hadoop_fcfs_spark.session import get_spark  # noqa: F401
