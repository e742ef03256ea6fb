"""Hadoop Streaming shim: any executable as a map step.

Parity target: ``hadoop-streaming`` (reference
``tools/hadoop-streaming/src/main/java/org/apache/hadoop/streaming/StreamJob.java``,
1098 LoC; subprocess plumbing ``PipeMapRed.java``): the task forks the
user command and speaks `key TAB value` lines over stdin/stdout.

``pipe_map`` reproduces that contract with ``RDD.pipe`` — one
subprocess per partition, lines in/lines out — then re-parses the
separator back into (key, value). The idiomatic replacement for new
code is a Pandas UDF (PySpark itself already fills Streaming's role of
"write your logic in any language"); this shim exists for literal
run-my-existing-script parity."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pipe_map(
    df: DataFrame,
    command: str,
    key_col: str = "key",
    value_col: str = "value",
    separator: str = "\t",
) -> DataFrame:
    """Run `command` over `key SEP value` lines (one subprocess per
    partition, exactly Hadoop Streaming's PipeMapper contract) and
    parse its stdout back into (key, value)."""
    spark = df.sparkSession
    lines = df.select(
        F.concat_ws(
            separator, F.col(key_col).cast("string"), F.col(value_col).cast("string")
        ).alias("line")
    )
    piped = lines.rdd.map(lambda r: r["line"]).pipe(command)
    out = spark.createDataFrame(piped.map(lambda s: (s,)), "line string")
    pos = F.instr(F.col("line"), separator)
    return out.select(
        F.when(pos > 0, F.substring_index("line", separator, 1)).otherwise(F.col("line")).alias(key_col),
        F.when(pos > 0, F.col("line").substr(pos + len(separator), F.length("line"))).otherwise(
            F.lit("")
        ).alias(value_col),
    )
