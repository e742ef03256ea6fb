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


def pipe_map_typedbytes(
    df: DataFrame,
    command,
    key_col: str = "key",
    value_col: str = "value",
    output_schema: str = "key binary, value binary",
) -> DataFrame:
    """Binary-safe Hadoop Streaming: the ``-io typedbytes`` contract
    (reference ``PipeMapRed.java`` with ``TypedBytesInput/Output``,
    ``tools/hadoop-streaming/.../typedbytes/``). Payloads may contain
    newlines, tabs and NULs — nothing is line-framed.

    One subprocess per partition; alternating key/value typedbytes
    frames are pumped to its stdin from a feeder thread (the same
    deadlock-avoiding pump PipeMapRed runs), and its stdout is decoded
    as alternating key/value frames. Column types map to wire types via
    ``typedbytes.encode`` (binary→BYTES, string→STRING, int→INT/LONG,
    float→DOUBLE, bool→BOOL); decoded output rows are shaped by
    ``output_schema``.
    """
    import shlex
    import subprocess
    import threading

    from hadoop_fcfs_spark.udf.typedbytes import decode_stream, encode

    cmd = command if isinstance(command, list) else shlex.split(command)
    spark = df.sparkSession

    def run_partition(rows):
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE)

        def feed():
            try:
                for k, v in rows:
                    proc.stdin.write(encode(k))
                    proc.stdin.write(encode(v))
                proc.stdin.close()
            except BrokenPipeError:
                pass  # subprocess exited early; rc check below reports it

        feeder = threading.Thread(target=feed, daemon=True)
        feeder.start()
        frames = decode_stream(proc.stdout)
        sentinel = object()
        while True:
            k = next(frames, sentinel)
            if k is sentinel:
                break
            v = next(frames, sentinel)
            if v is sentinel:
                raise EOFError("typedbytes output ended after a key frame (odd frame count)")
            yield (k, v)
        feeder.join()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"piped command {cmd!r} exited with {rc}")

    rdd = df.select(key_col, value_col).rdd.map(tuple).mapPartitions(run_partition)
    return spark.createDataFrame(rdd, schema=output_schema)
