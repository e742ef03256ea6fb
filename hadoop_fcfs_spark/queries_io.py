"""Correctness-gate queries: IO-layer semantics provable over parquet
(SURVEY.md §2.1). The file-format readers themselves are exercised by
pytest round-trips (tests/test_io.py); here we gate the record-shaping
semantics (KV split, fixed-width projection) on driver tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_fcfs_spark.registry import register
from hadoop_fcfs_spark.tables import t


@register(
    "xml_records",
    oracle="""
    SELECT lang, COUNT(*) AS n_records, CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_payload
    FROM documents GROUP BY lang
    """,
    doc="StreamXmlRecordReader parity (tools/hadoop-streaming/.../StreamXmlRecordReader.java): "
    "documents are packed into multi-record XML blobs (several <doc> "
    "elements per blob, like records spanning a split), re-extracted with "
    "the begin/end-tag reader, fields recovered from attributes/body. The "
    "oracle aggregates the source table directly — equality proves the "
    "pack→parse round-trip is lossless.",
)
def xml_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.io.readers import parse_xml_records

    docs = t(spark, sf_dir, "documents")
    # pack ~50 docs per blob: one XML string with many <doc> elements
    frag = F.concat(
        F.lit('<doc lang="'), F.col("lang"), F.lit('">'), F.col("text"), F.lit("</doc>")
    )
    blobs = (
        docs.select((F.col("doc_id") % 100).alias("blob_id"), frag.alias("frag"))
        .groupBy("blob_id")
        .agg(F.concat_ws("\n", F.collect_list("frag")).alias("xml"))
    )
    recs = parse_xml_records(blobs, "xml", "<doc", "</doc>")
    return recs.select(
        F.regexp_extract("record", r'lang="([^"]*)"', 1).alias("lang"),
        F.length(F.regexp_extract("record", r">(.*)</doc>$", 1)).alias("payload_len"),
    ).groupBy("lang").agg(
        F.count("*").alias("n_records"), F.sum("payload_len").alias("sum_payload")
    )


@register(
    "interval_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 10 = 3 GROUP BY lang
    """,
    doc="InputSampler.IntervalSampler parity (mr-core/mapreduce/lib/"
    "partition/InputSampler.java:249): systematic every-k-th sampling by "
    "key — deterministic, engine-independent (unlike RandomSampler, whose "
    "RNG stream is engine-specific; df.sample covers that surface).",
)
def interval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 3)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "kv_split",
    oracle="""
    SELECT CASE WHEN POSITION(' ' IN text) > 0 THEN text[1:POSITION(' ' IN text) - 1] ELSE text END AS key,
           CASE WHEN POSITION(' ' IN text) > 0 THEN text[POSITION(' ' IN text) + 1:] ELSE '' END AS value
    FROM documents
    """,
    doc="KeyValueTextInputFormat (KeyValueLineRecordReader.java:39): split at first separator.",
)
def kv_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), " ")
    return docs.select(
        F.when(pos > 0, F.substring_index("text", " ", 1)).otherwise(F.col("text")).alias("key"),
        F.when(pos > 0, F.expr("substring(text, instr(text, ' ') + 1)")).otherwise(F.lit("")).alias("value"),
    )


@register(
    "dbcount_pageview",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS views
    FROM events WHERE event_id % 97 = 0 GROUP BY event_type
    """,
    doc="DBCountPageView parity (examples/.../DBCountPageView.java:61) — the "
    "full DB-in/DB-out cycle against an embedded Derby database (Derby ships "
    "on Spark's classpath as the metastore dependency, so this runs "
    "everywhere the engine runs): load an ACCESS table over JDBC "
    "(DBOutputFormat generated INSERTs, DBOutputFormat.java:50), scan it "
    "back with DataDrivenDB-style range splits on the integer key "
    "(DBInputFormat.java:61; MIN/MAX split metadata mirrors "
    "DataDrivenDBInputFormat's getSplits bounds query), aggregate views per "
    "type, write the PAGEVIEW result table over JDBC, and return its "
    "contents. The 1-in-97 event sample keeps INSERT volume bounded at any "
    "SF; the embedded DB lives in a per-call temp dir (Derby keeps it booted "
    "for the session — tests exercise the ;shutdown=true teardown).",
)
def dbcount_pageview(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from hadoop_fcfs_spark.io.readers import read_jdbc
    from hadoop_fcfs_spark.io.writers import write_jdbc

    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='fcfs_derby_')}/db;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    access = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .select("event_id", "user_id", "event_type")
    )
    write_jdbc(access, url, "ACCESS", mode="overwrite", **drv)
    # split metadata: two scalars, the same MIN/MAX bounds query the
    # reference's DataDrivenDBInputFormat issues in getSplits
    lo, hi = access.agg(F.min("event_id"), F.max("event_id")).first()
    scanned = read_jdbc(
        spark, url, "ACCESS",
        partition_column="event_id", lower_bound=lo, upper_bound=hi,
        num_partitions=8, **drv,
    )
    views = scanned.groupBy("event_type").agg(F.count("*").alias("views"))
    write_jdbc(views, url, "PAGEVIEW", mode="overwrite", **drv)
    return read_jdbc(spark, url, "PAGEVIEW", **drv)


_SKEY = "CAST('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 8) AS BIGINT)"


@register(
    "hash_sample_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE {_SKEY.format(id="o_orderkey")} < 268435456
    """,
    doc="Deterministic 1/16 record sample (InputSampler.RandomSampler parity "
    "with SequenceFileInputFilter.MD5Filter determinism): keep iff "
    "uniform32(md5(id)) < 2^32/16. Pure per-row expression, shuffle-free, "
    "reproducible across engines/re-runs/partitionings (ops/sampling.py).",
)
def hash_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import hash_sample

    return hash_sample(t(spark, sf_dir, "orders"), "o_orderkey", 0.0625).select(
        "o_orderkey", "o_orderstatus"
    )


@register(
    "stratified_sample_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE {_SKEY.format(id="o_orderkey")} <
          CASE o_orderstatus WHEN 'F' THEN 536870912
                             WHEN 'O' THEN 268435456
                             WHEN 'P' THEN 4294967296 END
    """,
    doc="Per-stratum deterministic sampling (sampleBy parity without RNG): "
    "F keeps 1/8, O keeps 1/16, P keeps all — the per-source corpus "
    "balancing move. Exact power-of-two thresholds keep the integer "
    "cutoffs engine-identical.",
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import stratified_sample

    return stratified_sample(
        t(spark, sf_dir, "orders"),
        "o_orderstatus",
        "o_orderkey",
        {"F": 0.125, "O": 0.0625, "P": 1.0},
    ).select("o_orderkey", "o_orderstatus")


@register(
    "per_group_sample_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderkey FROM (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY {_SKEY.format(id="o_orderkey")}, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 5
    """,
    doc="Fixed-5-per-group deterministic sample: smallest md5 sample keys "
    "per group, id tiebreak — the bounded-state distributed reservoir "
    "(rank filter compiles to WindowGroupLimit, per-group state O(n)).",
)
def per_group_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import per_group_sample

    return per_group_sample(t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderkey", 5).select(
        "o_orderstatus", "o_orderkey"
    )


@register(
    "train_holdout_split",
    oracle=f"""
    SELECT CASE WHEN {_SKEY.format(id="doc_id")} < 1073741824
                THEN 'holdout' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1
    """,
    doc="Leakage-safe deterministic train/holdout carve of the documents "
    "corpus (25% holdout by id hash): membership depends only on the id, "
    "so re-runs, incremental arrivals and other engines agree. Gate "
    "aggregates per-split doc and char counts.",
)
def train_holdout_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import train_holdout_split

    docs = t(spark, sf_dir, "documents")
    return (
        train_holdout_split(docs, "doc_id", 0.25)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "weighted_sample_orders",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderstatus, o_orderkey,
             ln(({_SKEY.format(id="o_orderkey")} + 1.0) / 4294967296.0)
               / CAST(o_totalprice AS DOUBLE) AS akey
      FROM orders WHERE o_totalprice > 0
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY akey DESC, o_orderkey) AS rn
      FROM keyed
    )
    SELECT o_orderstatus, o_orderkey FROM ranked WHERE rn <= 10
    """,
    doc="Deterministic weighted sampling without replacement "
    "(ops/sampling.weighted_sample_k, Efraimidis-Spirakis A-ES): "
    "inclusion probability proportional to o_totalprice, 10 orders per "
    "status. Key = ln(u)/w in log form so the only transcendental is "
    "ln() (libm-parity observed); per-stratum top-k is a "
    "WindowGroupLimit-bounded window, never a global sort.",
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import weighted_sample_k

    orders = t(spark, sf_dir, "orders")
    return weighted_sample_k(
        orders, "o_orderkey", "o_totalprice", 10, stratum_col="o_orderstatus"
    ).select("o_orderstatus", "o_orderkey")


@register(
    "duplicate_safe_split",
    oracle="""
    WITH d AS (SELECT md5(lower(trim(text))) AS dig, n_chars FROM documents)
    SELECT CASE WHEN CAST('0x' || substr(md5(dig), 1, 8) AS BIGINT) < 1073741824
                THEN 'holdout' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT dig) AS BIGINT) AS n_texts,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM d GROUP BY 1
    """,
    doc="Duplicate-safe train/holdout carve (ops/sampling."
    "duplicate_safe_split): the split key is the CONTENT digest, so every "
    "copy of a duplicated document lands on the same side — id-hash "
    "splits silently leak train text into eval whenever the corpus has "
    "duplicates. Pure per-row expressions, no dedup pass; 25% holdout at "
    "a dyadic threshold.",
)
def duplicate_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import duplicate_safe_split

    docs = t(spark, sf_dir, "documents")
    dig = F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    return (
        duplicate_safe_split(docs, "doc_id", "text", 0.25)
        .withColumn("__dig", dig)
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("__dig").cast("long").alias("n_texts"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@register(
    "token_budget_mix",
    oracle=f"""
    WITH ntoks AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ntok
      FROM documents
    ),
    tot AS (SELECT source, SUM(ntok) AS total FROM ntoks GROUP BY source),
    kept AS (
      SELECT n.source, n.ntok
      FROM ntoks n JOIN tot t USING (source)
      WHERE {_SKEY.format(id="n.doc_id")} <
            CASE WHEN 500 >= t.total THEN 4294967296
                 ELSE FLOOR(CAST(500 AS DOUBLE) * 4294967296 / t.total) END
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY source
    """,
    doc="Training-mix source weighting under per-source TOKEN budgets "
    "(ops/sampling.token_budget_mix; The-Pile/LLaMA-style): one per-source "
    "token-mass aggregation broadcast back, then a deterministic md5 "
    "keep-threshold floor(budget*2^32/total) per row — sources under "
    "budget keep all. Gate applies a 500-token default budget to every "
    "source and summarizes kept docs + token mass per source.",
)
def token_budget_mix_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import token_budget_mix

    docs = t(spark, sf_dir, "documents")
    kept = token_budget_mix(docs, "source", "doc_id", "text", {}, default_budget=500)
    ntok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")))
    return kept.withColumn("__ntok", ntok).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ntok").cast("long").alias("tokens_kept"),
    )


@register(
    "token_budget_mix_weighted",
    oracle=f"""
    WITH ntoks AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ntok
      FROM documents
    ),
    tot AS (SELECT source, SUM(ntok) AS total, SUM(ntok * ntok) AS tot2
            FROM ntoks GROUP BY source),
    kept AS (
      SELECT n.source, n.ntok
      FROM ntoks n JOIN tot t USING (source)
      WHERE {_SKEY.format(id="n.doc_id")} <
            CASE WHEN 500 >= t.total THEN 4294967296
                 ELSE FLOOR(CAST(500 AS DOUBLE) * n.ntok * 4294967296.0 / t.tot2) END
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY source
    """,
    doc="Length-weighted (PPS / importance) training-mix sampling "
    "(ops/sampling.token_budget_mix_weighted): keep probability "
    "proportional to a document's token mass, p=budget*ntok/SUM(ntok^2), "
    "so the expected KEPT TOKEN MASS equals the budget and long docs are "
    "preferentially retained — the keep-key a token-denominated mixing "
    "pipeline wants (vs the uniform variant's expectation over docs). "
    "Same two-pass broadcast shape; per-row threshold floor(budget*ntok*"
    "2^32/SUM(ntok^2)) with identical float64 operation order on both "
    "engines.",
)
def token_budget_mix_weighted_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import token_budget_mix_weighted

    docs = t(spark, sf_dir, "documents")
    kept = token_budget_mix_weighted(docs, "source", "doc_id", "text", {}, default_budget=500)
    ntok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")))
    return kept.withColumn("__ntok", ntok).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ntok").cast("long").alias("tokens_kept"),
    )


def _z_sql(cols: list[str], bits: int) -> str:
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + ci})"
        for ci, c in enumerate(cols)
        for b in range(bits)
    ]
    return " | ".join(terms)


@register(
    "zorder_values",
    oracle=f"""
    SELECT o_orderkey,
           CAST({_z_sql(["(o_custkey & 255)", "(o_orderkey & 255)"], 8)} AS BIGINT)
             AS zval
    FROM orders
    """,
    doc="Morton/Z-value bit interleave (ops/layout.zvalue): the clustering "
    "key behind multi-dimensional layout (Delta/Iceberg OPTIMIZE ZORDER). "
    "Gate oracles the interleave arithmetic bit-for-bit over the low 8 "
    "bits of (o_custkey, o_orderkey); the layout/pruning benefit is "
    "asserted by the per-file locality pytest (test_plans).",
)
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.layout import zvalue

    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        zvalue(
            [F.col("o_custkey").bitwiseAND(F.lit(255)), F.col("o_orderkey").bitwiseAND(F.lit(255))],
            bits=8,
        ).alias("zval"),
    )


def _hilbert_sql(bits: int, x_expr: str, y_expr: str) -> str:
    """Unrolled xy→d Hilbert CTE chain with UNIQUE per-level column
    names (x{k}/y{k}/d{k}) — DuckDB binds lateral column aliases in
    the same SELECT, so reusing 'hx' as both input column and output
    alias would be ambiguous; distinct names per level sidestep it."""
    n1 = (1 << bits) - 1
    parts = [f"""
    l{bits} AS (
      SELECT o_orderkey, CAST({x_expr} AS BIGINT) AS x{bits},
             CAST({y_expr} AS BIGINT) AS y{bits},
             CAST(0 AS BIGINT) AS d{bits}
      FROM orders
    )"""]
    for k in range(bits - 1, -1, -1):
        p = k + 1
        s = 1 << k
        parts.append(f"""
    l{k} AS (
      SELECT o_orderkey,
        CASE WHEN ((y{p} >> {k}) & 1) = 1 THEN x{p}
             WHEN ((x{p} >> {k}) & 1) = 1 THEN {n1} - y{p}
             ELSE y{p} END AS x{k},
        CASE WHEN ((y{p} >> {k}) & 1) = 1 THEN y{p}
             WHEN ((x{p} >> {k}) & 1) = 1 THEN {n1} - x{p}
             ELSE x{p} END AS y{k},
        d{p} + {s * s} * (3 * ((x{p} >> {k}) & 1) + ((y{p} >> {k}) & 1)
            - 2 * ((x{p} >> {k}) & 1) * ((y{p} >> {k}) & 1)) AS d{k}
      FROM l{p}
    )""")
    return "WITH " + ",".join(parts)


@register(
    "hilbert_values",
    oracle=_hilbert_sql(8, "(o_custkey & 255)", "(o_orderkey & 255)")
    + """
    SELECT o_orderkey, CAST(d0 AS BIGINT) AS hval FROM l0
    """,
    doc="2-D Hilbert-curve index over the low 8 bits of "
    "(o_custkey, o_orderkey) (ops/layout.hilbert_value): the "
    "better-locality clustering key next to zorder_values - Morton "
    "order jumps a long diagonal at every power-of-two boundary, the "
    "Hilbert curve moves one grid cell per step everywhere, so curve-"
    "contiguous files cover tighter key rectangles and min/max "
    "pruning skips more. Pure per-row integer arithmetic: 8 unrolled "
    "levels of the classic xy->d recurrence, quadrant carried as the "
    "XOR-free identity 3rx + ry - 2rx*ry, full-grid reflections "
    "keeping every intermediate nonnegative (no two's-complement "
    "reliance); each level is its own projection so the expression "
    "tree stays linear. The defining consecutive-cells-are-neighbors "
    "property is pinned exhaustively in pytest at bits=4.",
)
def hilbert_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.layout import hilbert_value

    orders = t(spark, sf_dir, "orders")
    return hilbert_value(
        orders.select("o_orderkey", "o_custkey"),
        F.col("o_custkey").bitwiseAND(F.lit(255)),
        F.col("o_orderkey").bitwiseAND(F.lit(255)),
        bits=8,
    ).select("o_orderkey", "hval")


@register(
    "footer_table_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS DOUBLE) AS l_orderkey_min,
           CAST(MAX(l_orderkey) AS DOUBLE) AS l_orderkey_max,
           CAST(MIN(l_quantity) AS DOUBLE) AS l_quantity_min,
           CAST(MAX(l_quantity) AS DOUBLE) AS l_quantity_max,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS l_extendedprice_min,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS l_extendedprice_max
    FROM lineitem
    """,
    doc="Scan-less table statistics (io.metadata.table_stats_from_"
    "footers): COUNT + per-column MIN/MAX answered from parquet FOOTER "
    "metadata only — footer reads distributed over the file list with "
    "mapInPandas/pyarrow (100k files = 100k few-KB reads across the "
    "cluster, zero data pages). The oracle computes the same stats the "
    "expensive way from the data — footers proven trustworthy is what "
    "licenses file-skipping at 100 TB. Reference analog: "
    "FileInputFormat.listStatus split planning.",
)
def footer_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hadoop_fcfs_spark.io.metadata import table_stats_from_footers

    return table_stats_from_footers(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey", "l_quantity", "l_extendedprice"],
    )


@register(
    "neyman_allocation_orders",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                      * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS s2
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT stratum, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
                  AS BIGINT) AS weight_q
      FROM m
    ),
    tot AS (SELECT CAST(SUM(weight_q) AS BIGINT) AS tw FROM w),
    a AS (
      SELECT stratum, n, weight_q,
             CASE WHEN tw > 0
                  THEN CAST((10000 * weight_q) // tw AS BIGINT)
                  ELSE 0 END AS allocated
      FROM w CROSS JOIN tot
    ),
    sel AS (
      SELECT o.o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS nsel
      FROM orders o JOIN a ON a.stratum = o.o_orderpriority
      WHERE {_SKEY.format(id="o.o_orderkey")}
            < (a.allocated * 4294967296) // a.n
      GROUP BY 1
    )
    SELECT a.stratum, a.n, a.weight_q, a.allocated,
           CAST(COALESCE(sel.nsel, 0) AS BIGINT) AS n_selected
    FROM a LEFT JOIN sel USING (stratum)
    """,
    doc="Neyman-allocation stratified sampling design "
    "(ops.sampling.neyman_allocation): split a 10k-row budget across "
    "order priorities proportionally to N_h*sigma_h of the dollar "
    "total - the variance-OPTIMAL allocation for estimating the mean "
    "(stratified_sample_orders takes fractions as GIVEN; this gate "
    "computes them from the data). Exact BIGINT per-stratum moments "
    "on floor-dollar values; N_h*sigma_h = sqrt(n*S2 - S1^2) as a "
    "correctly-rounded double from exact ints, floor-quantized so the "
    "budget split is ONE integer division; selection reuses the "
    "md5-uniform32 tier with per-stratum thresholds broadcast back. "
    "One moments pass + a per-row selection expression.",
)
def neyman_allocation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import neyman_allocation

    o = t(spark, sf_dir, "orders")
    return neyman_allocation(
        o, "o_orderpriority",
        F.floor(F.col("o_totalprice")).cast("long"),
        "o_orderkey", budget=10_000,
    )
