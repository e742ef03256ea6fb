"""Data-validation / expectations operators.

The data-quality gate of a production pipeline: declarative rules
evaluated in as few passes as the rule mix allows, emitting a long-format
violations report (rule, violations) a scheduler can assert on. The
reference analog is counter-based record validation inside mappers
(Counters + the SortValidator RECORD_CHECKER idiom,
``jobclient/.../SortValidator.java:54``) — re-expressed declaratively so
Catalyst fuses every per-row rule into ONE aggregation over ONE scan.

Scale shapes:
- ``check_rows``: all per-row predicates → one scan, one agg row,
  unpivoted. Zero shuffle beyond the final single-row agg.
- ``check_unique``: violations = n_rows − n_distinct(key) — two partial
  aggregates, no row explosion.
- ``check_foreign_key``: left-anti join child→parent on the key;
  broadcast-eligible when the parent is a dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_NOTE = "rule string, violations long"


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate per-row violation predicates (True = violation) in one
    pass. Returns (rule, violations) with one row per rule, in rule
    order."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [
        F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, violations)"
    )


def check_unique(df: DataFrame, key_cols: list[str], rule_name: str | None = None) -> DataFrame:
    """Uniqueness expectation: violations = rows beyond the first per
    duplicated key (n_rows − n_distinct keys)."""
    name = rule_name or f"unique({','.join(key_cols)})"
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols]))
        .cast("long")
        .alias("violations")
    ).select(F.lit(name).alias("rule"), "violations")


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule_name: str | None = None,
) -> DataFrame:
    """Referential expectation: child rows whose key has no parent
    (NULL child keys are orphans too, matching FK-with-NOT-NULL
    semantics — filter first for nullable FKs)."""
    name = rule_name or f"fk({child_key}->{parent_key})"
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(name).alias("rule"), "violations"
    )


def validation_report(*checks: DataFrame) -> DataFrame:
    """Union per-check reports into one (rule, violations) frame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def profile_table(df: DataFrame, cols: list[str] | None = None, exact: bool = False) -> DataFrame:
    """ANALYZE-style column profile in ONE aggregation pass: per column
    (column, n_rows, n_nulls, n_distinct) in long format — the
    stats a planner, a data-quality monitor, or a schema-drift alert
    reads first.

    exact=False (default, the 100 TB setting) estimates distincts with
    HLL (approx_count_distinct: single pass, no Expand); exact=True uses
    count(DISTINCT) — Catalyst compiles multiple exact distincts into an
    Expand (rows × columns blowup), acceptable for bounded profiling
    runs and required when the numbers feed an exact oracle.
    """
    cols = cols or df.columns
    d = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nulls_{c}"))
        aggs.append(d(c).cast("long").alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [f"'{c}'", f"__nulls_{c}", f"__dist_{c}"]
    return row.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("__n").cast("long").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def schema_diff(old: "DataFrame", new: "DataFrame") -> list[dict]:
    """Schema-evolution audit between two table versions: one entry per
    changed column — added / dropped / type_changed / nullability —
    driver-side metadata only (no job runs). The pre-flight check an
    ingestion pipeline runs before appending a new batch to an existing
    dataset (reference analog: the SequenceFile key/value class check,
    SequenceFile.Reader.getKeyClass — schema agreement was a runtime
    crash there, a report here).

    Returns a list of dicts sorted by column name:
    {column, status, old_type, new_type}."""
    a = {f.name: f for f in old.schema.fields}
    b = {f.name: f for f in new.schema.fields}
    out = []
    for name in sorted(a.keys() | b.keys()):
        fa, fb = a.get(name), b.get(name)
        if fa is None:
            out.append({"column": name, "status": "added",
                        "old_type": None, "new_type": fb.dataType.simpleString()})
        elif fb is None:
            out.append({"column": name, "status": "dropped",
                        "old_type": fa.dataType.simpleString(), "new_type": None})
        elif fa.dataType != fb.dataType:
            out.append({"column": name, "status": "type_changed",
                        "old_type": fa.dataType.simpleString(),
                        "new_type": fb.dataType.simpleString()})
        elif fa.nullable != fb.nullable:
            out.append({"column": name, "status": "nullability_changed",
                        "old_type": fa.dataType.simpleString(),
                        "new_type": fb.dataType.simpleString()})
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy audit before a data release: k-anonymity and l-diversity
    over the quasi-identifier combination (Sweeney; Machanavajjhala et
    al.) — the check a training-data pipeline runs before shipping
    user-adjacent tables. k-anonymity = the SMALLEST equivalence class
    (rows sharing all quasi-identifier values): any class below k
    re-identifies its members by linkage. l-diversity = the smallest
    number of distinct sensitive values within a class: a class can be
    large yet leak the sensitive attribute if it's homogeneous.

    One aggregation to the equivalence-class grain (quasi-cols →
    count + distinct sensitive count, map-side combined), then one
    scalar aggregation over class rows. All exact BIGINTs; at-risk
    share by integer division. Output: 1 row (n_rows, n_classes,
    k_anonymity, l_diversity, classes_below_k, rows_below_k,
    rows_below_k_share_e6)."""
    from hadoop_fcfs_spark.caching import waypoint

    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    classes = waypoint(
        df.groupBy(*quasi_cols).agg(
            F.count("*").cast("long").alias("__c"),
            F.countDistinct(sensitive_col).cast("long").alias("__l"),
        )
    )
    return classes.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("__c").cast("long").alias("k_anonymity"),
        F.min("__l").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("__c") < k, 1).otherwise(0)).cast("long")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("__c") < k, F.col("__c")).otherwise(0)).cast("long")
        .alias("rows_below_k"),
    ).select(
        "*",
        # DECIMAL(38,0) numerator: 1e6·rows is BIGINT-unsafe past
        # ~9.2e12 rows (the kendall/fertility remedy, r13)
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * rows_below_k) div n_rows"
        ).cast("long").alias("rows_below_k_share_e6"),
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness release audit (Li/Li/Venkatasubramanian): for each
    quasi-identifier equivalence class, the ordered Earth-Mover
    Distance between the class's distribution of the ORDERED sensitive
    attribute and the global one — the escalation beyond
    :func:`k_anonymity_audit`'s l-diversity (a class can be l-diverse
    yet still leak when its sensitive values skew far from the
    population; t-closeness bounds exactly that). Ordered-attribute
    EMD = (1/(m−1))·Σᵢ |Σ_{j≤i}(p_j − q_j)| over the m global
    sensitive buckets.

    Evaluation is on the DENSE (class × global-bucket) grid (the
    ks_source_drift lesson — buckets a class MISSES are where it
    diverges). Per-bucket deviations are exact integer
    cross-multiplications c_j·N − g_j·n_c; their running sum stays
    BIGINT (bound m·n_c·N < 2⁶³); only the final |·| accumulation and
    one division are doubles over the bounded bucket grid (MI
    precedent), rounded to 6. Classes with m = 1 report 0 (a single
    global bucket cannot diverge).

    Scale shape: one class×bucket aggregation, tiny bucket/class
    rollups broadcast into the dense grid, one partition-bounded
    cumulative per class over ≤m bucket rows (class-key windows over
    the GRID, never data rows), one class-grain reduce.

    Output: (*qi_cols, n_class, t_emd_r6)."""
    from pyspark.sql import Window

    base = df.filter(F.col(sensitive_col).isNotNull()).select(
        *[F.col(c) for c in qi_cols], F.col(sensitive_col).alias("__s")
    )
    for c in qi_cols:
        base = base.filter(F.col(c).isNotNull())
    cb = base.groupBy(*qi_cols, "__s").agg(
        F.count("*").cast("long").alias("__c")
    )
    buckets = cb.groupBy("__s").agg(F.sum("__c").cast("long").alias("__g"))
    classes = cb.groupBy(*qi_cols).agg(
        F.sum("__c").cast("long").alias("__nc")
    )
    tot = buckets.agg(
        F.sum("__g").cast("long").alias("__n"),
        F.count("*").cast("long").alias("__m"),
    )
    grid = (
        classes.crossJoin(F.broadcast(buckets))
        .crossJoin(F.broadcast(tot))
        .join(cb, [*qi_cols, "__s"], "left")
        .fillna({"__c": 0})
    )
    w = Window.partitionBy(*qi_cols).orderBy("__s")
    dev = grid.withColumn(
        "__cum",
        F.sum(F.col("__c") * F.col("__n") - F.col("__g") * F.col("__nc")).over(
            w
        ),
    )
    return (
        dev.groupBy(*qi_cols)
        .agg(
            F.max("__nc").alias("n_class"),
            F.max("__m").alias("__mm"),
            F.max(F.col("__nc").cast("double") * F.col("__n").cast("double"))
            .alias("__den"),
            # the m-th (last) cumulative is identically 0; summing |cum|
            # over ALL m rows therefore equals the sum over the first
            # m-1, keeping the expression one aggregation
            F.sum(F.abs(F.col("__cum")).cast("double")).alias("__absum"),
        )
        .selectExpr(
            *qi_cols, "n_class",
            "CASE WHEN __mm > 1 THEN"
            " ROUND(__absum / __den / (__mm - 1), 6)"
            " ELSE 0.0 END AS t_emd_r6",
        )
    )


def fd_violations(
    df: DataFrame, lhs_cols: list[str], rhs_col: str
) -> DataFrame:
    """Functional-dependency audit: how far is the data from
    satisfying LHS → RHS — the g3-style violation count (minimum rows
    to delete so every LHS value maps to ONE RHS value:
    Σ_x (n_x − max_y n_xy)), the profiling check under every "this
    column should be derivable" assumption (a natural key that isn't,
    a denormalized dim gone stale, a scraped field that drifted).
    Complements check_unique (exact-key uniqueness) and
    check_foreign_key (containment): this measures DETERMINATION.

    One map-side-combined pass to the (LHS, RHS) grain; per-LHS max
    and sum re-aggregate the grain (never the data); all counts exact
    BIGINT with one flooring micro division. NULL LHS rows are
    excluded (no determination claim without a key); NULL RHS counts
    as a value (a key mapping to both NULL and 'x' IS a violation).
    Output: 1 row (n_rows, n_keys, n_violating_keys, n_violations,
    violation_micro)."""
    if not lhs_cols:
        raise ValueError("fd_violations needs at least one LHS column")
    keep = df
    for c in lhs_cols:
        keep = keep.filter(F.col(c).isNotNull())
    grain = keep.groupBy(
        *[F.col(c) for c in lhs_cols],
        F.col(rhs_col).alias("__y"),
    ).agg(F.count("*").cast("long").alias("__nxy"))
    per_key = grain.groupBy(*[F.col(c) for c in lhs_cols]).agg(
        F.sum("__nxy").cast("long").alias("__nx"),
        F.max("__nxy").cast("long").alias("__mx"),
    )
    return per_key.agg(
        F.sum("__nx").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(F.col("__nx") > F.col("__mx"), 1).otherwise(0))
        .cast("long")
        .alias("n_violating_keys"),
        F.sum(F.col("__nx") - F.col("__mx")).cast("long").alias("n_violations"),
    ).selectExpr(
        "n_rows", "n_keys", "n_violating_keys", "n_violations",
        "CASE WHEN n_rows > 0 THEN"
        " CAST(n_violations * 1000000 div n_rows AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS violation_micro",
    )
