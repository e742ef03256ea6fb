"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the arbitrary-stateful-processing surface (reference analog:
hand-rolled state inside reducers across incremental runs; Spark
analog of Flink's KeyedProcessFunction). The NEWER API
(``transformWithStateInPandas``) needs protobuf, absent in this
container — but ``applyInPandasWithState`` (Spark 3.4+) serializes
state through Arrow rows and works here, so the custom-state boundary
is REAL, not stubbed.

Scale shape: state is strictly per-key and fixed-width (a few numeric
fields — never row history); each micro-batch shuffles on the key once
(AQE is disabled for stateful queries, so size
``spark.sql.shuffle.partitions`` to the state-store parallelism you
want). Timeouts bound state lifetime for session-style operators.

Output-schema convention (r15, r14 ADVICE #3 swept as a class): echoed
KEY and INDEX columns derive their types from the input schema (the
batch twins accept arbitrary key types, so a long key round-trips
typed instead of silently casting); computed and sample columns keep
the monitors' declared long/double contract types — integer samples
upcast losslessly, and the long state fields they feed cannot lift.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_running_stats(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
):
    """Cross-batch running statistics per key: (n, total, vmax) carried
    in fixed-width group state, one UPDATED row emitted per key per
    micro-batch that touches it. The canonical custom-state shape —
    anything expressible as a monoid over per-key state (counters,
    CUSUM drift scores, rate limiters) slots into the same skeleton.

    Returns a streaming DataFrame (key, n, total, vmax); write with
    outputMode('update').
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total, vmax = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                n += int(len(vals))
                total += float(vals.sum())
                m = float(vals.max())
                vmax = m if vmax is None else max(vmax, m)
        state.update((n, total, vmax))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total], "vmax": [vmax]}
        )

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"`{key_col}` {dt[key_col]}, n long, total double, vmax double",
        stateStructType="n long, total double, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_debounce(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    quiet_ms: int,
):
    """Streaming debounce (burst-starter filter): per-key state carries
    the LAST SEEN event time across micro-batches; an event is emitted
    iff its gap from its per-key predecessor exceeds ``quiet_ms`` —
    exactly the lag semantics of the batch twin
    (``ops.timeseries.debounce``) whenever events ARRIVE in per-key
    event-time order across micro-batches (the replay regime the
    bridge test pins; cross-batch time-disordered arrival diverges —
    the same documented caveat as the dedup-anchoring bridge). Rows
    are sorted by event time WITHIN each micro-batch, so intra-batch
    disorder is absorbed; the load-bearing case is a burst SPLIT
    ACROSS micro-batches, which a stateless per-batch debounce would
    wrongly re-emit (asserted by the bridge test).

    State is ONE long per key — fixed width, this module's scale
    contract. Emits starter rows (key, ts_us epoch micros); write with
    outputMode('append')."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last = state.get[0] if state.exists else None
        batch_us: list[int] = []
        for pdf in pdfs:
            us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000
            batch_us.extend(int(v) for v in us)
        starters = []
        for us in sorted(batch_us):
            if last is None or us - last > quiet_ms * 1000:
                starters.append(us)
            last = us
        if batch_us:
            state.update((last,))
        if starters:
            yield pd.DataFrame({key_col: key[0], "ts_us": starters})

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"`{key_col}` {dt[key_col]}, ts_us long",
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ewma_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    rate_col: str,
    center_e6: int,
    h_e6: int = 100_000,
):
    """Live EWMA control monitor (λ = 1/2): per-key state carries
    (last grid index, Z); each arriving grain row advances Z by the
    textbook recursion Z ← (r + Z)/2, with GAP days first decaying Z
    toward the center one step per missing index — the same
    silent-days-shrink-history semantics as the batch chart
    (``ops.stats.ewma_chart``). The center is a PARAMETER (classic
    SPC: fixed from a reference period), where the batch chart pools
    it from the audited window — so on an in-order day-grain replay
    fed the batch pooled rate, the live Z tracks the batch ``ewma_e6``
    within the kernel-truncation bound 1e6·2^−window + 1 (the batch
    side cuts the kernel at ``window`` steps and assigns the tail to
    center; the recursion carries full history). The bridge test pins
    exactly that bound.

    State is (long, double) per key — fixed width. Input rows must be
    the GRAIN (one row per key per index, e.g. day → micro-rate), in
    per-key index order across micro-batches; rows are sorted by index
    within each batch. Emits (key, idx, ewma_e6 double, alarm_up,
    alarm_dn); write with outputMode('append')."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last, z = state.get if state.exists else (None, float(center_e6))
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), float(r))
                for i, r in zip(pdf[idx_col], pdf[rate_col])
            )
        out_idx, out_z = [], []
        for i, r in sorted(rows):
            if last is not None:
                for _ in range(max(0, i - last - 1)):
                    z = (float(center_e6) + z) / 2  # gap day
            z = (r + z) / 2
            last = i
            out_idx.append(i)
            out_z.append(z)
        if rows:
            state.update((last, z))
        if out_idx:
            yield pd.DataFrame({
                key_col: key[0],
                idx_col: out_idx,
                "ewma_e6": out_z,
                "alarm_up": [v > center_e6 + h_e6 for v in out_z],
                "alarm_dn": [v < center_e6 - h_e6 for v in out_z],
            })

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            "ewma_e6 double, "
            "alarm_up boolean, alarm_dn boolean"
        ),
        stateStructType="last_idx long, z double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_nelson_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    rate_col: str,
    min_trend: int = 6,
    min_alt: int = 14,
):
    """Live Nelson rules 3/4 monitor — the streaming twin of
    ``ops.stats.nelson_rules`` and the fifth live-engine bridge:
    per-key state carries (last_rate, last_dir, trend_len, alt_len) —
    four longs, fixed width — and each arriving grain row advances the
    EXACT integer recursion the batch replay pins: direction =
    sign(rate − last_rate), trend_len extends on an equal nonzero
    direction, alt_len on an opposite one, both reset to 1 on any
    other nonzero diff and to 0 on a tie. Unlike the EWMA bridge
    (float recursion, kernel-truncation bound) everything here is
    integer-exact, so on an in-order grain replay the live monitor
    matches the batch operator's direction/trend_len/alt_len/rule3/
    rule4 EXACTLY — the bridge test pins equality, not a bound.

    Input rows must be the GRAIN (one row per key per index, e.g.
    day → micro-rate) in per-key index order across micro-batches;
    rows are sorted by index within each batch (the stream_ewma /
    debounce arrival caveat). last_dir uses −2 as the
    "no previous diff" sentinel in the state store. Emits (key, idx,
    rate, direction, trend_len, alt_len, rule3, rule4); write with
    outputMode('append')."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last_rate, last_dir, tl, al = (
            state.get if state.exists else (None, -2, 0, 0)
        )
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), int(r))
                for i, r in zip(pdf[idx_col], pdf[rate_col])
            )
        out = {k: [] for k in
               ("idx", "rate", "direction", "trend_len", "alt_len")}
        for i, r in sorted(rows):
            if last_rate is None:
                d = None
                tl = al = 0
            else:
                d = (r > last_rate) - (r < last_rate)
                if d == 0:
                    tl = al = 0
                else:
                    tl = tl + 1 if last_dir == d else 1
                    al = al + 1 if last_dir == -d else 1
            last_rate, last_dir = r, (-2 if d is None else d)
            out["idx"].append(i)
            out["rate"].append(r)
            out["direction"].append(d)
            out["trend_len"].append(tl)
            out["alt_len"].append(al)
        if rows:
            state.update((last_rate, last_dir, tl, al))
        if out["idx"]:
            yield pd.DataFrame({
                key_col: key[0],
                idx_col: out["idx"],
                rate_col: out["rate"],
                "direction": pd.array(out["direction"], dtype="Int32"),
                "trend_len": out["trend_len"],
                "alt_len": out["alt_len"],
                "rule3": [v >= min_trend - 1 for v in out["trend_len"]],
                "rule4": [v >= min_alt - 1 for v in out["alt_len"]],
            })

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            f"`{rate_col}` long, "
            "direction int, trend_len long, alt_len long, "
            "rule3 boolean, rule4 boolean"
        ),
        stateStructType=(
            "last_rate long, last_dir long, trend_len long, alt_len long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_zone_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    n_col: str,
    x_col: str,
    center_num: int,
    center_den: int,
):
    """Live Nelson 5–8 zone monitor — the streaming twin of
    ``ops.stats.zone_rules`` and the sixth live-engine bridge. The
    rolling 3/5/8/15-point windows need the last 14 zone values of
    history, which still fits FIXED-WIDTH state by packing them as
    base-3 digits of two longs (beyond1 history: 14 trits < 3¹⁴ <
    2²³; beyond2 history: 2 trits) plus a row counter — no row-history
    state, the applyInPandasWithState discipline.

    The center line is a PARAMETER like the EWMA bridge's, but passed
    as the exact RATIO (``center_num``/``center_den`` = pooled
    defects/pooled rows) so the per-cell zone widths p̄ ± k·√(p̄(1−p̄)/n)
    reproduce the batch operator's float expression bit-for-bit (p̄ =
    num/den in one IEEE division — feeding a pre-divided double would
    round differently). Zone flags and all four rules are then
    integer-window counts, so on an in-order grain replay fed the
    batch pooled totals the live monitor matches zone_rules EXACTLY —
    the bridge test pins equality across a micro-batch split.

    Input rows are the GRAIN (one row per key per index: day → n, x)
    in per-key index order across micro-batches; rows sort by index
    within each batch. Emits (key, idx, n, x, rate_e6, beyond1,
    beyond2, within1, rule5, rule6, rule7, rule8); outputMode
    'append'."""
    import math

    pbar = float(center_num) / float(center_den)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        h1, h2, seen = state.get if state.exists else (0, 0, 0)
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), int(n), int(x))
                for i, n, x in zip(pdf[idx_col], pdf[n_col], pdf[x_col])
            )
        out = []
        for i, n, x in sorted(rows):
            if n <= 0:
                # Malformed grain row (the batch operator's grain always
                # has n >= 1, but the monitor ingests external rows):
                # dropping it here mirrors that invariant instead of
                # letting sqrt/ZeroDivisionError kill the whole query.
                continue
            sig = math.sqrt(pbar * (1.0 - pbar) / n)
            rate = x / n
            b2 = 1 if rate > pbar + 2.0 * sig else -1 if rate < pbar - 2.0 * sig else 0
            b1 = 1 if rate > pbar + sig else -1 if rate < pbar - sig else 0
            # decode prior history (newest at digit 0), truncated to the
            # rows actually seen — unseen digits decode as 0 trits and
            # would read as phantom −1 zones otherwise; windows include
            # the current point
            prior1 = []
            v = h1
            for _ in range(min(seen, 14)):
                prior1.append(v % 3 - 1)
                v //= 3
            prior2 = [h2 % 3 - 1, h2 // 3 % 3 - 1][: min(seen, 2)]
            w3 = [b2] + prior2[:2]
            w5 = [b1] + prior1[:4]
            w8 = [b1] + prior1[:7]
            w15 = [b1] + prior1[:14]
            seen += 1
            out.append({
                key_col: key[0], idx_col: i, n_col: n, x_col: x,
                "rate_e6": x * 1_000_000 // n,
                "beyond1": b1, "beyond2": b2, "within1": b1 == 0,
                "rule5": w3.count(1) >= 2 or w3.count(-1) >= 2,
                "rule6": w5.count(1) >= 4 or w5.count(-1) >= 4,
                "rule7": seen >= 15 and w15.count(0) == 15,
                "rule8": seen >= 8 and all(v != 0 for v in w8),
            })
            h1 = (h1 * 3 + (b1 + 1)) % (3 ** 14)
            h2 = (h2 * 3 + (b2 + 1)) % 9
        if rows:
            state.update((h1, h2, seen))
        if out:
            yield pd.DataFrame(out)

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            f"`{n_col}` long, `{x_col}` long, "
            "rate_e6 long, beyond1 int, beyond2 int, within1 boolean, "
            "rule5 boolean, rule6 boolean, rule7 boolean, rule8 boolean"
        ),
        stateStructType="hist1 long, hist2 long, seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_inactivity_sessions(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int,
):
    """Session finalization by PROCESSING-TIME inactivity: per-key state
    accumulates (n_events, first_ts, last_ts); when a key receives no
    data for ``gap_ms``, the timeout fires and the CLOSED session is
    emitted, state cleared — the custom-state twin of session_window
    for pipelines that must emit exactly one row per finished session
    (e.g. a billing close, an ingest-manifest seal).

    Returns a streaming DataFrame (key, n_events, first_ts, last_ts)
    of closed sessions only; write with outputMode('append').

    Driving note: processing-time timeouts make the engine self-trigger
    micro-batches to evaluate them, so ``processAllAvailable()`` NEVER
    settles on such a query — drive it with sleep+poll (tests) or just
    let it run (production, where continuous triggers are the point).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "first_ts": [first_ts],
                    "last_ts": [last_ts],
                }
            )
            return
        n, first_ts, last_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000  # epoch ms
            if len(ts):
                n += int(len(ts))
                lo, hi = int(ts.min()), int(ts.max())
                first_ts = lo if first_ts is None else min(first_ts, lo)
                last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(gap_ms)
        # no emission while the session is open (the timeout branch above
        # already makes this function a generator)
        return

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"`{key_col}` {dt[key_col]}, n_events long, first_ts long, last_ts long",
        stateStructType="n_events long, first_ts long, last_ts long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_runs_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    n_col: str,
    x_col: str,
    center_num: int,
    center_den: int,
):
    """Live Wald–Wolfowitz runs census — the streaming twin of
    ``ops.stats.runs_test`` and the seventh live-engine bridge. Where
    ``durbin_watson`` has NO exact twin (its global second moment
    makes every emitted term retroactive — the declared non-bridge in
    SCALING.md), the runs census is a pure per-key recursion over
    FIXED-WIDTH state once the center line is a parameter (the
    zone/nelson convention: pass the batch pooled totals, here as the
    exact RATIO so p̄ = num·10⁶ div den reproduces the batch flooring
    BIGINT center bit-for-bit): five longs — n_pos, n_neg, n_zero,
    n_runs, last_side — advance by integer comparisons only, so the
    emitted census AT EVERY POINT equals batch ``runs_test`` run over
    exactly that prefix. The bridge test pins per-prefix EXACT
    equality (integer columns, no tolerance) across a micro-batch
    split.

    Semantics mirror the batch operator: side = sign(rate_e6 − p̄) on
    exact flooring micro-rates; side-0 rows increment ``n_zero`` only
    and do NOT update last_side (the batch drops them BEFORE run
    counting, so a center-line day between two same-side days must
    not break the run); malformed rows with n ≤ 0 are dropped (the
    stream_zone_monitor quarantine guard). ``z_num`` = R·m − 2n₁n₂ −
    m rides along exactly; the float z is left to the consumer (one
    flat expression off the exact census — keeping the bridge
    contract all-integer).

    Input rows are the GRAIN (one row per key per index: day → n, x)
    in per-key index order across micro-batches; rows sort by index
    within each batch. Emits (key, idx, n, x, side, n_pos, n_neg,
    n_zero, n_runs, z_num); outputMode 'append'. last_side uses 0 as
    the "no sided point yet" sentinel (a real side is ±1)."""
    pbar = center_num * 1_000_000 // center_den

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n_pos, n_neg, n_zero, n_runs, last_side = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), int(n), int(x))
                for i, n, x in zip(pdf[idx_col], pdf[n_col], pdf[x_col])
            )
        out = []
        for i, n, x in sorted(rows):
            if n <= 0:
                continue  # malformed external grain row — quarantine
            rate = x * 1_000_000 // n
            side = (rate > pbar) - (rate < pbar)
            if side == 0:
                n_zero += 1
            else:
                if side == 1:
                    n_pos += 1
                else:
                    n_neg += 1
                if side != last_side:
                    n_runs += 1
                last_side = side
            m = n_pos + n_neg
            out.append({
                key_col: key[0], idx_col: i, n_col: n, x_col: x,
                "side": side, "n_pos": n_pos, "n_neg": n_neg,
                "n_zero": n_zero, "n_runs": n_runs,
                "z_num": n_runs * m - 2 * n_pos * n_neg - m,
            })
        if rows:
            state.update((n_pos, n_neg, n_zero, n_runs, last_side))
        if out:
            yield pd.DataFrame(out)

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            f"`{n_col}` long, `{x_col}` long, "
            "side int, n_pos long, n_neg long, n_zero long, n_runs long, "
            "z_num long"
        ),
        stateStructType=(
            "n_pos long, n_neg long, n_zero long, n_runs long, "
            "last_side long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_benford_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    v_col: str,
):
    """Live Benford first-digit census — the eighth live-engine
    bridge. It passes the boundary test the runs/durbin_watson pair
    documents: the state is FIXED-WIDTH (nine longs, one per first
    digit) and the reference distribution log10(1+1/d) is a CONSTANT,
    not a stream-estimated parameter, so no emitted term is ever
    retroactive — the census at every point equals the batch
    ``benford_price_audit`` digit counts over exactly that prefix,
    integer-exactly.

    Semantics mirror the batch gate: digit = first character of
    CAST(FLOOR(v) AS BIGINT) as a string; rows with v < 1 (or
    NULL/non-finite) are dropped exactly as the batch ``>= 1`` filter
    drops them — counted in nothing. The chi-squared screen stays a
    flat consumer expression off the exact census (the runs-z
    convention: the bridge contract is all-integer; the float is one
    deterministic expression away).

    Input rows are the GRAIN (one row per key per index) in per-key
    index order across micro-batches; rows sort by index within each
    batch. Emits (key, idx, digit, d1..d9, n_total); outputMode
    'append'."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import math

        counts = list(state.get) if state.exists else [0] * 9
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), None if v is None else float(v))
                for i, v in zip(pdf[idx_col], pdf[v_col])
            )
        out = []
        for i, v in sorted(rows, key=lambda r: r[0]):
            if v is None or not math.isfinite(v) or v < 1:
                continue  # the batch gate's >= 1 filter, mirrored
            digit = int(str(int(math.floor(v)))[0])
            counts[digit - 1] += 1
            out.append({
                key_col: key[0], idx_col: i, "digit": digit,
                **{f"d{d}": counts[d - 1] for d in range(1, 10)},
                "n_total": sum(counts),
            })
        if rows:
            state.update(tuple(counts))
        if out:
            yield pd.DataFrame(out)

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, digit int, "
            + ", ".join(f"d{d} long" for d in range(1, 10))
            + ", n_total long"
        ),
        stateStructType=", ".join(f"d{d} long" for d in range(1, 10)),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cdc_net_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    op_col: str,
    v_col: str,
):
    """Live CDC minimal-changelog compaction — the NINTH live bridge,
    the streaming twin of ``ops.cdc.cdc_net_changes``. It passes the
    boundary test the runs/durbin_watson pair defines: per-key state
    is FIXED-WIDTH (first_op fixes once on the key's first row;
    last_op/last value simply overwrite; three counters advance
    monotonically) and the net rule is a pure function of
    (first_op, last_op, last value) — no emitted term is ever
    retroactive, so the LATEST emitted row per key equals the batch
    operator's row for that key over exactly that prefix,
    integer-exactly (or reports net_op='X' exactly when the batch
    emits NO row — the I..D born-and-deleted case; downstream reads
    'X' as "drop the key from the changeset", the append-mode
    encoding of a retracted net row).

    Semantics mirror the batch operator; ONE honest divergence,
    documented: the batch fn RAISES on an op outside I/U/D (fused
    into its single scan since r14; surfaces on the first action),
    but a live query cannot die per malformed row —
    unknown-op rows quarantine (counted in nothing), the
    stream_zone_monitor convention. The bridge test pins the valid-op
    equality AND the quarantine separately.

    Input rows are the GRAIN (one row per key per change index) in
    per-key index order across micro-batches; rows sort by index
    within each batch. Emits (key, idx, op, net_op, n_changes,
    first_idx, last_idx, last_v); outputMode 'append'."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            first_op, last_op, last_v, n_changes, first_idx, last_idx = (
                state.get
            )
        else:
            first_op, last_op, last_v = "", "", None
            n_changes, first_idx, last_idx = 0, 0, 0
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), str(op), None if pd.isna(v) else int(v))
                for i, op, v in zip(pdf[idx_col], pdf[op_col], pdf[v_col])
            )
        out = []
        for i, op, v in sorted(rows, key=lambda r: r[0]):
            if op not in ("I", "U", "D"):
                continue  # malformed row — quarantine (batch raises)
            if n_changes == 0:
                first_idx = i
                first_op = op
            last_op = op
            last_idx = i
            if op != "D":
                # carried verbatim, NULL included — the batch max_by
                # carries the last row's value whatever it is
                last_v = v
            n_changes += 1
            if first_op == "I" and last_op == "D":
                net = "X"  # batch emits NO row for this key
            elif first_op == "I":
                net = "I"
            elif last_op == "D":
                net = "D"
            else:
                net = "U"
            out.append({
                key_col: key[0], idx_col: i, op_col: op, "net_op": net,
                "n_changes": n_changes, "first_idx": first_idx,
                "last_idx": last_idx,
                # NULL value on net deletes / vanished keys, exactly
                # like the batch operator's value columns
                "last_v": None if net in ("D", "X") else last_v,
            })
        if rows:
            state.update(
                (first_op, last_op, last_v, n_changes, first_idx, last_idx)
            )
        if out:
            yield pd.DataFrame(out)

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            f"`{op_col}` {dt[op_col]}, "
            "net_op string, n_changes long, first_idx long, "
            "last_idx long, last_v long"
        ),
        stateStructType=(
            "first_op string, last_op string, last_v long, "
            "n_changes long, first_idx long, last_idx long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cusum_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    n_col: str,
    x_col: str,
    center_num: int,
    center_den: int,
    slack_e6: int = 0,
    h_e6: int = 5_000_000,
):
    """Live two-sided tabular CUSUM — the TENTH live bridge and the
    streaming twin of ``ops.stats.cusum_chart``, completing the SPC
    family live: zone/nelson flag single excursions and patterns,
    EWMA the slow drift, runs the randomness, and CUSUM the SUSTAINED
    small shift a publish loop would otherwise ship for weeks. It
    passes the boundary test the runs/durbin_watson pair defines:
    once the center line is a parameter (the batch pooled totals as
    the exact RATIO, so p̄ = num·10⁶ div den reproduces the batch
    flooring BIGINT center bit-for-bit — the runs-monitor
    convention), the recursion C_t = max(0, C_{t−1} + s_t) advances
    two longs by integer arithmetic only; no emitted term is ever
    retroactive, so the emitted chart AT EVERY POINT equals batch
    ``cusum_chart`` run over exactly that prefix, integer-exactly —
    even though the batch computes it as a closed-form prefix-sum
    identity and the stream as the literal recursion (the bridge test
    pins the two formulations against each other, which is itself a
    proof the closed form is right).

    Semantics mirror the batch operator: s_up = x·10⁶ − n·(p̄+slack),
    s_dn = n·(p̄−slack) − x·10⁶, exact BIGINT micro-counts; alarms
    fire strictly above ``h_e6``. Malformed rows with n ≤ 0 are
    dropped (the zone-monitor quarantine). Same integer bound as the
    batch twin: the accumulators reach ~1e6·Σn under sustained
    one-sided drift (Python side is exact bignum, but the long state
    field caps at 2⁶³) — reset on alarm at that scale; the recorded
    r14 ruling (SCALING.md) keeps BOTH twins on BIGINT so the bridge
    contract stays symmetric. Same argument validation
    as the batch fn (slack ≥ 0, h > 0) — misconfiguration fails at
    construction, not per row.

    Input rows are the GRAIN (one row per key per index: day → n, x)
    in per-key index order across micro-batches; rows sort by index
    within each batch. Emits (key, idx, n, x, cusum_up_e6,
    cusum_dn_e6, alarm_up, alarm_dn); outputMode 'append'."""
    if slack_e6 < 0:
        raise ValueError(f"slack_e6 must be >= 0, got {slack_e6}")
    if h_e6 <= 0:
        raise ValueError(f"h_e6 must be > 0, got {h_e6}")
    pbar = center_num * 1_000_000 // center_den

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        up, dn = state.get if state.exists else (0, 0)
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), int(n), int(x))
                for i, n, x in zip(pdf[idx_col], pdf[n_col], pdf[x_col])
            )
        out = []
        for i, n, x in sorted(rows):
            if n <= 0:
                continue  # malformed external grain row — quarantine
            up = max(0, up + x * 1_000_000 - n * (pbar + slack_e6))
            dn = max(0, dn + n * (pbar - slack_e6) - x * 1_000_000)
            out.append({
                key_col: key[0], idx_col: i, n_col: n, x_col: x,
                "cusum_up_e6": up, "cusum_dn_e6": dn,
                "alarm_up": up > h_e6, "alarm_dn": dn > h_e6,
            })
        if rows:
            state.update((up, dn))
        if out:
            yield pd.DataFrame(out)

    dt = dict(stream_df.dtypes)
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            f"`{n_col}` long, `{x_col}` long, "
            "cusum_up_e6 long, cusum_dn_e6 long, "
            "alarm_up boolean, alarm_dn boolean"
        ),
        stateStructType="cusum_up long, cusum_dn long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cms_monitor(
    stream_df: DataFrame,
    key_col: str,
    idx_col: str,
    elem_col: str,
    depth: int = 4,
    width: int = 64,
):
    """Live Count-Min sketch maintenance — the ELEVENTH live bridge,
    extending the bridge family to the SKETCH tier. It passes the
    boundary test trivially and by construction: CMS counters only
    ADD (sum-merge is monotone — the cleanest possible "no emitted
    term is ever retroactive"), and the cell HASHING never enters
    Python at all — the stream pre-projects (row, pos) with the SAME
    JVM expression the batch build uses (``agg.sketches.cms_cell_pos``
    — one shared definition, so stream and batch cannot disagree on
    where an element lands), and the stateful operator's only job is
    integer increments over a bounded counter map.

    Emits one row per (element, hash row): (key, idx, row, pos, cnt)
    with cnt the counter value AFTER that element — a live MERGE-feed
    (the stream_cdc_net_monitor convention): a downstream that applies
    the LATEST cnt per (key, row, pos) holds, at any moment, exactly
    the sketch batch ``cms_partial`` would build over that prefix,
    integer-exactly — point estimates (``cms_estimate``) and
    counter-sum merges (``cms_rollup``) run on the materialized cells
    unchanged. State per key is the touched-cell map, bounded by
    depth·width longs regardless of stream length (two parallel
    arrays in the Arrow state). NULL elements hash like the batch
    build hashes them (same expression — dropped rows would diverge).

    Input rows are the GRAIN (one row per key per element index) in
    per-key index order across micro-batches; rows sort by index
    within each batch. Key and index output fields carry the INPUT
    schema's types (derived from ``stream_df.dtypes``, the
    wordpiece_encode id_col convention — r14 ADVICE #3: the batch twin
    ``cms_partial`` accepts arbitrary ``group_cols`` types, so a
    hardcoded string/long here silently cast or mismatched at
    runtime); the index must still be integral (emissions sort by it).
    outputMode 'append'."""
    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.agg.sketches import cms_cell_pos

    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    dt = dict(stream_df.dtypes)
    cells = stream_df.select(
        key_col,
        idx_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        F.col(elem_col).alias("__e"),
    ).select(
        key_col,
        idx_col,
        "row",
        cms_cell_pos("row", "__e", width).alias("pos"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            cell_ids, cnts = state.get
            counters = dict(zip(cell_ids, cnts))
        else:
            counters = {}
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), int(r), int(p))
                for i, r, p in zip(pdf[idx_col], pdf["row"], pdf["pos"])
            )
        out = []
        for i, r, p in sorted(rows):
            cell = r * width + p
            counters[cell] = counters.get(cell, 0) + 1
            out.append({
                key_col: key[0], idx_col: i, "row": r, "pos": p,
                "cnt": counters[cell],
            })
        if rows:
            ks = sorted(counters)
            state.update((ks, [counters[k] for k in ks]))
        if out:
            yield pd.DataFrame(out)

    return cells.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"`{key_col}` {dt[key_col]}, `{idx_col}` {dt[idx_col]}, "
            "row int, pos int, cnt long"
        ),
        stateStructType="cell_ids array<long>, cnts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
