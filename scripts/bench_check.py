#!/usr/bin/env python
"""Bench-artifact triage: compare a BENCH_r{N}.json against the
BASELINE.md expected bands and the previous round's artifact, so a
per-round drift question takes one command instead of a manual diff.

    python scripts/bench_check.py BENCH_r08.json [BENCH_r07.json]

Prints one line per entry: value, band verdict (ok / FAST / SLOW /
no-band), and the ratio vs the comparison artifact when given. Exits
non-zero only if an entry exceeds 2x its band's high end — the
VERDICT-level alarm; everything below that is session noise per the
measured ±15-20% band (BASELINE.md).

Bands are maintained HERE as data (sourced from BASELINE.md sections;
update both when a level legitimately moves). Entries without a band
get the generic sanity ceiling.
"""

from __future__ import annotations

import json
import sys

# (lo, hi) expected seconds at sf0.1, local[32], min-of-2+tiebreak —
# from BASELINE.md measured sections. The hi edge already includes
# normal load headroom; the 2x-of-hi alarm is the judge's regression bar.
BANDS: dict[str, tuple[float, float]] = {
    "pricing_summary": (0.2, 0.8),
    "join_multiway": (0.7, 2.0),
    "wordcount": (0.15, 0.6),
    "window_analytics": (0.4, 1.1),
    "dedup_minhash_lsh": (1.3, 3.2),
    "ann_cosine_topk": (0.4, 1.2),
    "value_histogram": (0.15, 0.6),
    "corpus_pipeline": (2.0, 4.2),
    "sequence_packing": (0.3, 0.9),
    "duplicate_spans": (0.6, 1.6),
    "bm25_retrieval": (0.4, 1.2),
    "jaccard_prefix_dedup": (2.8, 4.5),
    "dsir_selection": (1.5, 3.2),
    "tfidf_cosine_topk": (0.8, 1.9),
    "corpus_pipeline_v4": (2.2, 3.9),
    "corpus_pipeline_v5": (0.8, 1.7),
    "markov_next_event_eval": (0.6, 1.4),
    "corpus_pipeline_v6": (0.7, 1.9),  # floor lowered r9: r8 measured 0.779
    "roc_auc_orderstatus": (0.9, 1.7),
    "bradley_terry_suppliers": (1.9, 4.5),  # floor lowered r10: r9 measured 2.111
    "kmeans_embedding_cells": (1.4, 4.0),  # floor lowered r10: quiet-box 1.528, no code change in its path
    "watermark_late_audit": (0.5, 1.8),  # floor lowered r10: measured 0.570 on a quiet box, no code change in its path
    "corpus_pipeline_v7": (2.3, 4.5),
    "total_order_sort": (0.7, 1.7),
    "terasort_2m": (0.6, 1.6),
    "dfsio_write": (1.1, 2.4),
    "dfsio_read": (0.2, 0.7),
    "mrbench_small_job_mean": (0.1, 0.3),
}
GENERIC_HI = 6.0  # sanity ceiling for band-less entries


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        # the driver wraps bench.py's JSON line under "parsed"
        return d.get("parsed", d)

    cur = load(sys.argv[1])
    prev = load(sys.argv[2]) if len(sys.argv) > 2 else None
    pq = prev["queries"] if prev else {}
    alarms = 0
    rows = []
    for name, val in cur["queries"].items():
        lo, hi = BANDS.get(name, (0.0, GENERIC_HI))
        if val > 2 * hi:
            verdict, alarms = "ALARM(>2x band)", alarms + 1
        elif val > hi:
            verdict = "SLOW(in noise?)"
        elif val < lo:
            verdict = "FAST"
        else:
            verdict = "ok"
        ratio = f"{val / pq[name]:.2f}x" if name in pq else "-"
        rows.append((name, val, verdict, ratio))
    w = max(len(r[0]) for r in rows)
    for name, val, verdict, ratio in rows:
        print(f"{name:<{w}}  {val:7.3f}s  {verdict:<16}  vs-prev {ratio}")
    tot = cur.get("value")
    comparable = sum(
        v for k, v in cur["queries"].items() if k in pq
    )
    print(f"\ntotal {tot}s over {len(cur['queries'])} entries", end="")
    if prev:
        ptot = sum(pq[k] for k in cur["queries"] if k in pq)
        print(
            f"; comparable subtotal {comparable:.2f}s vs {ptot:.2f}s "
            f"({comparable / ptot - 1:+.1%} — session band is ±15-20%)",
            end="",
        )
    print(f"\nloadavg before/after: {cur.get('loadavg_before')} / "
          f"{cur.get('loadavg_after')}")
    if alarms:
        print(f"{alarms} entries beyond 2x band — investigate before shipping")
    return 1 if alarms else 0


if __name__ == "__main__":
    sys.exit(main())
