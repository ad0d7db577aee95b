"""Interleaved A/B of candidate SQL confs (r6): same JVM, alternating the
conf set per repetition, paired per-query ratios. Usage:

    AB_CONF='spark.sql.join.preferSortMergeJoin=false,spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=134217728' \
        python scripts/ab_conf_r06.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "6"))
CONF = dict(
    kv.split("=", 1)
    for kv in os.environ.get(
        "AB_CONF", "spark.sql.join.preferSortMergeJoin=false"
    ).split(",")
)

QUERIES = os.environ.get(
    "AB_QUERIES",
    "pricing_summary,revenue_by_nation,brand_part_agg,"
    "customers_without_orders,top_line_per_order,last_purchase_before,"
    "word_freq_top20,doc_token_counts,ngram_jaccard_dups,minhash_lsh_dups,"
    "simhash_near_dups,embedding_ann_ivf,embedding_ann_lsh,"
    "inverse_property_swap",
).split(",")


def main() -> int:
    from lk_data_test_spark import entry_queries as eq
    from lk_data_test_spark.session import get_spark

    spark = get_spark("r06-ab-conf", cores=CPUS, driver_memory="24g")
    base = {k: spark.conf.get(k, None) for k in CONF}
    print(f"base values: {base}", file=sys.stderr)

    def apply(on: bool):
        for k, v in CONF.items():
            if on:
                spark.conf.set(k, v)
            elif base[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, base[k])

    for on in (True, False):
        apply(on)
        for q in QUERIES:
            eq.Q[q](spark, SF_DIR).count()

    times: dict[str, dict[bool, list[float]]] = {
        q: {True: [], False: []} for q in QUERIES
    }
    for rep in range(REPS):
        for on in (True, False) if rep % 2 == 0 else (False, True):
            apply(on)
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"ab conf={on} {q}")
                t0 = time.time()
                eq.Q[q](spark, SF_DIR).count()
                times[q][on].append(round(time.time() - t0, 3))

    out = {}
    tot_on = tot_off = 0.0
    for q in QUERIES:
        a, b = times[q][True], times[q][False]
        ratios = sorted(x / y for x, y in zip(a, b))
        out[q] = {
            "on_med": statistics.median(a),
            "off_med": statistics.median(b),
            "paired_ratio_med": round(statistics.median(ratios), 3),
        }
        tot_on += statistics.median(a)
        tot_off += statistics.median(b)
        print(
            f"{q}: on={statistics.median(a):.3f} off={statistics.median(b):.3f} "
            f"ratio={statistics.median(ratios):.3f}",
            file=sys.stderr,
        )
    print(f"TOTAL median: on={tot_on:.2f} off={tot_off:.2f}", file=sys.stderr)
    print(json.dumps({"conf": CONF, "load": os.getloadavg(), "ab": out,
                      "total_on": round(tot_on, 2),
                      "total_off": round(tot_off, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
