"""Interleaved A/B of the _t() scan fan-out (r6): same JVM, alternating
variant per repetition, paired per-query ratios — host-load-robust (the
round-5 adjudication methodology)."""

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

    spark = get_spark("r06-ab-fanout", cores=CPUS, driver_memory="24g")

    # warm both variants once per query
    for on in (True, False):
        eq._FAN_ENABLED = on
        for q in QUERIES:
            eq.Q[q](spark, SF_DIR).count()

    times: dict[str, dict[bool, list[float]]] = {
        q: {True: [], False: []} for q in QUERIES
    }
    for rep in range(REPS):
        for on in (True, False) if rep % 2 == 0 else (False, True):
            eq._FAN_ENABLED = on
            for q in QUERIES:
                spark.sparkContext.setJobDescription(
                    f"ab fan={on} rep={rep} {q}"
                )
                t0 = time.time()
                eq.Q[q](spark, SF_DIR).count()
                times[q][on].append(round(time.time() - t0, 3))

    out = {}
    for q in QUERIES:
        a = times[q][True]
        b = times[q][False]
        ratios = sorted(x / y for x, y in zip(a, b))
        out[q] = {
            "fan_on_med": statistics.median(a),
            "fan_off_med": statistics.median(b),
            "paired_ratio_med": round(statistics.median(ratios), 3),
            "on": a,
            "off": b,
        }
        print(
            f"{q}: on={statistics.median(a):.3f} off={statistics.median(b):.3f} "
            f"ratio={statistics.median(ratios):.3f}",
            file=sys.stderr,
        )
    print(json.dumps({"load": os.getloadavg(), "ab": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
