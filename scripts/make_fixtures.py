"""Regenerate the checked-in golden fixtures (FIXTURES.md §4).

Deterministic: the corpus is seeded (datagen.GenConfig defaults, TEST_CFG
shape) and violation rows are canonically ordered, so every regeneration
produces byte-identical files — the engine analog of the reference's
checked-in ``AmbiguousFackelReferences.txt`` golden output
(``/root/reference/scripts/archiv/fackel_text_matches.py:36-39``).

Writes into tests/fixtures/:
  expected_verdicts.json     {part_id: {rule_id: {passed, metric, threshold}}}
  expected_violations.jsonl  canonical-sorted violation rows, one JSON per line
  token_digests.json         per-partition md5 rollup of sorted
                             "doc_id:xxhash64(tokens)" lines (the token-array
                             equality invariant, input_hint)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")


def main() -> int:
    from lk_data_test_spark.datagen import GenConfig, generate
    from lk_data_test_spark.plans.runner import ValidationRunner
    from lk_data_test_spark.session import get_spark
    from lk_data_test_spark.sources.catalog import PartitionedTable

    cfg = GenConfig(n_parts=10, rows_per_part=1200)  # == tests TEST_CFG
    spark = get_spark("make-fixtures", cores=8, shuffle_partitions=16)
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    with tempfile.TemporaryDirectory() as td:
        generate(spark, td, cfg)
        table = PartitionedTable(os.path.join(td, "sequences"))
        runner = ValidationRunner(
            spark,
            table,
            allowed_sources=spark.read.parquet(os.path.join(td, "allowed_sources")),
            reference_profiles=spark.read.parquet(
                os.path.join(td, "reference_profiles")
            ),
            manifest_path=os.path.join(td, "manifest.json"),
        )
        res = runner.run()

        verdicts: dict = {}
        for v in res.verdicts:
            verdicts.setdefault(str(v["part_id"]), {})[v["rule_id"]] = {
                "passed": bool(v["passed"]),
                "metric": round(float(v["metric"]), 6),
                "threshold": float(v["threshold"]),
            }
        with open(os.path.join(FIXTURE_DIR, "expected_verdicts.json"), "w") as f:
            json.dump(verdicts, f, indent=1, sort_keys=True)
            f.write("\n")

        rows = [r.asDict() for r in res.violations.collect()]
        with open(os.path.join(FIXTURE_DIR, "expected_violations.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True) + "\n")

        digs: dict[str, str] = {}
        all_rows = (
            table.read(spark)
            .selectExpr(
                "part_id", "concat(doc_id, ':', xxhash64(tokens)) AS line"
            )
            .collect()
        )
        by_part: dict[int, list[str]] = {}
        for r in all_rows:
            by_part.setdefault(int(r["part_id"]), []).append(r["line"])
        for pid, lines in sorted(by_part.items()):
            h = hashlib.md5("\n".join(sorted(lines)).encode()).hexdigest()
            digs[str(pid)] = h
        with open(os.path.join(FIXTURE_DIR, "token_digests.json"), "w") as f:
            json.dump(digs, f, indent=1, sort_keys=True)
            f.write("\n")

    print(
        f"wrote {len(verdicts)} partition verdicts, {len(rows)} violation rows,"
        f" {len(digs)} token digests -> {FIXTURE_DIR}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
