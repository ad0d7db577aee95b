"""File-delta INCREMENTAL validation: validate only appended files, merge
mergeable partition stats.

The checkpoint manifest (plans/manifest.py) resumes at PARTITION granularity:
a partition whose snapshot changed re-runs in full. Under append-only
ingestion (the Iceberg norm — snapshots that only ADD data files) that
re-reads every old row to re-derive statistics that are, for the stats rule,
perfectly MERGEABLE: counts, null/defect counters and sums add; min/max take
min/max; the bucketed n_tok histogram adds bucket-wise. This module is the
fast path on top: per partition it stores the validated (file name -> size)
set plus the merged stats row, and on re-run

  - skip   — file set unchanged: nothing read;
  - delta  — pure append (every previously validated file still present with
    the same size): ONLY the added files are scanned, one salted stats pass
    over the union of all partitions' delta files, then a driver-side merge
    of two tiny stats rows per partition;
  - full   — anything else (rewrite, delete, size change, first sight):
    correctness over cleverness, the whole partition re-runs.

The merged result is bit-identical to a full recompute (integer sums,
min/max, exact histogram) — asserted by tests — so delta mode never trades
accuracy, only I/O: an appended 1% of a partition costs 1% of the scan.

Reference analog: the idempotent enrich re-runs that delete ONLY derived
matches and keep everything else (`/root/reference/scripts/
enrich_fackel_bibls.py:18-25`) — re-expressed as file-level lineage.

Scale shape (10^12 rows): the per-partition state is one JSON-able stats row
(a dozen longs + a bounded histogram map) and a file->size dict — O(files),
never O(rows); the delta scan is one partition-pruned-by-construction job
over exactly the added files; the merge is driver-side over n_parts tiny
rows.

Extension map — the same pattern covers the rest of the suite, because each
rule's signal is (or has) a mergeable form:
  - schema: already metadata-only per file; trivially incremental.
  - referential: violations are per-row independent — delta rows yield delta
    violation counts that ADD to the stored metric.
  - drift: the shared token partials (plans/shared.py — per (part, source)
    n_tok histogram + token counts) are count rows that add bucket-wise;
    quantiles re-derive from the merged histogram, and the t-digest sketch
    (functions/tdigest.py) merges natively.
  - uniqueness: the HLL screen merges (approx_count_distinct sketches are
    mergeable by design); only a partition the merged screen FLAGS needs the
    exact cross-file groupBy — which the batch rule already restricts to
    flagged partitions.
column_stats is implemented here as the exemplar because it exercises every
merge flavor (sums, min/max, histogram) in one rule.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.column_stats import partition_stats
from ..sources.catalog import PartitionedTable

_SUM_FIELDS = (
    "row_count",
    "null_doc_id",
    "null_source",
    "null_n_tok",
    "null_tokens",
    "nonpos_n_tok",
    "len_mismatch",
    "sum_n_tok",
)
_BAD_FIELDS = (
    "null_doc_id",
    "null_source",
    "null_n_tok",
    "null_tokens",
    "nonpos_n_tok",
    "len_mismatch",
)


def _row_to_stats(row) -> dict:
    d = {k: int(row[k]) for k in _SUM_FIELDS}
    d["min_n_tok"] = None if row["min_n_tok"] is None else int(row["min_n_tok"])
    d["max_n_tok"] = None if row["max_n_tok"] is None else int(row["max_n_tok"])
    d["n_tok_hist"] = {
        str(k): int(v) for k, v in (row["n_tok_hist"] or {}).items()
    }
    return d


def merge_stats(a: dict, b: dict) -> dict:
    """Merge two partition-stats dicts — exact (integer) and commutative."""
    out = {k: a[k] + b[k] for k in _SUM_FIELDS}
    mins = [v for v in (a["min_n_tok"], b["min_n_tok"]) if v is not None]
    maxs = [v for v in (a["max_n_tok"], b["max_n_tok"]) if v is not None]
    out["min_n_tok"] = min(mins) if mins else None
    out["max_n_tok"] = max(maxs) if maxs else None
    hist = dict(a["n_tok_hist"])
    for k, v in b["n_tok_hist"].items():
        hist[k] = hist.get(k, 0) + v
    out["n_tok_hist"] = hist
    return out


def _part_files(table: PartitionedTable, pid: int) -> dict[str, int]:
    pdir = os.path.join(table.path, f"part_id={pid}")
    return {
        f: os.path.getsize(os.path.join(pdir, f))
        for f in os.listdir(pdir)
        if f.endswith(".parquet")
    }


class IncrementalStatsValidator:
    """Incremental column-stats validation with file-level lineage.

    ``run(spark)`` returns {part_id: {"mode", "passed", "metric", "stats"}}
    and persists the merged state; ``scanned_rows`` on the result object
    reports exactly how many rows the run read (the delta-mode guarantee).
    """

    def __init__(
        self,
        table: PartitionedTable,
        store_path: str,
        n_salt: int = 16,
        bucket_width: int = 64,
        max_bad: float = 0.0,
    ):
        self.table = table
        self.store_path = store_path
        self.n_salt = n_salt
        self.bucket_width = bucket_width
        self.max_bad = max_bad
        self.entries: dict[str, dict] = {}
        if os.path.exists(store_path):
            with open(store_path) as f:
                self.entries = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.store_path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.store_path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.store_path)

    def _classify(self) -> tuple[dict[int, list[str]], list[int], list[int]]:
        """-> (delta part -> added file paths, full parts, skipped parts)."""
        delta: dict[int, list[str]] = {}
        full: list[int] = []
        skip: list[int] = []
        for pid in self.table.partition_ids():
            cur = _part_files(self.table, pid)
            prior = self.entries.get(str(pid))
            if prior is None:
                full.append(pid)
                continue
            old = {k: int(v) for k, v in prior["files"].items()}
            if cur == old:
                skip.append(pid)
            elif all(cur.get(f) == sz for f, sz in old.items()):
                pdir = os.path.join(self.table.path, f"part_id={pid}")
                delta[pid] = [
                    os.path.join(pdir, f) for f in sorted(set(cur) - set(old))
                ]
            else:  # rewrite / delete / size change -> full recompute
                full.append(pid)
        return delta, full, skip

    def _stats_for(self, df) -> dict[int, dict]:
        rows = partition_stats(df, self.n_salt, self.bucket_width).collect()
        return {int(r["part_id"]): _row_to_stats(r) for r in rows}

    def run(self, spark: SparkSession) -> dict:
        delta, full, skip = self._classify()
        results: dict[int, dict] = {}
        scanned_rows = 0

        if full:
            stats = self._stats_for(
                self.table.read_partitions(spark, full)
            )
            for pid in full:
                s = stats.get(pid) or _empty_stats()
                scanned_rows += s["row_count"]
                results[pid] = {"mode": "full", "stats": s}

        if delta:
            # ONE job over every partition's added files: read each delta
            # file set with its literal part_id (directory-derived columns
            # are absent when reading file paths directly), union, aggregate.
            frames = []
            for pid, paths in delta.items():
                frames.append(
                    spark.read.parquet(*paths).withColumn(
                        "part_id", F.lit(pid).cast("int")
                    )
                )
            u = frames[0]
            for fr in frames[1:]:
                u = u.unionByName(fr)
            dstats = self._stats_for(u)
            for pid in delta:
                d = dstats.get(pid) or _empty_stats()
                scanned_rows += d["row_count"]
                merged = merge_stats(self.entries[str(pid)]["stats"], d)
                results[pid] = {"mode": "delta", "stats": merged}

        for pid in skip:
            results[pid] = {
                "mode": "skip",
                "stats": self.entries[str(pid)]["stats"],
            }

        for pid, res in results.items():
            s = res["stats"]
            bad = sum(s[k] for k in _BAD_FIELDS)
            res["metric"] = float(bad)
            res["passed"] = bad <= self.max_bad
            if res["mode"] != "skip":
                self.entries[str(pid)] = {
                    "files": _part_files(self.table, pid),
                    "stats": s,
                }
        self._save()
        return {
            "parts": results,
            "scanned_rows": scanned_rows,
            "modes": {
                pid: res["mode"] for pid, res in sorted(results.items())
            },
        }


def _empty_stats() -> dict:
    d = {k: 0 for k in _SUM_FIELDS}
    d["min_n_tok"] = None
    d["max_n_tok"] = None
    d["n_tok_hist"] = {}
    return d
