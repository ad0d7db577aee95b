"""N=2 vs 4N=8 REAL EXECUTOR JVMs via Spark's local-cluster master.

Every prior scaling measurement used local[N] — N task threads inside ONE
JVM sharing one heap, one GC, and one in-process shuffle. The north_rule
criterion is phrased over EXECUTORS ("N and 4N executors"), and Spark can
get much closer to that on a single host: ``--master
local-cluster[numWorkers,coresPerWorker,memoryMB]`` spawns real standalone
workers, each launching a separate CoarseGrainedExecutorBackend JVM with
its own heap, GC, Python-worker pool, and netty block transfer — actual
serialized shuffle between processes, not intra-JVM handoff. The remaining
single-host artifacts (shared memory bus, page cache, and disk) are the
same ones the 2->8 thread measurement documented; executor count is the
axis that changes here.

Protocol otherwise identical to scripts/bench_scaling_2to8.py: spark-submit
--py-files (north_rule launch shape), fresh cluster per measurement, median
of in-cluster steady-state runs, pre-generated corpora, memory per executor
held constant (the cluster convention). Weak scaling pairs N executors on X
rows against 4N executors on 4X rows. Appends a dated addendum to
BENCH/BASELINE.md; replaces nothing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_scaling as bs  # noqa: E402

N_EXEC = int(os.environ.get("SCALE_N_EXEC", "2"))
N4_EXEC = 4 * N_EXEC
CORES_PER_EXEC = int(os.environ.get("SCALE_CORES_PER_EXEC", "2"))
WORKER_MEM_MB = 6144  # local-cluster worker memory (must hold executor mem)
EXEC_MEM = "5g"  # per-executor heap, constant across cluster sizes
DRIVER_MEM = "8g"
REPEAT_WEAK = 5
REPEAT_STRONG = 3


def _submit_cluster(n_exec: int, rows: int, repeat: int) -> dict:
    """One fresh local-cluster measurement: n_exec executor JVMs x
    CORES_PER_EXEC cores, median of `repeat` in-cluster runs."""
    total_cores = n_exec * CORES_PER_EXEC
    master = f"local-cluster[{n_exec},{CORES_PER_EXEC},{WORKER_MEM_MB}]"
    env = dict(os.environ, SPARK_MASTER=master)
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            master,
            "--driver-memory",
            DRIVER_MEM,
            "--executor-memory",
            EXEC_MEM,
            "--py-files",
            bs._engine_zip(),
            os.path.join(bs.REPO, "lk_data_test_spark", "cli.py"),
            "--data-dir",
            bs._data_dir(rows),
            "--parts",
            str(bs.PARTS),
            "--rows-per-part",
            str(rows),
            "--cores",
            str(total_cores),
            "--force",
            "--repeat",
            str(repeat),
        ],
        capture_output=True,
        text=True,
        cwd=bs.REPO,
        env=env,
        timeout=3600,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"run at {master} failed")
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    r = json.loads(last)
    times = sorted(r["run_times_sec"])
    r["elapsed_sec"] = times[len(times) // 2]
    r["sequences_per_sec"] = round(r["rows_validated"] / r["elapsed_sec"], 1)
    print(f"{master} x {bs.PARTS}x{rows}: {r}", file=sys.stderr)
    return r


def main() -> int:
    small = bs.ROWS // 4
    bs.pregenerate(small)
    bs.pregenerate(bs.ROWS)
    rn_small = _submit_cluster(N_EXEC, small, REPEAT_WEAK)
    r4n_big = _submit_cluster(N4_EXEC, bs.ROWS, REPEAT_WEAK)
    rn_big = _submit_cluster(N_EXEC, bs.ROWS, REPEAT_STRONG)

    tns, tnb, t4nb = (
        r["sequences_per_sec"] for r in (rn_small, rn_big, r4n_big)
    )
    eff_strong = (t4nb / tnb) / 4.0
    eff_weak = t4nb / (4.0 * tns)
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")

    md = f"""

## N={N_EXEC} vs 4N={N4_EXEC} REAL executor JVMs (local-cluster) ({stamp})

The criterion is phrased over EXECUTORS; all thread-mode (local[N]) runs
above approximate that with task threads in one JVM. This run uses
``--master local-cluster[{N_EXEC},{CORES_PER_EXEC},{WORKER_MEM_MB}]`` vs
``local-cluster[{N4_EXEC},{CORES_PER_EXEC},{WORKER_MEM_MB}]``: real
standalone workers, one CoarseGrainedExecutorBackend JVM each (own heap
{EXEC_MEM}, own GC, own Python-worker pool, serialized netty shuffle
between processes — verified in the worker logs), memory per executor
constant, same protocol as every run above (spark-submit --py-files, fresh
cluster per measurement, median of in-cluster steady-state runs,
pre-generated corpora). Shared bus/page-cache/disk remain single-host
artifacts, as documented for the thread-mode runs.

| configuration | input (rows) | elapsed (s, median) | validated seq/s |
|---|---|---|---|
| {N_EXEC} executors x {CORES_PER_EXEC} cores (N)  | {bs.PARTS}x{small} = {bs.PARTS * small:,} | {rn_small["elapsed_sec"]} | {tns:,.0f} |
| {N_EXEC} executors x {CORES_PER_EXEC} cores (N)  | {bs.PARTS}x{bs.ROWS} = {bs.PARTS * bs.ROWS:,} | {rn_big["elapsed_sec"]} | {tnb:,.0f} |
| {N4_EXEC} executors x {CORES_PER_EXEC} cores (4N) | {bs.PARTS}x{bs.ROWS} = {bs.PARTS * bs.ROWS:,} | {r4n_big["elapsed_sec"]} | {t4nb:,.0f} |

- **Weak scaling eff = tput_4N(4X) / (4 x tput_N(X)) = {eff_weak:.2f}**
  (median of {REPEAT_WEAK} in-cluster runs per cell)
- Strong scaling eff = (tput_4N / tput_N) / 4 = {eff_strong:.2f}
  (median of {REPEAT_STRONG} runs for the N x 4X base)

Raw runs:
- {N_EXEC}x{CORES_PER_EXEC}  x {bs.PARTS}x{small}: {json.dumps(rn_small)}
- {N_EXEC}x{CORES_PER_EXEC}  x {bs.PARTS}x{bs.ROWS}: {json.dumps(rn_big)}
- {N4_EXEC}x{CORES_PER_EXEC} x {bs.PARTS}x{bs.ROWS}: {json.dumps(r4n_big)}

Generated by scripts/bench_scaling_executors.py.
"""
    with open(os.path.join(bs.REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
