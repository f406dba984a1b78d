"""Control experiment for the scaling gate: does THIS BOX scale pure CPU?

Runs k register-only integer burn loops in separate processes (no memory
traffic beyond L1, no syscalls in the hot loop) and reports per-process
and aggregate rates.  If pure CPU scales near-linearly while the
identical-code PageRank job does not, the PageRank gap is the shared
memory subsystem (cache/DRAM/page-cache shuffle path), not a
parallelism defect in the engine's plan — the N-vs-4N criterion's
confounder on a single shared-memory box that a real 4N-node cluster
does not have.

Usage: python tools/cpu_scaling_probe.py [seconds_per_step]
Prints one JSON line: {k: {per_proc_mops, aggregate_mops}}, plus the
1->4 and 2->8 pure-CPU scaling efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(q, secs: float) -> None:
    t0 = time.time()
    x = 0
    n = 0
    while time.time() - t0 < secs:
        for _ in range(100000):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        n += 100000
    q.put(n / (time.time() - t0))


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    out = {}
    for k in (1, 2, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q, secs)) for _ in range(k)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        out[k] = {
            "per_proc_mops": round(sum(rates) / len(rates) / 1e6, 2),
            "aggregate_mops": round(sum(rates) / 1e6, 2),
        }
    eff = {
        "cpu_eff_1_to_4": round(
            out[4]["aggregate_mops"] / (4 * out[1]["aggregate_mops"]), 3),
        "cpu_eff_2_to_8": round(
            out[8]["aggregate_mops"] / (4 * out[2]["aggregate_mops"]), 3),
        "cpu_eff_8_to_32": round(
            out[32]["aggregate_mops"] / (4 * out[8]["aggregate_mops"]), 3),
    }
    print(json.dumps({"configs": out, **eff}))


if __name__ == "__main__":
    main()
