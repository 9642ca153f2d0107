"""Host-conditions probe: single-core vs all-core CPU throughput.

Separates HOST drift from CODE drift when a bench series moves with
no plan changes (round-11 motivation: the full suite read 2.23-2.41x
cold vs r10's 1.90-2.04x with untouched queries +15-30% slower on
the isolated protocol, while the largely single-threaded DuckDB
denominator was flat — i.e. the VM's multi-core throughput moved,
not the engine). Run this alongside any committed bench series and
record both numbers next to it.

The workload is a fixed sha256 chain: CPU-bound, allocation-free,
identical instruction mix per process, no NUMA/IO sensitivity.

    python tools/host_probe.py [n_procs]

Prints one JSON line: single-core chain time, wall time for n_procs
concurrent chains, and the parallel efficiency (ideal = 1.0).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

CHAIN = 2_000_000  # sha256 iterations per chain (~1.2 s/core-GHz)


def _chain(_: int = 0) -> float:
    t0 = time.time()
    h = b"\x00" * 32
    for _ in range(CHAIN):
        h = hashlib.sha256(h).digest()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 1)
    single = min(_chain() for _ in range(3))
    t0 = time.time()
    with mp.Pool(n) as pool:
        times = pool.map(_chain, range(n))
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "host_probe",
                "single_core_s": round(single, 3),
                "n_procs": n,
                "all_core_wall_s": round(wall, 3),
                "per_proc_mean_s": round(sum(times) / len(times), 3),
                "parallel_efficiency": round(single * 1.0 / (wall), 3)
                if wall
                else None,
                "note": "efficiency = single_core_s / all_core_wall_s; "
                "1.0 means n concurrent chains cost one chain's wall",
            }
        )
    )


if __name__ == "__main__":
    main()
