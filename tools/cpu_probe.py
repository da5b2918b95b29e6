"""Hardware-envelope probe backing BENCH/BASELINE.md's scaling analysis.

Two workloads, each run across a process ladder (default 2, 8, 32):

* ``cpu``  — sha256 over a small in-cache block: pure ALU, ~no memory
  traffic. Scales with cores until the physical-core limit; its ladder is
  the ceiling any engine could reach on this VM.
* ``mem``  — byte-regex substitutions over a fresh ~1 MB string per
  iteration: the parse stage's traffic pattern (read + rewrite large
  strings). On a single-socket VM this saturates memory bandwidth well
  before 32 threads — per-process throughput collapses even though the
  work is embarrassingly parallel.

The gap between the two ladders at high core counts is the hardware
envelope, not engine serialization: on a real multi-executor cluster each
executor brings its own memory bandwidth, so the low-core pair (2->8) is
the faithful proxy for N->4N executors. Usage::

    python tools/cpu_probe.py [--ladder 2,8,32] [--seconds 6]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import re
import time


def _cpu_worker(stop_at: float, out) -> None:
    block = b"x" * 4096
    n = 0
    while time.time() < stop_at:
        h = block
        for _ in range(64):
            h = hashlib.sha256(h).digest()
        n += 1
    out.put(n)


def _mem_worker(stop_at: float, out) -> None:
    pat = re.compile(rb"<[^>]*>")
    n = 0
    i = 0
    while time.time() < stop_at:
        doc = (b"<p>" + bytes(str(i), "ascii") + b"lorem ipsum dolor " * 64 + b"</p>") * 64
        pat.sub(b" ", doc)
        i += 1
        n += 1
    out.put(n)


def run(worker, procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_at = time.time() + seconds
    ps = [mp.Process(target=worker, args=(stop_at, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="2,8,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    ladder = [int(c) for c in args.ladder.split(",")]
    result: dict = {"ladder": ladder}
    for name, worker in (("cpu", _cpu_worker), ("mem", _mem_worker)):
        rates = {c: run(worker, c, args.seconds) for c in ladder}
        effs = {
            f"{a}->{b}": round((rates[b] / rates[a]) / (b / a), 3)
            for a, b in zip(ladder, ladder[1:])
        }
        result[name] = {
            "ops_per_sec": {str(c): round(r, 1) for c, r in rates.items()},
            "efficiency": effs,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
