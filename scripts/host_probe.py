"""Classify this host's performance window before trusting bench walls.

This sandbox VM is throttled by its HOST in two time-varying ways that
make absolute walls a lottery (BASELINE.md "Hypervisor steal" and
"Memory-bandwidth throttling"):

1. CPU steal: ~0% at idle, 27-40% sustained while a Ray job saturates
   the box.
2. Memory bandwidth: single-process memcpy swings between ~0.3 and
   several GB/s; under 24-way worker concurrency each process can drop
   to 0.01-0.02 GB/s. String-heavy operators are memory-bound, so their
   walls track THIS number, not CPU speed.

Run before/after a bench to label the window:

    python scripts/host_probe.py           # one-shot probe
    python scripts/host_probe.py --watch   # 5s steal samples until ^C

Prints one JSON line (same field names bench.py embeds) so a probe can
be pasted next to a bench result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _burn, _calib_memcpy, _cpu_calibration, _cpu_stat, _steal_pct


def probe() -> dict:
    stat0 = _cpu_stat()
    single = int(round(_burn(1.0) / 1.0, -4))
    memcpy = _calib_memcpy(mb=128, reps=4)
    mproc = _cpu_calibration(os.cpu_count() or 8, seconds=1.0)
    steal = _steal_pct(stat0, _cpu_stat())
    # classification thresholds from the recorded healthy sessions
    # (BASELINE.md): memcpy >= 1 GB/s and steal < 5% = comparable window
    healthy = memcpy >= 1.0 and steal < 5.0
    return {
        "calib_iters_per_sec": single,
        "calib_mproc_m_iters_per_sec": mproc,
        "calib_memcpy_gb_per_sec": memcpy,
        "steal_pct_probe": steal,
        "window": "healthy" if healthy else "degraded",
    }


def watch() -> None:
    while True:
        a = _cpu_stat()
        time.sleep(5)
        print(
            json.dumps(
                {"t": round(time.time()), "steal_pct_5s": _steal_pct(a, _cpu_stat())}
            ),
            flush=True,
        )


if __name__ == "__main__":
    if "--watch" in sys.argv:
        watch()
    else:
        print(json.dumps(probe()))
