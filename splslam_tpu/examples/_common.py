"""Shared driver plumbing."""

from __future__ import annotations

import sys

import numpy as np


def run_sequence(sysm, feed, n_total: int):
    """Drive the system over `feed` (an iterable of callables executing
    one Track* step) and print the reference drivers' closing stats."""
    import time

    times = []
    for i, step in enumerate(feed):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{n_total}  state={sysm.state.name}",
                  file=sys.stderr)
    sysm.shutdown()
    tt = np.array(sorted(times))
    print("-------", file=sys.stderr)
    print(f"median tracking time: {np.median(tt)*1e3:.2f} ms", file=sys.stderr)
    print(f"mean tracking time:   {tt.mean()*1e3:.2f} ms", file=sys.stderr)
    print(sysm.timers.pretty(), file=sys.stderr)
    # Solver-guard health (System.health): all *_guarded must be 0 on a
    # healthy run; a verify_guarded SPIKE flags a matcher regression.
    print(f"health: {sysm.health()}", file=sys.stderr)
