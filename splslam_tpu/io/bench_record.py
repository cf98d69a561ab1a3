"""Shared ledger of on-chip headline measurements (BENCH_HEADLINES.json).

The round driver only ever runs `bench.py`, so the other two headline
metrics (Local BA ms/KF from bench_mapping.py, TUM mono+line ms/frame
from bench_mono.py) historically never reached a driver artifact
(round-3 VERDICT weak #3). Each dedicated bench now records its
measured headline here; bench.py re-emits every recorded row (with its
capture timestamp, source, and the git revision that measured it) ahead
of its own live headline, so one driver run carries all three numbers.
Rows recorded at a different revision than the re-emitting HEAD are
flagged stale (round-4 VERDICT weak #9: a perf regression must not ride
into a driver artifact wearing an old round's numbers).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_PATH = os.path.join(_ROOT, "BENCH_HEADLINES.json")


def git_rev() -> str:
    """Short HEAD revision of the repo (empty string if unavailable)."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_ROOT,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except OSError:
        return ""


def record_headline(row: dict, source: str) -> None:
    """Insert/update `row` (must carry "metric") in the ledger."""
    data = load_headlines()
    data[row["metric"]] = {
        **row,
        "source": source,
        "captured": time.strftime("%Y-%m-%d %H:%M:%S"),
        "git_rev": git_rev(),
    }
    # Atomic replace: a crash or concurrent bench must not leave a
    # truncated ledger (load_headlines would silently return {} and all
    # recorded headlines would vanish from the next driver artifact).
    fd, tmp = tempfile.mkstemp(dir=_ROOT, prefix=".bench_headlines_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, _PATH)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_headlines() -> dict:
    try:
        with open(_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def reemit_rows() -> list[dict]:
    """Recorded rows ready for re-emission by bench.py, each flagged
    `stale_rev` when its recorded git_rev differs from current HEAD."""
    head = git_rev()
    rows = []
    for row in load_headlines().values():
        row = dict(row)
        rev = row.get("git_rev", "")
        row["stale_rev"] = bool(rev) and bool(head) and rev != head or not rev
        rows.append(row)
    return rows
