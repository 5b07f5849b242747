"""Driver-slot rotation audit: cross-checks __spark_entry__'s first-50
ordering against every CORRECTNESS_r*.json on disk.

Prints, for each registration: which round last gave it a driver row and
whether it sits in the current driver window — then summarizes what the
NEXT round's rotation should front (never-checked first, then stalest).
Run at round start (after the driver drops the new CORRECTNESS file) and
at round end (to sanity-check the claims in NOTES before committing).

Usage: python tools/rotation_audit.py [window_size=50]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(entry.queries())
    in_window = set(names[:window])

    last_round: dict[str, int] = {}
    status: dict[str, str] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        with open(path) as f:
            doc = json.load(f)
        for name, row in doc.items():
            last_round[name] = rnd
            if row.get("err") == "no_oracle":
                status[name] = "rows_only"
            elif row.get("hash_match"):
                status[name] = "green"
            else:
                status[name] = f"RED({row.get('err') or 'mismatch'})"

    never = [n for n in names if n not in last_round]
    reds = sorted(n for n, s in status.items() if s.startswith("RED"))
    by_staleness = sorted(
        (n for n in names if n in last_round), key=lambda n: last_round[n]
    )

    print(f"registrations: {len(names)}  window: {window}")
    print(f"union coverage: {len(last_round)}/{len(names)} have a driver row")
    print(f"never-checked: {len(never)}")
    for n in never:
        mark = "IN-WINDOW" if n in in_window else "**NOT in window**"
        print(f"  {n:<36}{mark}")
    print(f"reds (latest row): {len(reds)}")
    for n in reds:
        mark = "IN-WINDOW" if n in in_window else "**NOT in window**"
        print(f"  {n:<36}{status[n]:<24}{mark}")
    print("stalest 15 with rows:")
    for n in by_staleness[:15]:
        mark = "in-window" if n in in_window else "-"
        print(f"  {n:<36}r{last_round[n]}  {status.get(n, '?'):<12}{mark}")
    # suggestion: what the next rotation should front
    front = never + reds + by_staleness[: max(0, window - len(never) - len(reds))]
    missing = [n for n in front[:window] if n not in in_window]
    print(
        f"\nnext-round suggestion: front {len(never)} never-checked + "
        f"{len(reds)} reds + stalest fill; "
        f"{len(missing)} of those are not in the current window"
    )


if __name__ == "__main__":
    main()
