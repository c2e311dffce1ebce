"""Driver-attestation coverage report.

The external driver records CORRECTNESS rows for at most ~50 registry
entries per round, taken in registry order (engine/driver_queries.py
`_DRIVER_PRIORITY` pins the window). This script cross-references every
CORRECTNESS_r*.json against the current registry and prints, per entry:
the rounds it was checked in, the latest verdict, and — the number that
drives each round's window — which entries have NEVER been attested.

Usage: python scripts/attestation_report.py [--json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_rounds() -> dict[str, dict[str, dict]]:
    """round-tag → {entry → row} for every CORRECTNESS_r*.json."""
    out: dict[str, dict[str, dict]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(p).replace("CORRECTNESS_", "").replace(".json", "")
        d = json.load(open(p))
        rows = d.get("queries", d)
        out[tag] = {k: v for k, v in rows.items() if isinstance(v, dict)}
    return out


def green(row: dict) -> bool:
    """A row is green when every recorded comparison matched. The
    driver emits rows_match/schema_match/values_match for oracle-backed
    entries and a weaker rows-only record otherwise."""
    keys = [k for k in ("rows_match", "schema_match", "values_match") if k in row]
    return bool(keys) and all(row[k] for k in keys) and not row.get("error")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from engine.driver_queries import _DRIVER_PRIORITY, oracle_sqls, spark_queries

    registry = list(spark_queries())
    oracles = set(oracle_sqls())
    rounds = load_rounds()

    per_entry: dict[str, list[str]] = {e: [] for e in registry}
    stale: dict[str, str] = {}
    for tag, rows in rounds.items():
        for e, row in rows.items():
            if e in per_entry and green(row):
                per_entry[e].append(tag)
    for e, tags in per_entry.items():
        if tags:
            stale[e] = tags[-1]

    never = [e for e in registry if not per_entry[e]]
    in_window = set(registry[:50])
    report = {
        "registry": len(registry),
        "with_oracle": len([e for e in registry if e in oracles]),
        "attested_ever": len(registry) - len(never),
        "never_attested": never,
        "never_attested_in_current_window": [e for e in never if e in in_window],
        "never_attested_outside_window": [e for e in never if e not in in_window],
        "window_is_priority_list": registry[:50] == list(_DRIVER_PRIORITY),
        "latest_green_round": stale,
    }
    if args.json:
        print(json.dumps(report, indent=1))
        return
    print(f"registry entries: {report['registry']} "
          f"({report['with_oracle']} with DuckDB oracles)")
    print(f"attested green at least once: {report['attested_ever']}")
    print(f"never attested: {len(never)}")
    print(f"  in current 50-slot window:  "
          f"{len(report['never_attested_in_current_window'])}")
    print(f"  outside window (next round): "
          f"{len(report['never_attested_outside_window'])}")
    for e in report["never_attested_outside_window"]:
        print(f"    {e}")


if __name__ == "__main__":
    main()
