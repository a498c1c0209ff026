"""Write `.gate_snapshot.json` — the driver-rotation hygiene baseline
(round-10 VERDICT #2).

The driver's correctness gate hashes only the FIRST 50 entries of
`queries()`. `__spark_entry__._gate_order` used to sort never-verified
queries first and treat a once-verified name as forever-verified — so a
query MODIFIED after its verified round was never re-hashed by the driver
(r8's money-sum migration, r9's ansari/quade/ljung-box fixes).

This tool snapshots, per query, sha256(fn source + oracle SQL text), and
per package module, sha256(file bytes). Run it at ROUND START (before any
edits); at gate time `_gate_order` diffs the live registry against the
snapshot and sorts:

  0. never driver-verified
  1. verified but PRECISELY touched (fn source or oracle text changed)
  2. verified, defining-or-imported kernel module changed (broad tier)
  3. verified, untouched

so this round's modified queries re-enter the driver's 50-slot gate.

Usage: python tools/gate_snapshot.py   (writes .gate_snapshot.json)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PKG = "azure_medicine_data_engineering_spark"


def query_hashes() -> dict[str, str]:
    import inspect

    import __spark_entry__  # noqa: F401  (imports every query module)
    from azure_medicine_data_engineering_spark.queries import registry

    out = {}
    for name, fn in registry.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        oracle = registry.ORACLES.get(name, "")
        out[name] = hashlib.sha256(
            (src + "\x00" + oracle).encode("utf-8")
        ).hexdigest()
    return out


def module_hashes() -> dict[str, str]:
    out = {}
    pkg_dir = os.path.join(HERE, PKG)
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, HERE)
            with open(path, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()
    return out


def build_snapshot() -> dict:
    return {"queries": query_hashes(), "modules": module_hashes()}


def main() -> None:
    snap = build_snapshot()
    out_path = os.path.join(HERE, ".gate_snapshot.json")
    with open(out_path, "w") as f:
        json.dump(snap, f, indent=0, sort_keys=True)
    print(
        f"wrote {out_path}: {len(snap['queries'])} queries, "
        f"{len(snap['modules'])} modules"
    )


if __name__ == "__main__":
    main()
