#!/usr/bin/env python
"""Single-JVM driver-contract parity sweep: every (or a named subset
of) oracle-paired registry query, vanilla local[8] session vs DuckDB
at sf0.01 (override with $SPARK_GRAFT_SF_DIR). The per-change
correctness gate of the optimization rounds — the multi-JVM process
boundary is covered separately by scripts/multijvm_sweep.py.

Usage: python scripts/oracle_sweep.py [name ...]   # default: all
Prints one JSON line {"paired": N, "mismatches": [...]}; exit 1 on
any mismatch.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

from sift_spark.session import get_spark  # noqa: E402

spark = get_spark("oracle_sweep")
import __spark_entry__ as E  # noqa: E402
from tests.parity import compare, duck_con  # noqa: E402

qs, osql = E.queries(), E.oracle_sql()
names = sys.argv[1:] or [n for n in qs if n in osql]
con = duck_con(sf_dir)
bad, done = [], 0
for name in names:
    if name not in osql:
        print(f"# {name}: no oracle twin, skipped", flush=True)
        continue
    try:
        r = compare(qs[name](spark, sf_dir), con, osql[name])
        ok = r["hash_spark"] == r["hash_duck"]
    except Exception as e:  # noqa: BLE001
        ok, r = False, {"err": str(e)[:200]}
    if not ok:
        bad.append(name)
        print("MISMATCH", name, r, flush=True)
    done += 1
    if done % 20 == 0:
        print(f"# {done}/{len(names)} done", flush=True)
print(json.dumps({"paired": done, "mismatches": bad}))
sys.exit(1 if bad else 0)
