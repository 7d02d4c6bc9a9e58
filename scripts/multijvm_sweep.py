"""FULL catalog correctness sweep on local-cluster[2,2,2048]: every
oracle-paired registry query, Spark-on-two-executor-JVMs vs DuckDB.

The sweep PINS itself to the registry: it asserts that the number of
oracle-paired queries it ran equals the live registry's oracle-paired
count, so a query added after the last sweep run can never silently
skip the process-boundary proof (the r8 gap class — two audit gates
registered after the sweep had run). tests/test_multijvm.py
additionally asserts the recorded JSON's count against the registry,
so a stale MULTIJVM_SWEEP_*.json fails the suite.

Writes MULTIJVM_SWEEP.json at the repo root (also printed as one
stdout line).
"""
import json, os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["SIFT_SPARK_MASTER"] = "local-cluster[2,2,2048]"
os.environ["SPARK_GRAFT_CPUS"] = "4"
from sift_spark.session import get_spark
spark = get_spark("multijvm_sweep")
spark.conf.set("spark.sift.cc.driverEdgeLimit", "0")      # force distributed
spark.conf.set("spark.sift.logreg.driverGroupLimit", "0")
spark.conf.set("spark.sift.redirects.driverLimit", "0")
import __spark_entry__ as E
from tests.parity import duck_con, compare
qs, osql = E.queries(), E.oracle_sql()
expected = sum(1 for name in qs if name in osql)
con = duck_con("/root/testdata/sf0.01")
bad, done = [], 0
for name in qs:
    if name not in osql:
        continue
    try:
        r = compare(qs[name](spark, "/root/testdata/sf0.01"), con, osql[name])
        ok = r["hash_spark"] == r["hash_duck"]
    except Exception as e:
        ok, r = False, {"err": str(e)[:200]}
    if not ok:
        bad.append((name, r))
        print("MISMATCH", name, flush=True)
    done += 1
    if done % 20 == 0:
        print(f"# {done} done", flush=True)
assert done == expected, (
    f"sweep ran {done} paired queries but the registry has {expected} — "
    "a query was added without crossing the process boundary"
)
result = {"paired": done, "registry_paired": expected,
          "mismatches": [b[0] for b in bad]}
with open(os.path.join(REPO, "MULTIJVM_SWEEP.json"), "w") as fh:
    json.dump(result, fh)
print("MULTIJVM_SWEEP " + json.dumps(result))
