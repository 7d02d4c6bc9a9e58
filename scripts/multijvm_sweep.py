"""FULL catalog correctness sweep on local-cluster[2,2,2048]: every
oracle-paired registry query, Spark-on-two-executor-JVMs vs DuckDB."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
print("MULTIJVM_SWEEP " + json.dumps({"paired": done, "mismatches": [b[0] for b in bad]}))
