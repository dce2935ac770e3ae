#!/usr/bin/env python
"""Oracle parity for the r15 continuation's touched queries at 3 SFs."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark
from tests.oracle import compare, duck_con

TOUCHED = [
    "Q-TPCH-02", "Q-TPCH-05", "Q-TPCH-08", "Q-TPCH-10", "Q-TPCH-12",
    "Q-JOIN-02", "Q-JOIN-08",
]

def main():
    spark = get_spark(app_name="parity-touched")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    bad = 0
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_con(sf_dir)
        for name in TOUCHED:
            spec = specs[name]
            r = compare(spec.fn(spark, sf_dir), con, spec.sql)
            ok = r["match"]
            bad += not ok
            print(f"{sf} {name}: {'OK' if ok else 'MISMATCH ' + str(r)}")
        con.close()
        spark.catalog.clearCache()
    print("PARITY_ALL_OK" if bad == 0 else f"PARITY_FAILURES={bad}")
    spark.stop()

if __name__ == "__main__":
    main()
