"""DuckDB-oracle comparison harness (SURVEY.md §5 test plan, item 1).

Replicates the driver's t2 gate: run the Spark query and the oracle SQL,
canonicalize both results (sort columns by name, stringify values, sort
rows) and compare hashes. Strict stringification: float64 via repr (bit
equality), Decimal normalized, timestamps ISO-8601 to µs.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import duckdb
import numpy as np
import pandas as pd

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return format(v.normalize(), "f") if v != 0 else "0"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, str):
        return v
    if pd.isna(v):
        return "NULL"
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    rows = []
    for _, row in pdf[cols].iterrows():
        rows.append("\x1f".join(canon_cell(row[c]) for c in cols))
    rows.sort()
    return rows


def frame_hash(pdf: pd.DataFrame) -> str:
    return hashlib.sha256("\n".join(canon_frame(pdf)).encode()).hexdigest()


def spark_to_pandas(df) -> pd.DataFrame:
    return df.toPandas()


def duck_to_pandas(con, sql: str) -> pd.DataFrame:
    # Arrow path preserves decimals as decimal.Decimal (no silent float cast).
    return con.execute(sql).fetch_arrow_table().to_pandas()


def compare(spark_df, con, sql: str) -> dict:
    spdf = spark_to_pandas(spark_df)
    dpdf = duck_to_pandas(con, sql)
    result = {
        "spark_rows": len(spdf),
        "duck_rows": len(dpdf),
        "spark_cols": sorted(spdf.columns),
        "duck_cols": sorted(dpdf.columns),
        "match": False,
    }
    if result["spark_cols"] != result["duck_cols"]:
        result["reason"] = "column mismatch"
        return result
    if len(spdf) != len(dpdf):
        result["reason"] = "row count mismatch"
        return result
    s_rows, d_rows = canon_frame(spdf), canon_frame(dpdf)
    if s_rows == d_rows:
        result["match"] = True
        return result
    result["reason"] = "value mismatch"
    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    result["first_diffs"] = diffs[:5]
    return result
