"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir, compare row
counts + column-name sets + value hashes (columns sorted by name, rows
sorted)."""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from soweego_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NULL"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = get_spark(cpus=8, app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        df = fn(spark, SF_DIR)
        pdf = df.toPandas()
        s_cols = list(pdf.columns)
        s_rows = [tuple(r) for r in pdf.itertuples(index=False)]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(s_rows)} rows")
            continue
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_rows = len(s_rows) == len(d_rows)
        ok_hash = ok_cols and frame_hash(s_cols, s_rows) == frame_hash(
            d_cols, d_rows
        )
        status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(
            f"{name:28s} {status} cols={ok_cols} "
            f"rows={len(s_rows)}/{len(d_rows)} hash={ok_hash}"
        )
        if status == "FAIL" and ok_cols:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            s_set = {tuple(norm_cell(r[i]) for i in order) for r in s_rows}
            dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            d_set = {tuple(norm_cell(r[i]) for i in dorder) for r in d_rows}
            print("  spark-only:", list(s_set - d_set)[:3])
            print("  duck-only :", list(d_set - s_set)[:3])
    print("FAILED:", failed if failed else "none")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
