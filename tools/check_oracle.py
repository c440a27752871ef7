#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity (mimics the driver):
run graft.Verify first, then this script compares each outDir/<name> parquet
against the DuckDB result of oracle_sql.json, column-name-sorted, row-sorted,
exact value compare — PLUS a pandas to_csv string compare, which is what the
driver's hash actually sees (round-1 lesson: DuckDB sum(BIGINT) widens to
HUGEINT -> pandas float64 -> "123.0" vs Spark int64 "123"; values equal,
strings differ, hash_match false).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat()
        except Exception:
            return v.isoformat()
    return v


def sort_key(row):
    return tuple((v is None, repr(v)) for v in row)


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    if not data or not table.num_rows:
        return cols, []
    return cols, sorted(zip(*[[norm(v) for v in col] for col in data]), key=sort_key)


def csv_render(table):
    """Driver-equivalent canonical rendering: pandas frame, columns sorted by
    name, rows sorted by all columns, serialized with to_csv."""
    df = table.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.to_csv(index=False)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: no spark output ({e})")
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        sc, sr = sorted(spark_tbl.column_names), None
        dc = sorted(duck.column_names)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns {sc} vs {dc}")
            continue
        _, sr = rows_of(spark_tbl)
        _, dr = rows_of(duck)
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            for a, b in list(zip(sr, dr))[:3]:
                if a != b:
                    print(f"   first diff: spark={a} duck={b}")
                    break
            continue
        diff = [(a, b) for a, b in zip(sr, dr) if a != b]
        if diff:
            failures.append(name)
            print(f"FAIL {name}: {len(diff)}/{len(sr)} differing rows; cols={sc}")
            for a, b in diff[:3]:
                print(f"   spark={a}")
                print(f"   duck ={b}")
            continue
        try:
            s_csv, d_csv = csv_render(spark_tbl), csv_render(duck)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: csv render error (driver would crash too): {e}")
            continue
        if s_csv != d_csv:
            failures.append(name)
            first = next((a, b) for a, b in
                         zip(s_csv.splitlines(), d_csv.splitlines()) if a != b)
            print(f"FAIL {name}: values equal but driver-hash strings differ "
                  f"(dtype skew): spark={first[0]!r} duck={first[1]!r}")
        else:
            print(f"OK   {name} ({len(sr)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
