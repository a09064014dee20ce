#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <verify_out_dir>/<name> parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB (views named after the parquet
tables in <sf_dir>), sorts columns by name and rows by value, and
compares exactly. Exit 0 iff every query matches.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [tuple(cols[i] for i in order)] + out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # The driver's hash is TYPE-sensitive (q151 round 12: values
        # identical, DuckDB HUGEINT vs Spark BIGINT → red). Compare the
        # declared column types too, name-aligned, so an uncast
        # sum/DECIMAL in an oracle's final projection fails HERE first.
        # (DBAPI .description collapses numerics to 'NUMBER'; the
        # relation API keeps the real DuckDB types.)
        grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        wrel = con.sql(sql)
        got_types = dict(zip(grel.columns, (str(t) for t in grel.types)))
        want_types = dict(zip(wrel.columns, (str(t) for t in wrel.types)))
        type_bad = [
            (c, got_types[c], want_types[c])
            for c in sorted(set(got_types) & set(want_types))
            if got_types[c] != want_types[c]
        ]
        cg, cw = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if cg == cw and type_bad:
            n_bad += 1
            print(f"FAIL {name}: values match but declared types differ "
                  f"(driver hash is type-sensitive): "
                  + ", ".join(f"{c} spark={a} oracle={b}"
                              for c, a, b in type_bad))
        elif cg == cw:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: spark {len(got_rows)} rows {cg[0]}, "
                  f"oracle {len(want_rows)} rows {cw[0]}")
            for i, (a, b) in enumerate(zip(cg[1:], cw[1:])):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark  {a}\n   oracle {b}")
                    break
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
