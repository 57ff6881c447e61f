#!/usr/bin/env python3
"""Local differential harness (SURVEY.md §5): compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same
scale-factor tables — the same comparison the driver performs, run
early to catch dialect drift.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_type(t):
    t = str(t)
    if t.startswith("timestamp"):
        return "timestamp"  # ns vs us storage is a read artifact
    if t == "large_string":
        return "string"
    return t


def fetch_sorted_cols(con, sql):
    cur = con.execute(sql)
    arrow_schema = cur.fetch_arrow_table().schema
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [norm_type(arrow_schema.field(c).type) for c in cols]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(norm(r[i]) for i in order) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got_cols, got_types, got = fetch_sorted_cols(
            con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  [no-oracle] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp_cols, exp_types, exp = fetch_sorted_cols(con, oracle[name])
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"  [FAIL] {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_types != exp_types:
            diffs = [f"{c}: {g}!={e}" for c, g, e
                     in zip(got_cols, got_types, exp_types) if g != e]
            print(f"  [FAIL] {name}: dtype mismatch {diffs}")
            n_fail += 1
        elif got != exp:
            print(f"  [FAIL] {name}: {len(got)} vs {len(exp)} rows; "
                  f"first diff: ", end="")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"row {i}: got={g} exp={e}")
                    break
            else:
                print("row-count mismatch "
                      f"(extra={got[len(exp):3+len(exp)] if len(got)>len(exp) else exp[len(got):3+len(got)]})")
            n_fail += 1
        else:
            print(f"  [pass] {name}: {len(got)} rows")
            n_pass += 1
    # declared-but-missing dumps (query threw in Verify)
    for name in sorted(set(oracle) - set(names)):
        print(f"  [FAIL] {name}: declared in oracleSql but no dump (query threw?)")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} FAIL, {n_noracle} no-oracle ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
