#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL (oracle_sql.json) in DuckDB over views named after
the parquet tables in <sf_dir>, and compares row multisets (columns
sorted by name, rows sorted, values normalized).
"""
import sys, os, json, math, glob, re

import duckdb

# Wire-format gate (round-9 VERDICT #2): the driver's hash layer only
# round-trips {BIGINT,INT,DOUBLE,VARCHAR,BOOLEAN,DATE/TIMESTAMP,
# arrays thereof} losslessly. DECIMAL and HUGEINT columns hash
# differently across the two engines even when values are identical
# (the exact failure mode of the 5 round-8 hash FAILs), so ANY
# occurrence of those families on either side of the wire is a FAIL
# regardless of value equality.
HAZARD = re.compile(r"DECIMAL|HUGEINT|UBIGINT|UHUGEINT", re.I)


def wire_hazards(side, cols, types):
    return [f"{side}.{c}:{t}" for c, t in zip(cols, map(str, types))
            if HAZARD.search(str(t))]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; -0.0 vs 0.0 normalized
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    names = sorted(set(oracle) | {d for d in os.listdir(out_dir)
                                  if os.path.isdir(os.path.join(out_dir, d))})
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        hazards = wire_hazards("spark", rel.columns, rel.types)
        got_cols, got = canon(rel.columns, rel.fetchall())
        if name not in oracle:
            if hazards:
                print(f"FAIL {name}: wire-format hazard {hazards}"); n_fail += 1; continue
            print(f"rowsonly {name}: {len(got)} rows"); n_pass += 1; continue
        try:
            res = con.sql(oracle[name])
            hazards += wire_hazards("oracle", res.columns, res.types)
            exp_cols, exp = canon(res.columns, res.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if hazards:
            print(f"FAIL {name}: wire-format hazard {hazards}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows != {len(exp)}"); n_fail += 1; continue
        if got != exp:
            bad = next(i for i, (g, e) in enumerate(zip(got, exp)) if g != e)
            print(f"FAIL {name}: row {bad}:\n  spark {got[bad]}\n  duck  {exp[bad]}")
            n_fail += 1; continue
        if len(got) == 0:
            print(f"WARN {name}: matches but EMPTY (degenerate)")
        print(f"ok   {name}: {len(got)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
