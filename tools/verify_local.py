#!/usr/bin/env python3
"""Local twin of the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB over the same
parquet tables, loads the Spark-written result parquet, sorts columns by
name and rows by all columns, and compares cell-by-cell (exact for
ints/strings, tight for floats so we catch representation drift early).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        # exact bit match is the goal; tolerate nothing so drift surfaces
        return a == b
    return str(a) == str(b)


def main(sf_dir, out_dir, record_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Seal-time self-written correctness record (VERDICT r15 #2): the
    # driver's per-query shape, written whenever a record path is given,
    # so an empty driver-side CORRECTNESS_r{N}.json can never again leave
    # a round without a machine-checkable correctness artifact.
    record = {}

    def rec(name, rows_match, schema_match, hash_match, sr, orr, err):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}

    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            rec(name, False, False, False, None, None, f"oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            rec(name, False, False, False, None, len(want),
                f"spark result missing: {e}")
            n_fail += 1
            continue
        wc, gc = sorted(want.columns), sorted(got.columns)
        if [c.lower() for c in wc] != [c.lower() for c in gc]:
            print(f"FAIL {name}: columns differ: oracle={wc} spark={gc}")
            rec(name, len(want) == len(got), False, False, len(got), len(want),
                f"columns differ: oracle={wc} spark={gc}")
            n_fail += 1
            continue
        want = want[wc]
        got = got[gc]
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(want)} spark={len(got)}")
            rec(name, False, True, False, len(got), len(want), None)
            n_fail += 1
            continue
        wrows = sorted(want.itertuples(index=False, name=None), key=repr)
        grows = sorted(got.itertuples(index=False, name=None), key=repr)
        bad = None
        for i, (wr, gr) in enumerate(zip(wrows, grows)):
            for j, (a, b) in enumerate(zip(wr, gr)):
                if not cmp_cell(a, b):
                    bad = (i, wc[j], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
            rec(name, True, True, False, len(got), len(want),
                f"row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            rec(name, True, True, True, len(got), len(want), None)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if record_path:
        with open(record_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {record_path} ({len(record)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
