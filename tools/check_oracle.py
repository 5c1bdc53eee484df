#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables and compare against the Spark result
parquet dumped by graft.Verify (columns sorted by name, rows sorted, values
stringified before hashing — mirroring the driver contract).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, os, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    vals = df.astype(str)
    vals = vals.sort_values(by=list(vals.columns)).reset_index(drop=True)
    return vals

def h(df):
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # an empty oracle map means the SparkEntry wiring broke, not that there
    # is nothing to check — "0 ok, 0 fail" exit 0 would green-light a gate
    # that verified nothing. GRAFT_ALLOW_SUBSET=1 lifts the guard for local
    # iteration on a SPARK_GRAFT_ONLY-restricted Verify dump; the driver's
    # gate never sets either.
    if len(oracle) < 10 and os.environ.get("GRAFT_ALLOW_SUBSET") != "1":
        print(f"FAIL gate: only {len(oracle)} oracle queries found "
              f"(expected ~62) — oracle_sql.json wiring is broken")
        return 1
    ok = fail = 0
    # Registry manifest (written by graft.Verify): every declared query must
    # have executed. A query that threw during the Spark run, or one with no
    # oracle SQL and no parquet dump, fails the gate even though it has no
    # row in the oracle loop below (this is how q90 shipped broken in r6).
    reg_path = f"{out_dir}/registry.json"
    if os.path.exists(reg_path):
        reg = json.load(open(reg_path))
        for name in reg.get("failed", []):
            print(f"FAIL {name}: query threw during graft.Verify run")
            fail += 1
        for name in reg.get("queries", []):
            if name in reg.get("failed", []) or name in oracle:
                continue
            if not os.path.isdir(f"{out_dir}/{name}"):
                print(f"FAIL {name}: registered but no result dump (never executed)")
                fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            fail += 1
            continue
        try:
            compare(name, exp, got)
            ok += 1
        except CompareFail:
            fail += 1
        except Exception as e:
            # e.g. duplicate column labels from a query under development —
            # one pathological result must not abort the remaining checks
            print(f"FAIL {name}: compare error: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

class CompareFail(Exception):
    pass

def compare(name, exp, got):
        ce, cg = canon(exp), canon(got)
        if list(ce.columns) != list(cg.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} != {list(ce.columns)}")
            raise CompareFail()
        elif len(ce) != len(cg):
            print(f"FAIL {name}: rows {len(cg)} != {len(ce)}")
            raise CompareFail()
        elif h(ce) != h(cg):
            diff = (ce != cg)
            bad = diff.any(axis=1)
            print(f"FAIL {name}: hash mismatch ({bad.sum()}/{len(ce)} rows differ)")
            i = bad.idxmax()
            print(f"  first diff row {i}:\n  oracle: {ce.loc[i].to_dict()}\n  spark:  {cg.loc[i].to_dict()}")
            raise CompareFail()
        else:
            print(f"ok   {name} ({len(ce)} rows)")

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
