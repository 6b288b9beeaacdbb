#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
fixture tables registered as views, loads the Spark parquet dump for the
same query, sorts columns by name (driver behavior), and compares
row-by-row with exact equality. Prints per-query PASS/FAIL + diff detail.
"""
import sys, json, os, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark read: {e}"); nfail += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); nfail += 1; continue
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} "
                  f"oracle={list(odf.columns)}"); nfail += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            nfail += 1; continue
        bad = []
        for c in sdf.columns:
            sv, ov = sdf[c].tolist(), odf[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if hasattr(a, "tolist"):
                    a = a.tolist()
                if hasattr(b, "tolist"):
                    b = b.tolist()
                def _nullish(x):
                    try:
                        return x is None or x != x  # None, NaN, NaT
                    except Exception:
                        return False
                eq = (a == b) or (_nullish(a) and _nullish(b))
                # numpy arrays (list columns)
                if not isinstance(eq, bool):
                    eq = bool(getattr(eq, "all", lambda: eq)())
                if not eq:
                    bad.append((c, i, a, b))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first:")
            for c, i, a, b in bad[:5]:
                extra = ""
                if isinstance(a, float) and isinstance(b, float):
                    extra = f" (absdiff={abs(a-b):.3e})"
                print(f"   [{c}][{i}] spark={a!r} oracle={b!r}{extra}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)"); npass += 1
    print(f"== {npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
