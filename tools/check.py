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
        # Driver-faithful TYPE gate: the driver hashes typed values, so a
        # DuckDB HUGEINT (sum of BIGINT) vs Spark BIGINT mismatch fails
        # there even when every value is numerically equal (r4
        # llm_pipeline_e2e, r5 llm_domain_mix). Both frames come through
        # duckdb.fetchdf(), so pandas dtype KIND is the faithful proxy:
        # HUGEINT surfaces as float64 ('f') while BIGINT is int64 ('i').
        # Width within a kind (int32 vs int64) is NOT compared — the
        # driver provably passes those (win_rank et al. green in r5 with
        # Spark int32 vs DuckDB BIGINT).
        dtbad = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                 for c in sdf.columns
                 if sdf[c].dtype.kind != odf[c].dtype.kind]
        if dtbad:
            print(f"FAIL {name}: column dtype mismatch (driver typed-hash "
                  f"would fail):")
            for c, a, b in dtbad:
                print(f"   [{c}] spark={a} oracle={b}")
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
