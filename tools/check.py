#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB result of
<outDir>/oracle_sql.json — columns sorted by name, rows sorted, values
compared exactly (floats to 1e-9 relative for triage; exact mismatches
are still reported since the driver hashes exactly).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def rows_of(rel):
    """One execution per side: values (column-name-sorted tuples, the
    driver's compare order) AND pandas dtypes (the driver's hash medium)
    both come from a single .fetchall+df pass over an already-executed
    relation — heavy oracles (recursive CC CTEs, bm25) must not run twice.
    """
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    df = rel.df()
    data = list(df.itertuples(index=False, name=None))
    out = [tuple(r[i] for i in order) for r in data]
    dtypes = [str(df.dtypes.iloc[i]) for i in order]
    return [cols[i] for i in order], out, dtypes

def eq_exact(a, b):
    """Strict equality with the driver's null/NaN semantics: identity
    covers None and singletons like pandas NaT, NaN compares equal to
    NaN (tuple == would say False)."""
    if a is b: return True
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return True
    return a == b

def cmp_vals(a, b):
    """eq_exact plus a 1e-9 relative float tolerance (triage only — the
    driver hashes exactly, so tolerant-only matches still WARN)."""
    if eq_exact(a, b): return True
    if isinstance(a, float) and isinstance(b, float):
        return abs(a-b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got_cols, got, gdt = rows_of(con.sql(
                f"SELECT * FROM '{spark_path}/*.parquet'"))
            exp_cols, exp, edt = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}"); n_bad += 1; continue
        # the driver bridges both sides through pandas and hashes values:
        # a dtype drift (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
        # hash-fails even when every value compares equal (r4 pack_chunks)
        if gdt != edt:
            print(f"WARN {name}: pandas dtypes differ (driver may hash-fail)")
            for c, g, e in zip(got_cols, gdt, edt):
                if g != e:
                    print(f"  {c}: spark={g} oracle={e}")
        gs, es = sorted(got, key=repr), sorted(exp, key=repr)
        if len(gs) != len(es):
            print(f"FAIL {name}: {len(gs)} rows vs {len(es)}"); n_bad += 1; continue
        bad = None
        exact = True
        for i, (g, e) in enumerate(zip(gs, es)):
            if not all(eq_exact(x, y) for x, y in zip(g, e)):
                exact = False
                if not all(cmp_vals(x, y) for x, y in zip(g, e)):
                    bad = (i, g, e); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}")
            n_bad += 1
        elif not exact:
            print(f"WARN {name}: matches to 1e-9 but NOT exactly (driver may hash-fail)")
            n_ok += 1
        else:
            print(f"OK   {name} ({len(gs)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
