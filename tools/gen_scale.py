#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
replicating every fact table K times with consistently shifted keys
(driver-side tooling, like check.py — never a Scala dependency).

Usage: python3 tools/gen_scale.py SRC_DIR DST_DIR K

Each replica k shifts every key column by k * (table's key stride =
max key + 1 in SRC), and FK columns shift by the REFERENCED table's
stride, so referential structure is preserved exactly (o_custkey stays
a real customer, l_orderkey a real order, …). Dimension tables
(region, nation) stay fixed — scale-factor semantics. Timestamps and
payloads are unchanged: K× the rows in the same calendar window is
exactly the density growth a decade of production data has, and exact
text replicas deliberately stress the dedup family (every doc gains
K−1 exact duplicates).

Purpose: the sf1 rehearsal — run the full Verify registry + DuckDB
oracle compare at ~10× the driver's sf0.1 to flush the next
rounding-tie / decimal-width bug class a decade up (the driver gate
itself only runs sf0.01).
"""
import sys

import duckdb

# table -> {column: stride_source_table} (keys shift by their own
# table's stride, FKs by the referenced table's)
PLAN = {
    "customer":   {"c_custkey": "customer"},
    "supplier":   {"s_suppkey": "supplier"},
    "part":       {"p_partkey": "part"},
    "orders":     {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem":   {"l_orderkey": "orders", "l_partkey": "part",
                   "l_suppkey": "supplier"},
    "events":     {"event_id": "events", "user_id": "users"},
    "documents":  {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ["region", "nation"]
# stride key per stride-source (the column whose max+1 is the stride)
STRIDE_KEY = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id", "users": "user_id",
    "documents": "doc_id", "embeddings": "vec_id",
}
STRIDE_TABLE = {"users": "events"}  # user_id lives in events


def main(src: str, dst: str, k: int) -> None:
    con = duckdb.connect()
    strides = {}
    for name, key in STRIDE_KEY.items():
        table = STRIDE_TABLE.get(name, name)
        # stride = MAX(key)+1 assumes non-negative, non-null keys; a
        # null or negative key would silently collide shifted copies —
        # fail loudly instead
        mn, mx, nulls = con.execute(
            f"SELECT MIN({key}), MAX({key}), "
            f"COUNT(*) - COUNT({key}) FROM '{src}/{table}.parquet'"
        ).fetchone()
        assert nulls == 0, f"{table}.{key}: {nulls} NULL keys"
        assert mn is not None and mn >= 0, f"{table}.{key}: MIN={mn} < 0"
        strides[name] = mx + 1
    import os
    os.makedirs(dst, exist_ok=True)
    for t in FIXED:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[gen] {t}: copied")
    for t, shifts in PLAN.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + k.range * {strides[shifts[c]]} AS {c}" if c in shifts
            else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN range({k}) k ORDER BY {list(shifts)[0]}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"[gen] {t}: {n} rows (x{k})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
