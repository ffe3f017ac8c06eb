"""Generate an N× scaled replica of a testdata dir by key-offset
replication — the local stand-in for the sf1/sf10 scales the driver
does not ship.

Each replica i offsets every primary/foreign key by i × (max_key+1)
CONSISTENTLY across referencing tables, so FK joins, the derived
edge model (doc_id arithmetic), and per-user/event distributions
keep exactly the base shape while row counts scale linearly. Text,
vectors, timestamps, and measure columns are replicated verbatim:
the cross-engine gate stays meaningful because Spark and DuckDB read
the SAME scaled parquet. region/nation are fixed dimension tables
and are copied as-is (scaling them would break the FK universe).

Usage: python tools/make_scaled.py <N> <out_dir> [base_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> list of (column, offset-source-table key) to shift per replica;
# every other column is carried through unchanged
KEYED = {
    "customer": [("c_custkey", "c_custkey")],
    "supplier": [("s_suppkey", "s_suppkey")],
    "part": [("p_partkey", "p_partkey")],
    "orders": [("o_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "p_partkey"),
        ("l_suppkey", "s_suppkey"),
    ],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}
COPY_ONLY = ["region", "nation"]
KEY_HOME = {  # key column -> table that owns its max
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> int:
    n = int(sys.argv[1])
    out_dir = sys.argv[2]
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    offs = {
        key: con.execute(
            f"SELECT max({key}) + 1 FROM "
            f"read_parquet('{base}/{home}.parquet')"
        ).fetchone()[0]
        for key, home in KEY_HOME.items()
    }
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{base}/{t}.parquet')"
            ).fetchall()
        ]
        shifted = {c: f"{c} + r.i * {offs[src]} AS {c}" for c, src in keys}
        select = ", ".join(shifted.get(c, c) for c in cols)
        con.execute(
            f"COPY (SELECT {select} "
            f"      FROM read_parquet('{base}/{t}.parquet') "
            f"      CROSS JOIN range({n}) r(i)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")
    # completion sentinel, written LAST: consumers (bench.py sf1
    # canary, battery scripts) gate on this so a partially-generated
    # dir from an interrupted run is regenerated, not silently reused
    with open(os.path.join(out_dir, "_SCALED_DONE"), "w") as fh:
        fh.write(f"n={n} base={base}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
