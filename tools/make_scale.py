"""Deterministic scale-up of the sf0.1 fixtures for endurance runs
(VERDICT r5 #5: "the next boundary crossings and the first real
skew/memory effects appear at 10x sf0.1").

Builds ``/tmp/sfX`` as K key-offset copies of the sf0.1 TPC-H tables
with referential integrity preserved:

- customer/orders/lineitem/part/supplier: copy k adds ``k * OFFSET``
  to every entity key (custkey, orderkey, partkey, suppkey) on both
  the dimension and fact sides, so every join relationship holds and
  per-group revenues grow 10x (the monetary-rounding stress the
  endurance run is for).
- events: copy k offsets event_id and user_id (independent user
  populations; 10x rows per tumbling window).
- nation/region: fixed-size dims, one copy (keys unchanged — the
  copies' customers/suppliers keep their nationkeys, exactly like a
  larger TPC-H SF).
- documents/embeddings: one copy.  Text/vector operators are per-row
  quantized (order-independent by construction) and their pair-space
  operators are df-capped; duplicating identical docs 10x would only
  manufacture a degenerate everything-is-a-dup corpus, which is not
  what a larger real corpus looks like.

Offsets are powers of ten above each key's max so scaled keys stay
readable (copy 3's order 42 = 3_000_042) and BIGINT-safe.

Usage: python tools/make_scale.py [K] [out_dir]   (default 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# key column -> tables it appears in (under its per-table name)
KEYED = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
}

OFFSET = {
    "cust": 10**6,
    "order": 10**7,
    "part": 10**6,
    "supp": 10**5,
    "event": 10**7,
    "user": 10**6,
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYED.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}'"
        ).fetchall()]
        selects = []
        for i in range(k):
            proj = []
            for c in cols:
                off = next(
                    (OFFSET[kind] for kc, kind in keys if kc == c), None
                )
                if off is not None and i > 0:
                    proj.append(f"{c} + {i * off} AS {c}")
                else:
                    proj.append(c)
            selects.append(f"SELECT {', '.join(proj)} FROM '{src}'")
        q = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")
    for table in ["nation", "region", "documents", "embeddings"]:
        shutil.copy(f"{SRC}/{table}.parquet", f"{out}/{table}.parquet")
        print(f"{table}: copied 1x")


if __name__ == "__main__":
    main()
