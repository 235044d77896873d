"""Generate a scaled-up test dataset from /root/testdata/sf0.1 by
key-offset replication — the sf1 evidence run (VERDICT r4 #3).

Replication rules (keys stay unique, dimensions stay fixed — the
realistic 10× shape: more facts per dimension):
- documents: doc_id offset per replica; text gets a per-replica
  suffix token (so the corpus grows in CONTENT, not just copies —
  exact-dup groups keep their sf0.1 structure instead of every doc
  gaining 9 clones); n_chars recomputed.
- embeddings: vec_id offset, vectors kept identical (near-dup ops see
  honest duplicate groups of `factor` — the harsher stress).
- events: event_id and user_id offset per replica (10× distinct
  users, the join-state dimension that actually grows at scale).
- orders/lineitem: o_orderkey/l_orderkey offset per replica in
  lockstep (the join key), customer/part/supplier refs unchanged.
- customer/supplier/part/nation/region: copied as-is (dimensions).

Output parquet is written with 64k-row row groups so Spark's scan
splits parallelize. Usage:
    python tools/make_scaled_sf.py [factor] [src_dir] [out_dir]
defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

ROW_GROUP = 65536


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=32")
    con.execute(f"CREATE VIEW reps AS SELECT i AS rep FROM range(0, {factor}) t(i)")

    def emit(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def span(table: str, key: str) -> int:
        return (
            con.execute(
                f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )

    doc_span = span("documents", "doc_id")
    emit(
        "documents",
        f"""
        SELECT d.doc_id + rep * {doc_span} AS doc_id,
               CASE WHEN rep = 0 THEN d.text
                    ELSE d.text || ' rep' || rep END AS text,
               d.lang, d.source,
               CAST(length(CASE WHEN rep = 0 THEN d.text
                    ELSE d.text || ' rep' || rep END) AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet') d, reps
        """,
    )
    vec_span = span("embeddings", "vec_id")
    emit(
        "embeddings",
        f"""
        SELECT e.vec_id + rep * {vec_span} AS vec_id, e.embedding, e.label
        FROM read_parquet('{src}/embeddings.parquet') e, reps
        """,
    )
    ev_span = span("events", "event_id")
    uid_span = span("events", "user_id")
    emit(
        "events",
        f"""
        SELECT e.event_id + rep * {ev_span} AS event_id, e.ts,
               e.user_id + rep * {uid_span} AS user_id,
               e.event_type, e.value, e.props
        FROM read_parquet('{src}/events.parquet') e, reps
        """,
    )
    ok_span = span("orders", "o_orderkey")
    con.execute(f"CREATE VIEW src_orders AS SELECT * FROM read_parquet('{src}/orders.parquet')")
    cols = [r[0] for r in con.execute("DESCRIBE src_orders").fetchall()]
    o_cols = ", ".join(
        f"o.o_orderkey + rep * {ok_span} AS o_orderkey" if c == "o_orderkey" else f"o.{c}"
        for c in cols
    )
    emit("orders", f"SELECT {o_cols} FROM src_orders o, reps")
    con.execute(f"CREATE VIEW src_li AS SELECT * FROM read_parquet('{src}/lineitem.parquet')")
    li_cols = [r[0] for r in con.execute("DESCRIBE src_li").fetchall()]
    l_cols = ", ".join(
        f"l.l_orderkey + rep * {ok_span} AS l_orderkey" if c == "l_orderkey" else f"l.{c}"
        for c in li_cols
    )
    emit("lineitem", f"SELECT {l_cols} FROM src_li l, reps")
    for dim in ["customer", "supplier", "part", "nation", "region"]:
        emit(dim, f"SELECT * FROM read_parquet('{src}/{dim}.parquet')")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
