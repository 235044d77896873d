"""Generate a scaled-up test dataset from /root/testdata/sf0.1 by
key-offset replication — the sf1 evidence run (VERDICT r4 #3).

Replication rules (keys stay unique, dimensions stay fixed — the
realistic 10× shape: more facts per dimension):
- documents: doc_id offset per replica; text gets a per-replica
  suffix token (so the corpus grows in CONTENT, not just copies —
  exact-dup groups keep their sf0.1 structure instead of every doc
  gaining 9 clones); n_chars recomputed.
- embeddings: vec_id offset, vectors kept identical (near-dup ops see
  honest duplicate groups of `factor` — the harsher stress).  With
  ``--clone-cap`` the vectors follow the organic design too: bounded
  near-identical cliques (cosine ~0.99) plus independent pseudo-random
  growth (see the inline comment at the embeddings emit).
- events: event_id and user_id offset per replica (10× distinct
  users, the join-state dimension that actually grows at scale).
- orders/lineitem: o_orderkey/l_orderkey offset per replica in
  lockstep (the join key), customer/part/supplier refs unchanged.
- customer/supplier/part/nation/region: copied as-is (dimensions).

Output parquet is written with 64k-row row groups so Spark's scan
splits parallelize. Usage:
    python tools/make_scaled_sf.py [factor] [src_dir] [out_dir]
        [--clone-cap N] [--tables a,b,c]
defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1

``--clone-cap N`` is the ORGANIC-DUPLICATE mode (VERDICT r12 item 3):
the default replication gives every document `factor` near-identical
clones (the per-replica suffix token leaves word-3-gram Jaccard far
above any dedup threshold), so the LSH candidate-pair set grows as
factor² — a generator artifact that makes pair-output-bound dedup
timings measure the replication, not the engine. With a cap, replicas
0..N-1 keep the near-dup suffix (bounded clique size N, like organic
corpora where duplicate-group sizes don't grow with corpus scale) and
replicas >= N get a per-(replica, DOCUMENT) salt token spliced between
EVERY pair of words — every word 3-gram then contains a salt unique to
that one row, so those replicas share no shingles with anything (not
the original, not each other, not other docs). The salt must be
per-document, not merely per-replica: a shared replica salt creates a
`(salt, word, salt)` shingle for every middle token, which correlates
ALL same-replica docs through their common vocabulary and re-explodes
the LSH candidate set (measured: the first organic jaccard run never
finished at 50k docs). Duplicate mass under a cap is therefore
constant (the capped cliques + replica-0's own organic groups) while
the corpus grows — so at sf >= 1 the family's scaling gate measures
the corpus-scan term, exactly the part that must not be super-linear.

``--tables`` restricts output to a comma-list (the dedup family reads
only `documents`, so its organic evidence run doesn't need 1.4 GB of
replicated facts).
"""

from __future__ import annotations

import os
import sys

import duckdb

ROW_GROUP = 65536


def main() -> None:
    clone_cap = 0
    only: set[str] | None = None
    argv = sys.argv[1:]
    args: list[str] = []
    consumed: set[int] = set()
    for i, a in enumerate(argv):
        if i in consumed:
            continue
        if a == "--clone-cap":
            clone_cap = int(argv[i + 1])
            consumed.add(i + 1)
        elif a == "--tables":
            only = set(argv[i + 1].split(","))
            consumed.add(i + 1)
        elif not a.startswith("--"):
            args.append(a)
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = (
        args[2]
        if len(args) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=32")
    con.execute(f"CREATE VIEW reps AS SELECT i AS rep FROM range(0, {factor}) t(i)")

    def emit(table: str, sql: str) -> None:
        if only is not None and table not in only:
            return
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
    if clone_cap > 0:
        # organic mode: bounded clone cliques + salted unique growth
        # (PER-DOC salt — see module docstring for why per-replica
        # salts re-explode the pair set)
        text_expr = f"""
            CASE WHEN rep = 0 THEN d.text
                 WHEN rep < {clone_cap} THEN d.text || ' rep' || rep
                 ELSE replace(d.text, ' ',
                      ' s' || rep || 'd' || d.doc_id || ' ') END
        """
    else:
        text_expr = f"""
            CASE WHEN rep = 0 THEN d.text
                 ELSE d.text || ' rep' || rep END
        """
    emit(
        "documents",
        f"""
        SELECT d.doc_id + rep * {doc_span} AS doc_id,
               {text_expr} AS text,
               d.lang, d.source,
               CAST(length({text_expr}) AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet') d, reps
        """,
    )
    vec_span = span("embeddings", "vec_id")
    if clone_cap > 0:
        # organic mode for VECTORS (VERDICT r13 item 3), mirroring the
        # text design: replicas 0..cap-1 form bounded near-dup cliques
        # (rep 0 identical; 1 <= rep < cap gets deterministic noise of
        # ~0.14 L2 on a unit vector => cosine ~0.99 vs the original,
        # inside any theta >= 0.95 near-dup gate), and replicas >= cap
        # are re-drawn as independent pseudo-random vectors — at
        # dim 64 a random pair's cosine is ~N(0, 1/64), so P(cos >
        # 0.95) is ~0 and the salted mass shares no near-dup pairs
        # with anything. Duplicate mass is therefore constant while
        # the corpus grows, exactly like the text salt. NOTE the
        # measurement regime: this synthetic space has genuine random
        # mass above cosine 0.3-0.4 (the registry entries' broad-theta
        # pins), where the OUTPUT itself is quadratic on any corpus —
        # organic scale evidence for the embedding family must run at
        # theta >= 0.95 (tools/bench_organic.py does).
        emb_expr = f"""
            CASE WHEN rep = 0 THEN e.embedding
                 WHEN rep < {clone_cap} THEN CAST(list_transform(
                     e.embedding, (x, i) -> x
                       + (CAST(hash(e.vec_id * 131071 + rep * 8191 + i)
                           % 2001 AS BIGINT) - 1000) / 1000.0 * 0.03
                 ) AS FLOAT[])
                 ELSE CAST(list_transform(
                     e.embedding, (x, i) ->
                       (CAST(hash(e.vec_id * 524287 + rep * 2003 + i * 37)
                         % 2001 AS BIGINT) - 1000) / 1000.0 * 0.125
                 ) AS FLOAT[]) END
        """
    else:
        emb_expr = "e.embedding"
    emit(
        "embeddings",
        f"""
        SELECT e.vec_id + rep * {vec_span} AS vec_id,
               {emb_expr} AS embedding, e.label
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
