#!/usr/bin/env python3
"""Adversarial-corpus generator for the differential oracle audit.

Copies an sf directory and appends hostile rows to documents/embeddings
(and optionally events): nulls in every column, empty/whitespace/unicode
texts, duplicate and near-duplicate texts, zero-norm / NaN / Inf /
wrong-dimension / null-element vectors. The shipped generator data is
uniformly clean (no nulls, no empties), so the oracle gate has never
exercised these domains — the same blind spot that hid the q55_scale
edge-membership bug (ADVICE r7) and the five r8 twin-audit bugs.

Usage: python3 tools/gen_adversarial.py <src_sf_dir> <dst_dir>

Then:  sbt "runMain graft.Verify <dst_dir> /tmp/adv_out d,t,s,mm"
       python3 tools/check_oracle.py /tmp/adv_out <dst_dir>

r11-continued adds lineitem rows (nulls per column, an all-null group,
fractional quantities) targeting the percentile family's null and
weight-conversion contracts: `Verify <dst> /tmp/adv_out q60,q61,q7`
passes 4/4 with the all-null group emitting null percentiles on both
engines — the audit that would have caught the two latent divergences
the r11 review found before they were fixed.
"""
import shutil
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

NAN = float("nan")
INF = float("inf")


def docs_rows(base_rows, base=10000):
    """Adversarial documents rows; ids start past max(doc_id) so they stay
    unique at ANY corpus SF (fixed 10000 collided with sf1's 50k docs)."""
    dup_text = base_rows[0][1]  # exact duplicate of doc 0
    near = base_rows[1][1].split()
    near[len(near) // 2] = "CHANGED"
    near_text = " ".join(near)
    long_text = "spark data query join " * 2500  # ~55k chars
    rows = [
        (base + 0, None, "en", "srcA", 0),                      # null text
        (base + 1, "", "en", "srcA", 0),                        # empty text
        (base + 2, "   \t\n  ", "en", "srcA", 7),               # whitespace only
        (base + 3, "naïve café \U0001f600\U0001f600 中文文本 العربية mixed", "zh", "srcB", 30),
        (base + 4, "éclair combininǵ marks", "fr", "srcB", 22),
        (base + 5, "a", "en", "srcA", 1),                       # single char
        (base + 6, "!!! ??? ... ;;; ---", "en", "srcC", 19),    # punctuation only
        (base + 7, "line1\nline2\t\"quoted\" \\backslash\\ 'single'", "en", "srcC", 41),
        (base + 8, long_text, "en", "srcD", len(long_text)),    # very long
        (base + 9, dup_text, "es", "srcE", len(dup_text)),      # exact dup of doc 0
        (base + 10, near_text, "zh", "srcE", len(near_text)),    # near-dup of doc 1
        (base + 11, "plain words here", None, "srcA", 16),       # null lang
        (base + 12, "other words here", "en", None, 16),         # null source
        (base + 13, "third words here", "en", "srcA", None),     # null n_chars
        (base + 14, "short", "en", "srcA", 999),                 # n_chars lies
        (base + 15, "orphan words", None, None, None),           # all meta null
        (base + 16, ("dup " * 100).strip(), "en", "srcF", 399),  # one word repeated
        (base + 17, "tiny doc", "en", "srcF", 8),                # shorter than shingle k
        (None, "null id document text", "en", "srcF", 21),   # null doc_id
        (base + 19, "  padded text  ", "en", "srcA", 15),
        (base + 20, "SPARK Data QUERY Mixed CASE", "en", "srcA", 27),
        (base + 21, "123 456 7.89 $100 100%", "en", "srcA", 22),
        (base + 22, "crlf\r\nline endings\r\n", "en", "srcA", 20),
        (base + 23, "nbsp and​zero width", "en", "srcA", 19),
        # 19-digit doc_id at the Long extreme (r14): stresses t28's 19-char
        # tag pad, t30's key-span cutoff arithmetic (lo + (hi-lo)//2 must
        # not overflow), p4's vintage split (this row is the whole delta),
        # and any latent doc_id arithmetic that assumed small ids.
        (9223372036854775000, "nineteen digit doc id words here", "en", "srcA", 32),
    ]
    return rows


def emb_rows(base_rows, base=10000):
    dim = len(base_rows[0][1])
    v0 = list(base_rows[0][1])
    rows = [
        (base + 0, None, 0),                                  # null embedding
        (base + 1, [], 0),                                    # empty array
        (base + 2, [0.0] * dim, 1),                           # zero vector
        (base + 3, [1e30] * dim, 1),                          # huge magnitude
        (base + 4, [1e-30] * dim, 2),                         # tiny magnitude
        (base + 5, [-x for x in v0], 2),                      # negated copy of vec 0
        (base + 6, v0, 0),                                    # exact dup of vec 0
        (base + 7, v0[:8] + [2.0] * (dim - 8), None),         # null label
        (base + 8, [0.5] * dim, -5),                          # negative label
        (base + 9, [0.25] * dim, 9999),                       # singleton label
        (base + 10, [None] + v0[1:], 3),                       # null element inside
        (base + 11, [1.0, 2.0, 3.0], 3),                       # wrong dimension
        (base + 12, [NAN] * dim, 4),                           # NaN elements
        (base + 13, [INF] + [1.0] * (dim - 1), 4),             # +Inf element
        (base + 14, [-INF] + [1.0] * (dim - 1), 4),            # -Inf element
    ]
    return rows


def events_rows(base=100000):
    """Adversarial events rows; ids start past max(event_id) (collision-
    safe at any SF), ts inside the shipped 2024-01 window so
    session/window logic sees them as peers."""
    import datetime as dt

    def ts(day, h, m, s, us=0):
        return dt.datetime(2024, 1, day, h, m, s, us)

    return [
        (base + 0, ts(5, 0, 0, 0), None, "click", 10.0, '{"k": 1}'),      # null user
        (base + 1, ts(5, 0, 1, 0), 13, None, 11.0, '{"k": 2}'),           # null type
        (base + 2, ts(5, 0, 2, 0), 13, "click", None, '{"k": 3}'),        # null value
        (base + 3, None, 13, "click", 12.0, '{"k": 4}'),                  # null ts
        (base + 4, ts(5, 0, 3, 0), 13, "click", NAN, '{"k": 5}'),         # NaN value
        (base + 5, ts(5, 0, 4, 0), 13, "click", INF, '{"k": 6}'),         # +Inf
        (base + 6, ts(5, 0, 5, 0), 13, "click", -INF, '{"k": 7}'),        # -Inf
        (base + 7, ts(5, 0, 6, 0), 13, "click", -42.5, '{"k": 8}'),       # negative
        (base + 8, ts(5, 0, 7, 0), 14, "click", 1.0, None),               # null props
        (base + 9, ts(5, 0, 8, 0), 14, "click", 2.0, "not json {"),       # bad props
        (base + 10, ts(5, 0, 9, 0), 14, "click", 3.0, "{}"),               # empty obj
        (base + 11, ts(5, 0, 9, 0), 14, "click", 4.0, '{"k": 9}'),         # dup (user,ts)
        (base + 12, ts(5, 0, 9, 0), 14, "purchase", 5.0, '{"k": 10}'),     # same ts, other type
        (base + 13, ts(5, 0, 10, 0), -7, "click", 6.0, '{"k": 11}'),       # negative user
        (base + 14, ts(5, 0, 11, 0), 999999, "ghost_type", 7.0, '{"k": 12}'),  # unseen type
        (base + 15, ts(5, 0, 11, 1), 999999, "ghost_type", 7.0, '{"k": 12}'),  # ghost peer
        (None, ts(5, 0, 12, 0), 14, "click", 8.0, '{"k": 13}'),         # null event_id
        (base + 17, ts(5, 0, 13, 0, 123456), 14, "click", 0.0, '{"k": 14}'),  # zero value
        # r13: a 1-row NON-NULL type — the n = 1 ANSI divide-by-zero class
        # (e15 stddev, e22 rho, e24 mad). The earlier null-type 1-row group
        # was silently pruned by Catalyst's inner-join null filter before
        # the stats projection ran, so it never exercised these paths.
        (base + 18, ts(5, 0, 14, 0), 15, "solo_type", 3.3, '{"k": 15}'),
    ]


def rd(src, table):
    """Parquet path for DuckDB: driver corpora ship single FILES,
    GenData corpora (spark-warehouse/sf1+) are Spark-written DIRECTORIES
    of part files — glob those (check_oracle's convention)."""
    p = Path(src) / f"{table}.parquet"
    return f"{p}/*.parquet" if p.is_dir() else str(p)


def main(src, dst):
    src, dst = Path(src), Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for p in src.glob("*.parquet"):
        if p.is_dir():
            # Flatten directory tables to one file so the hostile corpus
            # is uniform regardless of the source layout.
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{p}/*.parquet')) TO "
                f"'{dst / p.name}' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(p, dst / p.name)

    base_docs = con.execute(f"SELECT * FROM read_parquet('{rd(src, 'documents')}') ORDER BY doc_id").fetchall()
    doc_base = max((r[0] for r in base_docs if r[0] is not None), default=0) + 1
    docs = base_docs + docs_rows(base_docs, doc_base)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs], pa.string()),
            "lang": pa.array([r[2] for r in docs], pa.string()),
            "source": pa.array([r[3] for r in docs], pa.string()),
            "n_chars": pa.array([r[4] for r in docs], pa.int64()),
        }
    )
    pq.write_table(t, dst / "documents.parquet")

    base_emb = con.execute(f"SELECT * FROM read_parquet('{rd(src, 'embeddings')}') ORDER BY vec_id").fetchall()
    emb_base = max((r[0] for r in base_emb if r[0] is not None), default=0) + 1
    embs = base_emb + emb_rows(base_emb, emb_base)
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in embs], pa.int64()),
            "embedding": pa.array([list(r[1]) if r[1] is not None else None for r in embs], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in embs], pa.int32()),
        }
    )
    pq.write_table(t, dst / "embeddings.parquet")

    base_ev = con.execute(f"SELECT * FROM read_parquet('{rd(src, 'events')}') ORDER BY event_id").fetchall()
    ev_base = max((r[0] for r in base_ev if r[0] is not None), default=0) + 1
    evs = base_ev + events_rows(ev_base)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in evs], pa.int64()),
            "ts": pa.array([r[1] for r in evs], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in evs], pa.int64()),
            "event_type": pa.array([r[3] for r in evs], pa.string()),
            "value": pa.array([r[4] for r in evs], pa.float64()),
            "props": pa.array([r[5] for r in evs], pa.string()),
        }
    )
    pq.write_table(t, dst / "events.parquet")

    # lineitem adversarial rows (r11-continued): the quantile family's null
    # semantics (q7/q60: null VALUES leave the ranks but the group still
    # emits; all-null groups emit null percentiles) and q61's
    # trunc-toward-zero weight contract on FRACTIONAL quantities were both
    # invisible on the uniformly clean corpus — this is the domain where
    # the r11 review found two latent oracle divergences. Orderkeys from
    # 10_000_000 keep keys unique; flag "Z" forms an all-null group.
    # orders adversarial row (r13): one sane row with a UNIQUE status so
    # q8_moments sees an n = 1 group — its sample-variance (n-1) division
    # is the same ANSI divide-by-zero class the events corpus pins.
    # customer adversarial rows (r13-continued, q66 entity matching): null
    # keys/names/segments, a non-ASCII name (OUTSIDE the fuzzy-match
    # domain — byte vs codepoint levenshtein diverges there, so the ASCII
    # guard must exclude it on both engines), a true fuzzy cluster in one
    # (nation, segment) block, the same name in OTHER nations/segments
    # (must NOT match), a lev-1 name whose edit falls outside the last-3
    # blocking window (pins the blocking recall boundary as a contract,
    # not an accident), and short/empty names that all land in the
    # empty-prefix block. Custkeys from 90_000_000 stay unique at any SF.
    base_cu = con.execute(
        f"SELECT * FROM read_parquet('{rd(src, 'customer')}') ORDER BY c_custkey"
    ).fetchall()
    cus = base_cu + [
        (None, "Null Key Corp", 5, 100.0, "BUILDING"),           # null custkey
        (90000000, None, 5, 100.0, "BUILDING"),                  # null name
        (90000001, "Custömer#000000001", 5, 100.0, "BUILDING"),  # non-ASCII
        (90000002, "Acme Corp", 7, 50.0, "AUTOMOBILE"),          # fuzzy base
        (90000003, "Acme Corq", 7, 25.0, "AUTOMOBILE"),          # lev 1 → match
        (90000004, "Acme Corp", 7, None, "AUTOMOBILE"),          # lev 0 dup → match
        (90000005, "Acme Corp", 8, 10.0, "AUTOMOBILE"),          # other nation
        (90000006, "Acme Corp", 7, 10.0, "MACHINERY"),           # other segment
        (90000007, "Acme Xorp", 7, 10.0, "AUTOMOBILE"),          # lev 1 outside block
        (90000008, "ab", 7, 10.0, "AUTOMOBILE"),                 # empty-prefix block
        (90000009, "xy", 7, 10.0, "AUTOMOBILE"),                 # lev 2 vs ab
        (90000010, "ay", 7, 10.0, "AUTOMOBILE"),                 # lev 1 vs ab AND xy
        (90000011, "", 7, 10.0, "AUTOMOBILE"),                   # empty name
        (90000012, "Name With  Spaces ", 7, -5.0, "AUTOMOBILE"),
        (90000013, None, None, None, None),                      # all null
        (90000014, "Null Nation", None, 10.0, "BUILDING"),       # null nationkey
        (90000015, "Null Segment", 7, 10.0, None),               # null segment
    ]
    t = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in cus], pa.int64()),
            "c_name": pa.array([r[1] for r in cus], pa.string()),
            "c_nationkey": pa.array([r[2] for r in cus], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in cus], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in cus], pa.string()),
        }
    )
    pq.write_table(t, dst / "customer.parquet")

    base_or = con.execute(
        f"SELECT * FROM read_parquet('{rd(src, 'orders')}') ORDER BY o_orderkey"
    ).fetchall()
    od0 = base_or[0][4]
    ors = base_or + [
        (10000000, 899, "Q", 50000.0, od0, "1-URGENT"),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in ors], pa.int64()),
            "o_custkey": pa.array([r[1] for r in ors], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in ors], pa.string()),
            "o_totalprice": pa.array([r[3] for r in ors], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in ors], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in ors], pa.string()),
        }
    )
    pq.write_table(t, dst / "orders.parquet")

    base_li = con.execute(
        f"SELECT * FROM read_parquet('{rd(src, 'lineitem')}') "
        "ORDER BY l_orderkey, l_linenumber"
    ).fetchall()
    ts0 = base_li[0][10]
    lis = base_li + [
        # (okey, pkey, skey, lineno, qty, price, disc, tax, flag, status, ts)
        (10000000, None, 1, 1, 2.0, 100.0, 0.0, 0.0, "A", "O", ts0),   # null partkey only
        (10000001, 5, 1, None, 3.0, 200.0, 0.0, 0.0, "A", "O", ts0),   # null linenumber only
        (10000002, None, 1, None, 1.0, 300.0, 0.0, 0.0, "N", "O", ts0),  # both null
        (10000003, 7, 1, 2, 2.7, 400.0, 0.0, 0.0, "R", "F", ts0),      # fractional qty (trunc=2)
        (10000004, 8, 1, 3, 0.7, 500.0, 0.0, 0.0, "R", "F", ts0),      # qty truncs to 0 (no weight)
        (10000005, 9, 1, 4, None, 600.0, 0.0, 0.0, "N", "O", ts0),     # null qty
        (10000006, 10, 1, 5, 4.0, None, 0.0, 0.0, "N", "O", ts0),      # null price
        (10000007, None, 1, None, None, None, None, None, "Z", "O", ts0),  # all-null group
        # r12 (profiler family): null ORDERKEY exercises q64's null-safe
        # split (a naive `% 2` pair drops the row from both halves) and
        # q63's key-column null count; null shipdate covers the timestamp
        # column's null path. Flag stays non-null so no new group appears
        # in the quantile-family audits.
        (None, 11, 1, 6, 1.0, 700.0, 0.0, 0.0, "A", "O", None),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in lis], pa.int64()),
            "l_partkey": pa.array([r[1] for r in lis], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in lis], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in lis], pa.int32()),
            "l_quantity": pa.array([r[4] for r in lis], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in lis], pa.float64()),
            "l_discount": pa.array([r[6] for r in lis], pa.float64()),
            "l_tax": pa.array([r[7] for r in lis], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in lis], pa.string()),
            "l_linestatus": pa.array([r[9] for r in lis], pa.string()),
            "l_shipdate": pa.array([r[10] for r in lis], pa.timestamp("us")),
        }
    )
    pq.write_table(t, dst / "lineitem.parquet")
    print(
        f"wrote {dst}: documents {len(docs)} rows, embeddings {len(embs)} rows, "
        f"events {len(evs)} rows, lineitem {len(lis)} rows, orders {len(ors)} rows, "
        f"customer {len(cus)} rows"
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
