"""Deterministic scale-factor data generator (sf1 and beyond).

The driver ships read-only warehouses at sf0.001/0.01/0.1
(`TESTDATA.md`); every scale claim in SCALE.md above sf0.1 was
extrapolation. This generator produces the SAME star schema with the
SAME value domains and id structure (contiguous 0-based keys,
TPC-H-ish distributions, 30-day event stream, word-salad documents
with injected exact/near duplicates, clustered unit-norm embeddings)
at any sf, so bench.py and tools/diffcheck.py can run at sf1+
unchanged. Seeded — same sf, same bytes.

Row counts follow the driver's observed scaling (rows at sf0.01 /
sf0.1 ÷ sf): lineitem ≈ 6M·sf (1-7 lines per order), orders 1.5M·sf,
customer 150k·sf, part 200k·sf, supplier 10k·sf, events 1M·sf over
15k·sf users, documents 50k·sf, embeddings 20k·sf.

All timestamps are parquet TIMESTAMP(MICROS), matching the driver
warehouses' physical encoding (verified against their footers; the
catalog's `_normalize_ts` would absorb a NANOS/int64 variant too).

Usage: python tools/gen_sf.py SF OUT_DIR   # e.g. 1 /tmp/sfgen/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
PART_ADJ = ["small", "large", "red", "blue", "hot", "cold", "shiny", "dim"]
PART_NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "pin", "disk"]
PART_TYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "a the line sort window order data column join small customer query "
    "big group stream filter".split()
)

# epoch bases (µs / ns) — pure-integer datetime arithmetic, vectorized
_US_DAY = 86_400_000_000
_ORDERS_EPOCH_DAYS = 9131  # 1995-01-01 in days since 1970-01-01
_EVENTS_EPOCH_NS = 1_704_067_200 * 1_000_000_000  # 2024-01-01 UTC


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, version="2.6", compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _chunk_writer(out_dir: str, name: str):
    """Multi-file variant of _write for tables too large to hold in
    memory at once (sf100 lineitem is ~600M rows ≈ 50 GB of numpy
    transients if generated in one shot). Files land inside a
    `<name>.parquet/` DIRECTORY — Spark reads a directory of parquet
    parts exactly like a single file, so the catalog needs no change.
    Returns (append(table), close())."""
    path = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(path, exist_ok=True)
    state = {"i": 0, "rows": 0}

    def append(table: pa.Table) -> None:
        part = os.path.join(path, f"part-{state['i']:05d}.parquet")
        pq.write_table(table, part, version="2.6", compression="snappy")
        state["i"] += 1
        state["rows"] += table.num_rows

    def close() -> None:
        print(f"  {name}: {state['rows']} rows -> {path} "
              f"({state['i']} files)")

    return append, close


def _ts_us(days: np.ndarray) -> pa.Array:
    return pa.array(days * _US_DAY, type=pa.timestamp("us"))


ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def gen(sf: float, out_dir: str, tables: set[str] | None = None) -> None:
    """Generate the warehouse at `sf` into `out_dir`.

    `tables=None` (the default) writes every table with the shared
    sequential rng — byte-identical to all previously generated
    warehouses at the same sf. A subset SKIPS the excluded tables'
    rng draws entirely, so subset output differs value-wise (not
    schema- or distribution-wise) from a full run at the same sf;
    it is still fully deterministic for a given (sf, subset). Used
    for the sf100 spot-sweep, where generating the 600M-row
    lineitem for queries that never read it would dominate the
    cost. orders/lineitem share one day vector, so asking for
    lineitem implies generating orders' draws too (orders is then
    also written — it is free by comparison).
    """
    if tables is not None:
        unknown = tables - set(ALL_TABLES)
        if unknown:
            raise ValueError(f"unknown tables: {sorted(unknown)}")
        if "lineitem" in tables:
            tables = tables | {"orders"}

    def want(name: str) -> bool:
        return tables is None or name in tables

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = max(int(15_000 * sf), 10)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    # -- region / nation (fixed small dims) --
    if want("region"):
        _write(out_dir, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        _write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    # -- customer --
    if want("customer"):
        ck = np.arange(n_cust, dtype=np.int64)
        _write(out_dir, "customer", pa.table({
            "c_custkey": ck,
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        }))

    # -- supplier --
    if want("supplier"):
        _write(out_dir, "supplier", pa.table({
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
        }))

    # -- part --
    if want("part"):
        adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
        noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
        _write(out_dir, "part", pa.table({
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": np.array(
                [f"Brand#{i}" for i in range(1, 26)]
            )[rng.integers(0, 25, n_part)],
            "p_type": np.array(PART_TYPES)[rng.integers(0, len(PART_TYPES), n_part)],
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n_part), 2),
        }))

    # -- orders: dates 1995-01-01 .. 2001-08-01 (the driver's span) --
    # -- lineitem: 1-7 lines per order, shipdate = orderdate + 1..95d --
    # Both are generated from the same per-order day vector. Above
    # ~20M orders (sf≳13) the single-shot numpy transients would be
    # tens of GB, so the generation CHUNKS over contiguous key ranges
    # into multi-file parquet directories (same schema, same value
    # domains; Spark reads them identically). At sf ≤ 10 the
    # single-chunk path draws the rng in the exact original order, so
    # the shipped sf1/sf10 warehouses stay byte-identical.
    def _orders_chunk(okeys: np.ndarray) -> tuple[pa.Table, np.ndarray]:
        n = len(okeys)
        odays = _ORDERS_EPOCH_DAYS + rng.integers(0, 2404, n)
        tbl = pa.table({
            "o_orderkey": okeys,
            "o_custkey": rng.integers(0, n_cust, n),
            "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n)],
            "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n), 2),
            "o_orderdate": _ts_us(odays),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n)],
        })
        return tbl, odays

    def _lineitem_chunk(okeys: np.ndarray, odays: np.ndarray) -> pa.Table:
        lines_per = rng.integers(1, 8, len(okeys))
        lok = np.repeat(okeys, lines_per)
        n_li = len(lok)
        lnum = (
            np.arange(n_li, dtype=np.int64)
            - np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
            + 1
        )
        qty = rng.integers(1, 51, n_li).astype(np.float64)
        price = np.round(qty * rng.uniform(900.0, 2000.0, n_li), 2)
        sdays = np.repeat(odays, lines_per) + rng.integers(1, 96, n_li)
        return pa.table({
            "l_orderkey": lok,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": pa.array(lnum, pa.int32()),
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": _ts_us(sdays),
        })

    _ORDER_CHUNK = 15_000_000
    if want("orders") or want("lineitem"):
        if n_orders <= _ORDER_CHUNK:
            tbl, odays = _orders_chunk(np.arange(n_orders, dtype=np.int64))
            _write(out_dir, "orders", tbl)
            if want("lineitem"):
                _write(out_dir, "lineitem", _lineitem_chunk(
                    np.arange(n_orders, dtype=np.int64), odays
                ))
        else:
            o_app, o_close = _chunk_writer(out_dir, "orders")
            if want("lineitem"):
                l_app, l_close = _chunk_writer(out_dir, "lineitem")
            for lo in range(0, n_orders, _ORDER_CHUNK):
                okeys = np.arange(
                    lo, min(lo + _ORDER_CHUNK, n_orders), dtype=np.int64
                )
                tbl, odays = _orders_chunk(okeys)
                o_app(tbl)
                if want("lineitem"):
                    l_app(_lineitem_chunk(okeys, odays))
            o_close()
            if want("lineitem"):
                l_close()

    # -- events: 30-day stream --
    if want("events"):
        ts_us = np.sort(
            _EVENTS_EPOCH_NS // 1000
            + rng.integers(0, 30 * 86_400 * 1_000_000, n_events)
        )
        ks = rng.integers(0, 100, n_events)
        _write(out_dir, "events", pa.table({
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": rng.integers(1, n_users + 1, n_events),
            "event_type": np.array(EVENT_TYPES)[
                rng.choice(5, n_events, p=[0.4, 0.3, 0.1, 0.1, 0.1])
            ],
            "value": np.round(rng.exponential(50.0, n_events) + 0.01, 2),
            "props": np.char.add(
                np.char.add("{\"k\": ", ks.astype(str)), "}"
            ),
        }))

    # -- documents: word salad + injected exact/near duplicates so the
    #    dedup family has real work (mirrors the driver's ~0.2% exact
    #    and discoverable near-dup structure) --
    if want("documents"):
        base_words = rng.integers(20, 101, n_docs)
        vocab = np.array(VOCAB)
        texts: list[str] = []
        for i in range(n_docs):
            w = vocab[rng.integers(0, len(vocab), base_words[i])]
            texts.append(" ".join(w))
        # 1% near-duplicates: copy an earlier doc, perturb one word
        n_near = n_docs // 100
        near_src = rng.integers(0, n_docs, n_near)
        near_dst = rng.integers(0, n_docs, n_near)
        for s, d in zip(near_src, near_dst):
            if s == d:
                continue
            ws = texts[s].split()
            ws[int(rng.integers(0, len(ws)))] = str(vocab[rng.integers(0, len(vocab))])
            texts[d] = " ".join(ws)
        # 0.2% exact duplicates
        n_exact = max(n_docs // 500, 1)
        ex_src = rng.integers(0, n_docs, n_exact)
        ex_dst = rng.integers(0, n_docs, n_exact)
        for s, d in zip(ex_src, ex_dst):
            if s != d:
                texts[d] = texts[s]
        _write(out_dir, "documents", pa.table({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[
                rng.choice(5, n_docs, p=[0.5, 0.15, 0.15, 0.1, 0.1])
            ],
            "source": np.array([f"src{i}" for i in range(20)])[
                rng.integers(0, 20, n_docs)
            ],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }))

    # -- embeddings: 10 clusters, unit-norm 64-dim + ~3% near-dups --
    if want("embeddings"):
        dim, n_labels = 64, 10
        centers = rng.normal(0, 1, (n_labels, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, n_labels, n_vecs)
        vecs = centers[labels] + rng.normal(0, 0.35, (n_vecs, dim))
        n_nd = n_vecs * 3 // 100
        nd_src = rng.integers(0, n_vecs, n_nd)
        nd_dst = rng.integers(0, n_vecs, n_nd)
        mask = nd_src != nd_dst
        vecs[nd_dst[mask]] = (
            vecs[nd_src[mask]] + rng.normal(0, 0.01, (mask.sum(), dim))
        )
        labels_arr = labels.copy()
        labels_arr[nd_dst[mask]] = labels[nd_src[mask]]
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _write(out_dir, "embeddings", pa.table({
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(labels_arr, pa.int32()),
        }))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = {t for t in argv[i + 1].split(",") if t}
        del argv[i : i + 2]
    sf = float(argv[0]) if argv else 1.0
    out = argv[1] if len(argv) > 1 else f"/tmp/sfgen/sf{argv[0]}"
    gen(sf, out, tables)
