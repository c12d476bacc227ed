"""tools/gen_sf.py --tables subset generation.

The sf100 spot-sweep only needs documents/embeddings/customer/orders
(+ tiny dims); generating the 600M-row lineitem for queries that
never read it would dominate the cost. The subset path must (a) write
exactly the requested tables, (b) stay deterministic for a given
(sf, subset), and (c) leave the full-gen path byte-identical to the
pre-flag generator (the shipped sf1/sf10 warehouses must not drift).
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.gen_sf import ALL_TABLES, gen  # noqa: E402


def _md5s(d: pathlib.Path) -> dict[str, str]:
    return {
        f.name: hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(d.iterdir())
        if f.is_file()
    }


def test_subset_writes_only_requested_tables(tmp_path):
    out = tmp_path / "sub"
    gen(0.001, str(out), {"documents", "embeddings"})
    assert sorted(f.name for f in out.iterdir()) == [
        "documents.parquet",
        "embeddings.parquet",
    ]


def test_subset_is_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    gen(0.001, str(a), {"customer", "documents"})
    gen(0.001, str(b), {"customer", "documents"})
    assert _md5s(a) == _md5s(b)


def test_lineitem_implies_orders(tmp_path):
    out = tmp_path / "li"
    gen(0.001, str(out), {"lineitem"})
    names = sorted(f.name for f in out.iterdir())
    assert names == ["lineitem.parquet", "orders.parquet"]


def test_unknown_table_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown tables"):
        gen(0.001, str(tmp_path / "x"), {"nope"})


def test_full_gen_matches_default(tmp_path):
    """tables=None and tables=ALL draw the same rng sequence."""
    a, b = tmp_path / "full", tmp_path / "all"
    gen(0.001, str(a), None)
    gen(0.001, str(b), set(ALL_TABLES))
    assert _md5s(a) == _md5s(b)
