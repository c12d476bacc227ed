"""Fat-documents stress corpus (round-3 verdict stretch goal).

The driver's synthetic documents are ~50 tokens; real pre-training
documents are thousands. This generator writes a `documents.parquet`
with LONG documents (Zipf-distributed vocabulary, thousands of
tokens each) plus planted exact duplicates and near-duplicates
(small token edits), and copies the remaining warehouse tables from
an existing SF dir so `tools/diffcheck.py` can run the full registry
against the fat corpus unchanged.

Deterministic (fixed seed) so repeated runs and both engines see the
same corpus.

Usage: python tools/gen_fatdocs.py [n_docs] [out_dir] [src_sf_dir]
       defaults: 2000 /tmp/fatdocs /root/testdata/sf0.01
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1234
VOCAB = 10_000
MIN_TOK, MAX_TOK = 1_000, 5_000
EXACT_DUP_FRAC = 0.05
NEAR_DUP_FRAC = 0.05
LANGS = ["en", "es", "fr", "de", "zh"]


def _vocab() -> list[str]:
    rng = np.random.default_rng(SEED)
    words = []
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for i in range(VOCAB):
        ln = int(rng.integers(2, 12))
        words.append(
            "".join(alphabet[j] for j in rng.integers(0, 26, ln)) + str(i % 10)
        )
    return words


def gen(n_docs: int, out_dir: str, src_sf_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    words = np.array(_vocab())
    # Zipf-ish token distribution over the vocab (bounded exponent)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    n_base = int(n_docs * (1 - EXACT_DUP_FRAC - NEAR_DUP_FRAC))
    texts: list[str] = []
    for _ in range(n_base):
        n_tok = int(rng.integers(MIN_TOK, MAX_TOK))
        toks = words[rng.choice(VOCAB, size=n_tok, p=probs)]
        texts.append(" ".join(toks))
    # exact duplicates of early bases
    n_exact = int(n_docs * EXACT_DUP_FRAC)
    for i in range(n_exact):
        texts.append(texts[i % n_base])
    # near duplicates: ~1% of tokens substituted
    n_near = n_docs - len(texts)
    for i in range(n_near):
        toks = texts[(i * 7) % n_base].split(" ")
        n_edit = max(1, len(toks) // 100)
        idx = rng.integers(0, len(toks), n_edit)
        repl = words[rng.choice(VOCAB, size=n_edit, p=probs)]
        for j, w in zip(idx, repl):
            toks[int(j)] = str(w)
        texts.append(" ".join(toks))

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    langs = [LANGS[i % len(LANGS)] for i in range(len(texts))]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(len(texts))], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, out / "documents.parquet")
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        shutil.copy(Path(src_sf_dir) / f"{name}.parquet", out / f"{name}.parquet")
    total_tok = sum(len(t.split(" ")) for t in texts)
    print(
        f"wrote {len(texts)} docs ({total_tok/1e6:.1f}M tokens, "
        f"{table.nbytes/1e6:.0f} MB text) to {out}"
    )


def gen_entropic(
    n_docs: int,
    out_dir: str,
    src_sf_dir: str,
    min_tok: int = 30,
    max_tok: int = 80,
) -> None:
    """REALISTIC-ENTROPY twin of the sf100 warehouse's documents
    table (round-9 verdict stretch #8): same doc count and token
    lengths as gen_sf's corpus, but drawn from the 10k-word Zipf
    vocabulary instead of gen_sf's ~30-word one. The tiny vocabulary
    concentrates per-shingle doc frequency to ~1e4 (every MinHash /
    Jaccard postings structure degenerates — the adversarial regime);
    real corpora grow their shingle space with the corpus. Sweeping
    dedup at sf100 against BOTH regimes measures the production case
    and the pathological one side-by-side.

    Fully vectorized (one rng.choice over all ~n_docs·55 tokens,
    chunked) so 5M docs generate in minutes, not hours; other
    warehouse tables are SYMLINKED from src_sf_dir (read-only inputs
    — no copies of the 4 GB sf100 tables)."""
    import os

    rng = np.random.default_rng(SEED)
    words = np.array(_vocab())
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_base = int(n_docs * (1 - EXACT_DUP_FRAC - NEAR_DUP_FRAC))

    writer = None
    chunk = 250_000
    base_cache: list[str] = []  # first `need_base` bases for dup rows
    need_base = n_docs - n_base
    doc_id = 0
    try:
        for lo in range(0, n_base, chunk):
            m = min(chunk, n_base - lo)
            lens = rng.integers(min_tok, max_tok + 1, size=m)
            flat = words[
                rng.choice(VOCAB, size=int(lens.sum()), p=probs)
            ]
            offs = np.concatenate(([0], np.cumsum(lens)))
            texts = [
                " ".join(flat[offs[i]: offs[i + 1]]) for i in range(m)
            ]
            if len(base_cache) < need_base:
                base_cache.extend(
                    texts[: need_base - len(base_cache)]
                )
            tbl = pa.table(
                {
                    "doc_id": pa.array(
                        range(doc_id, doc_id + m), pa.int64()
                    ),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(
                        [LANGS[(doc_id + i) % len(LANGS)] for i in range(m)]
                    ),
                    "source": pa.array(
                        [f"src{(doc_id + i) % 20}" for i in range(m)]
                    ),
                    "n_chars": pa.array(
                        [len(t) for t in texts], pa.int64()
                    ),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(
                    out / "documents.parquet", tbl.schema
                )
            writer.write_table(tbl)
            doc_id += m
            print(f"  base {doc_id}/{n_base}", flush=True)
        # planted exact + near duplicates of the cached bases
        n_exact = int(n_docs * EXACT_DUP_FRAC)
        dup_texts: list[str] = []
        for i in range(n_docs - n_base):
            t = base_cache[i % len(base_cache)]
            if i >= n_exact:  # near-dup: ~1% token substitutions
                toks = t.split(" ")
                n_edit = max(1, len(toks) // 100)
                idx = rng.integers(0, len(toks), n_edit)
                repl = words[rng.choice(VOCAB, size=n_edit, p=probs)]
                for j, w in zip(idx, repl):
                    toks[int(j)] = str(w)
                t = " ".join(toks)
            dup_texts.append(t)
        if dup_texts:
            tbl = pa.table(
                {
                    "doc_id": pa.array(
                        range(doc_id, doc_id + len(dup_texts)), pa.int64()
                    ),
                    "text": pa.array(dup_texts, pa.string()),
                    "lang": pa.array(
                        [
                            LANGS[(doc_id + i) % len(LANGS)]
                            for i in range(len(dup_texts))
                        ]
                    ),
                    "source": pa.array(
                        [
                            f"src{(doc_id + i) % 20}"
                            for i in range(len(dup_texts))
                        ]
                    ),
                    "n_chars": pa.array(
                        [len(t) for t in dup_texts], pa.int64()
                    ),
                }
            )
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        src = Path(src_sf_dir) / f"{name}.parquet"
        dst = out / f"{name}.parquet"
        if src.exists() and not dst.exists():
            os.symlink(src, dst)
    print(f"wrote {n_docs} entropic docs to {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "entropic":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfgen/sf100_entropic"
        src = sys.argv[4] if len(sys.argv) > 4 else "/tmp/sfgen/sf100"
        gen_entropic(n, out, src)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fatdocs"
        src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
        gen(n, out, src)
