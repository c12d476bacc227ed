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


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fatdocs"
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    gen(n, out, src)
