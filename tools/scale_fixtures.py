"""Scale-fixture generator for the sf1 scaling study (SCALE.md).

The driver's testdata tops out at sf0.1 (5,000 documents / 2,000
embeddings) and is read-only, so scale evidence beyond that needs
locally generated corpora. This generator reproduces the DRIVER
corpus's measured statistical shape (profiled from
/root/testdata/sf0.1 in round 11) at any scale factor:

documents (50,000 x sf rows):
  - 31-word vocabulary (the exact word list observed in the driver
    corpus), uniform word counts in [10, 100] (driver avg 54.1),
  - langs en/zh/es/fr/de at the driver's ~41/15/15/15/14 split,
  - sources src0..src19 uniform,
  - planted near-duplicate pairs at the driver's rate (256 pairs per
    5,000 docs, trigram-Jaccard 0.8..1.0 with a few exact copies) —
    the structure every dedup family's candidate generation feeds on,
    so candidate growth vs corpus size is measured against a
    realistic true-pair density, not an all-unique corpus.

embeddings (20,000 x sf rows):
  - 64-dim unit-normalized vectors, 10 balanced labels with subtle
    cluster centers (driver: center norm ~0.07, within-cluster std
    ~0.125 = 1/sqrt(64)).

Everything is deterministic per (sf, seed). Output dir layout matches
the driver's (one parquet per table) so queries() callables take the
generated dir as their sf_dir unchanged.

Usage: python tools/scale_fixtures.py <out_dir> <sf> [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_SOURCES = 20
DOCS_PER_SF = 50_000
VECS_PER_SF = 20_000
NEARDUP_PAIRS_PER_5K = 256  # driver rate at sf0.1
DIM = 64
N_LABELS = 10


def _heaps_vocab(n_docs: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Vocabulary for the --heaps variant: size grows with the corpus
    (V = 31 * sqrt(docs/5000), Heaps' law with beta=0.5) and word
    probabilities are Zipf(1.1) — the long rare tail every real corpus
    has. Purpose: the DRIVER-shape fixture's FIXED 31-word vocab
    saturates the trigram-shingle universe at 31^3 = 29,791, so beyond
    ~15k docs EVERY shingle's document frequency exceeds any useful
    stop-shingle cap and df-bounded candidate generation (the
    prefix-filter set-similarity join family) is VACUOUSLY empty —
    discovered in round 14 (SCALE.md). This variant keeps rare
    shingles in existence at every scale, the regime those operators
    actually face on real text."""
    v = max(len(VOCAB), round(len(VOCAB) * (n_docs / 5000.0) ** 0.5))
    vocab = np.array(VOCAB + [f"w{i}" for i in range(v - len(VOCAB))])
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    # shuffle so rank order is not doc-id-correlated via the id words
    perm = rng.permutation(v)
    return vocab[perm], p


def gen_documents(n: int, rng: np.random.Generator, heaps: bool = False) -> pa.Table:
    wc = rng.integers(10, 101, size=n)
    if heaps:
        vocab, p = _heaps_vocab(n, rng)
        words = [vocab[rng.choice(len(vocab), size=c, p=p)].tolist() for c in wc]
    else:
        vocab = np.array(VOCAB)
        # base corpus: independent uniform words per doc
        words = [vocab[rng.integers(0, len(vocab), size=c)].tolist() for c in wc]
    # plant near-dup pairs: partner = copy of base with 0-2 word edits
    # (driver-measured trigram-Jaccard spread 0.8..1.0, 8/256 exact)
    n_pairs = round(n * NEARDUP_PAIRS_PER_5K / 5000)
    victims = rng.choice(n, size=2 * n_pairs, replace=False)
    for i in range(n_pairs):
        a, b = victims[2 * i], victims[2 * i + 1]
        cp = list(words[a])
        edits = int(rng.choice([0, 1, 2], p=[0.05, 0.55, 0.40]))
        for _ in range(edits):
            cp[int(rng.integers(0, len(cp)))] = str(vocab[rng.integers(0, len(vocab))])
        words[b] = cp
    texts = [" ".join(w) for w in words]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, N_SOURCES, size=n).astype(str))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources.tolist(), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def gen_events(n: int, users: int, rng: np.random.Generator) -> pa.Table:
    """Driver-shape event log: n events over 30 days (timestamp[us],
    ts-ordered with event_id = position), `users` uniform actors, 5
    uniform event types, exponential(50) values, {"k": 0..99} JSON
    props — the measured sf0.1 profile (100k events / 1,500 users)."""
    span_us = 30 * 86_400 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.integers(0, span_us, size=n))
    ts = base + offs.astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, users, size=n), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n).tolist(), pa.string()),
            "value": pa.array(np.round(rng.exponential(50.0, size=n), 2), pa.float64()),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)], pa.string()),
        }
    )


def gen_embeddings(m: int, rng: np.random.Generator) -> pa.Table:
    centers = rng.standard_normal((N_LABELS, DIM)).astype(np.float32)
    centers *= 0.075 / np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=m)
    x = centers[labels] + rng.standard_normal((m, DIM)).astype(np.float32) / np.sqrt(DIM)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(m), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def generate(out_dir: str, sf: float, seed: int = 42, heaps: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng([seed, int(sf * 1000)])
    n_docs, n_vecs = round(DOCS_PER_SF * sf), round(VECS_PER_SF * sf)
    n_ev, n_users = round(EVENTS_PER_SF * sf), round(USERS_PER_SF * sf)
    pq.write_table(gen_documents(n_docs, rng, heaps), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs, rng), os.path.join(out_dir, "embeddings.parquet"))
    pq.write_table(gen_events(n_ev, n_users, rng), os.path.join(out_dir, "events.parquet"))
    kind = "heaps-vocab" if heaps else "driver-shape"
    print(f"wrote {out_dir} ({kind}): documents={n_docs} embeddings={n_vecs} events={n_ev}")


if __name__ == "__main__":
    heaps = "--heaps" in sys.argv
    argv = [a for a in sys.argv if a != "--heaps"]
    sys.argv = argv
    out, sf = sys.argv[1], float(sys.argv[2])
    generate(out, sf, int(sys.argv[3]) if len(sys.argv) > 3 else 42, heaps=heaps)
