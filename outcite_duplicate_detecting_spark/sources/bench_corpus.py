"""Distributed deterministic bench corpus (pages schema, planted dups).

Row content is a pure function of the row id (splitmix64-style integer
mixing), so the corpus is byte-identical at any partition count or
parallelism level — the property the N-vs-4N scaling measurement needs.
Generated with mapInPandas over spark.range: generation itself is
embarrassingly parallel and never touches the driver.

Cluster scheme (id group = id // 10, role = id % 10):
  role 0 → cluster base text (50–400 tokens)
  role 1 → near-dup of base (~2% token substitutions)   [MinHash regime]
  role 2 → exact copy of base                           [exact collapse]
  role 3 → base wrapped in prefix/suffix tokens         [substring regime]
  roles 4–9 → unique singleton text
⇒ 40% of rows sit in 4-member clusters, 60% are singletons.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_VOCAB_N = 50000


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant schedule)."""
    old = np.seterr(over="ignore")
    try:
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**old)


def _token_ids(key: int, length: int) -> np.ndarray:
    idx = np.arange(length, dtype=np.uint64) + np.uint64(key) * np.uint64(1_000_003)
    return _mix(idx) % np.uint64(_VOCAB_N)


_SYLL = np.array(
    ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne", "pa", "qi", "ro", "su", "ta", "ve"]
)


def _vocab() -> np.ndarray:
    # 50k pronounceable pseudo-words, derived (not sampled) from the index
    i = np.arange(_VOCAB_N)
    return np.char.add(
        np.char.add(_SYLL[i % 16], _SYLL[(i // 16) % 16]),
        np.char.add(_SYLL[(i // 256) % 16], (i // 4096).astype(str)),
    )


def _text_for_ids(ids: np.ndarray, seed: int, vocab: np.ndarray) -> list[str]:
    out: list[str] = []
    for did in ids:
        group, role = divmod(int(did), 10)
        gkey = group * 2 + seed
        if role <= 3:
            length = 50 + int(_mix(np.array([gkey], dtype=np.uint64))[0] % 350)
            toks = _token_ids(gkey, length)
            if role == 1:  # near-dup: ~2% substitutions
                noise = _mix(np.arange(length, dtype=np.uint64) + np.uint64(gkey * 7 + 13))
                mask = (noise % np.uint64(50)) == 0
                toks = toks.copy()
                toks[mask] = noise[mask] % np.uint64(_VOCAB_N)
            words = vocab[toks.astype(np.int64)]
            if role == 3:  # substring wrap
                pre = vocab[_token_ids(gkey * 31 + 1, 10).astype(np.int64)]
                post = vocab[_token_ids(gkey * 31 + 2, 10).astype(np.int64)]
                words = np.concatenate([pre, words, post])
        else:  # singleton
            skey = int(did) * 11 + seed + 5
            length = 50 + int(_mix(np.array([skey], dtype=np.uint64))[0] % 350)
            words = vocab[_token_ids(skey, length).astype(np.int64)]
        out.append(" ".join(words))
    return out


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_bench_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, parts: int = 64
) -> DataFrame:
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _vocab()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = _text_for_ids(ids, seed, vocab)
            yield pd.DataFrame(
                {
                    "url": [f"https://host{i % 97}.example/p/{i}" for i in ids],
                    "warc_ts": pd.Timestamp("2020-01-01")
                    + pd.to_timedelta(ids % 525600, unit="m"),
                    "html": [t.encode()[:64] for t in texts],  # opaque; truncated
                    "text": texts,
                    "lang": ["en"] * len(ids),
                }
            )

    return base.mapInPandas(gen, schema=PAGES_DDL)


def expected_cluster_pairs(n_docs: int) -> int:
    """Gold duplicate-pair count for recall accounting: each full group of 10
    contributes C(4,2)=6 intra-cluster pairs (roles 0-3)."""
    return (n_docs // 10) * 6
