#!/usr/bin/env python3
"""Realistic-vocabulary documents fixture for the dedup-family scale
probe (round-12 verdict #1).

The driver's synthetic documents table draws uniformly from a 31-word
vocabulary, so every doc shares most tokens with every other doc: dedup
pair OUTPUT grows ~quadratically with corpus size (93x at 10x data in
r11) and the bench cannot separate output-driven growth from candidate
explosion — the exact failure mode the PPJoin prefix filter and MinHash
banding exist to prevent. This fixture is web-corpus-shaped instead:

  vocab     : 50,000 distinct alpha words (deterministic letter codes)
  word law  : Zipf-Mandelbrot, p(rank r) ~ 1/(r + 2.7)^1.07
  doc length: lognormal(mu=4.2, sigma=0.8) tokens, clipped [10, 400]
  langs     : en .4 / de .15 / es .15 / fr .15 / zh .15 (like TESTDATA.md)
  planted   : 2% exact duplicates + 3% near-duplicates (same length and
              lang as the original, ~6% of token positions resampled —
              distinct-token Jaccard stays well above the 0.5 threshold)

Near-dup rate is constant per doc, so true pair output grows LINEARLY
with corpus size — any super-linear growth in a dedup operator's
candidates or wall-time on this fixture is a real scale defect, not the
fixture's fault.

Schema matches /root/testdata/sf*/documents.parquet exactly
(doc_id int64, text, lang, source, n_chars int64).

Usage: python3 tools/gen_zipf_docs.py <outdir> <n_docs> [seed=7]
"""
import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_000
ZIPF_S, ZIPF_Q = 1.07, 2.7
LEN_MU, LEN_SIGMA, LEN_MIN, LEN_MAX = 4.2, 0.8, 10, 400
EXACT_DUP_FRAC, NEAR_DUP_FRAC, PERTURB_FRAC = 0.02, 0.03, 0.06


def make_vocab():
    """Word for rank r: letters of r in base-26, 3..10 chars (pad short
    codes) — distinct, lowercase-alpha, whitespace-tokenizer-safe."""
    letters = np.array(list(string.ascii_lowercase))
    words = []
    for r in range(VOCAB):
        code, n = [], r
        while True:
            code.append(letters[n % 26])
            n //= 26
            if n == 0:
                break
        w = "".join(code)
        words.append(("xq" + w) if len(w) < 3 else w)
    return np.array(words)


def main():
    out, n_docs = sys.argv[1], int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = make_vocab()

    p = 1.0 / (np.arange(VOCAB) + 1 + ZIPF_Q) ** ZIPF_S
    p /= p.sum()

    lens = np.clip(np.round(rng.lognormal(LEN_MU, LEN_SIGMA, n_docs)),
                   LEN_MIN, LEN_MAX).astype(np.int64)
    langs = np.array(["en", "de", "es", "fr", "zh"])[
        rng.choice(5, n_docs, p=[0.4, 0.15, 0.15, 0.15, 0.15])]

    # one vectorized Zipf draw for the whole corpus, sliced per doc
    offsets = np.concatenate(([0], np.cumsum(lens)))
    all_toks = rng.choice(VOCAB, offsets[-1], p=p)
    docs = [all_toks[offsets[i]:offsets[i + 1]] for i in range(n_docs)]

    # plant duplicates: docs in the back 90% copy a uniformly random
    # earlier doc (exact, or perturbed at ~PERTURB_FRAC positions with
    # fresh Zipf draws — same length, same lang, so (lang, n_tokens)
    # blocking keeps the pair comparable)
    floor = n_docs // 10
    n_exact = int(n_docs * EXACT_DUP_FRAC)
    n_near = int(n_docs * NEAR_DUP_FRAC)
    dup_ids = rng.choice(np.arange(floor, n_docs), n_exact + n_near,
                         replace=False)
    for j, i in enumerate(dup_ids):
        src = int(rng.integers(0, floor))
        base = docs[src].copy()
        if j >= n_exact:  # near-dup: resample ~6% of positions
            k = max(1, int(len(base) * PERTURB_FRAC))
            pos = rng.choice(len(base), k, replace=False)
            base[pos] = rng.choice(VOCAB, k, p=p)
        docs[i] = base
        lens[i] = len(base)
        langs[i] = langs[src]

    texts = [" ".join(words[d]) for d in docs]
    table = pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": np.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    pq.write_table(table, os.path.join(out, "documents.parquet"))
    print(f"documents: {n_docs} rows, {offsets[-1]} tokens, "
          f"{n_exact} exact + {n_near} near dups, seed {seed}")


if __name__ == "__main__":
    main()
