"""BPE trainer scale probe: 100k word types, deep merge counts.

The naive full-recount trainer costs ~400 ms/merge at 100k types
(O(types × merges) — a 32k-merge GPT-2-class vocab would take hours);
`bpe_train_incremental` maintains pair-count deltas over only the words
each merge touches, with a lazy selection heap. This probe:

  1. asserts the incremental trainer's merge sequence EQUALS the
     reference trainer's on the same 100k-type table (20-merge prefix —
     the reference is the slow part),
  2. times the incremental trainer to 5,000 merges and asserts it stays
     under 2 min (measured ~20 s, amortized ~4 ms/merge),
  3. sanity-checks the learned vocabulary compresses: total tokens under
     the trained merges < total chars+eow tokens at 0 merges.

Run from the repo root:  python tools/bpe_scale_check.py [--types 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--types", type=int, default=100_000)
    ap.add_argument("--merges", type=int, default=5_000)
    args = ap.parse_args()

    import numpy as np

    from raycrawl.ops.bpe import (bpe_train_from_word_counts,
                                  bpe_train_incremental, _apply_merges)

    rng = np.random.RandomState(0)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    words: dict[str, int] = {}
    while len(words) < args.types:
        ln = rng.randint(5, 13)
        w = bytes(alpha[rng.randint(0, 26, ln)]).decode()
        if w not in words:
            words[w] = int(1 + args.types / (1 + len(words)))  # zipf-ish

    t0 = time.time()
    ref = bpe_train_from_word_counts(dict(words), 20)
    t_ref = time.time() - t0
    t0 = time.time()
    fast20 = bpe_train_incremental(dict(words), 20)
    assert fast20 == ref, "incremental trainer diverged from reference"
    t_fast20 = time.time() - t0

    t0 = time.time()
    merges = bpe_train_incremental(dict(words), args.merges)
    t_deep = time.time() - t0
    assert t_deep < 120, f"{t_deep:.0f}s for {args.merges} merges — regressed"

    ranks = {p: i for i, p in enumerate(merges)}
    sample = list(words)[:2000]
    base = sum((len(w) + 1) * words[w] for w in sample)
    toks = sum(len(_apply_merges(w, ranks)) * words[w] for w in sample)
    assert toks < base

    print(json.dumps({
        "types": len(words),
        "ref_20_merges_sec": round(t_ref, 2),
        "incremental_20_merges_sec": round(t_fast20, 2),
        "incremental_deep_merges": len(merges),
        "incremental_deep_sec": round(t_deep, 1),
        "ms_per_merge_amortized": round(t_deep / max(1, len(merges)) * 1000, 2),
        "sample_compression": round(toks / base, 4)}))


if __name__ == "__main__":
    main()
