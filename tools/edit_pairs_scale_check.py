"""Edit-distance near-dup join at shuffle scale (default 200k docs).

`edit_prefix_pairs` explodes each doc into key_len+1 deletion variants
(k=1), groups candidates on the variant string via coarse hash
partitions, and DP-verifies pairs in a second coarse shuffle. This
probe drives 200k synthetic docs — random 24-char keys plus planted
typo families (substitution / deletion / insertion within the key
window, i.e. true distance-1 pairs) — through the full path and checks
EVERY planted pair is recovered (symmetric-delete blocking is
pigeonhole-complete, so recall must be exactly 1.0, not an LSH
s-curve) and that a sample of returned pairs verifies against a serial
Levenshtein.

Run from the repo root:  python tools/edit_pairs_scale_check.py
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


def _ed(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # short texts (≤ 20 chars < key_len) so the key IS the whole text:
    # with a prefix window, deletions/insertions on longer texts shift
    # tail characters into the window and are genuinely distance-2 on
    # the key — short strings make all three edit modes true d=1 twins
    n = args.docs
    rng = np.random.default_rng(42)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    base = ["".join(rng.choice(alpha, 20)) for _ in range(n)]
    texts = []
    planted = set()
    for i, s in enumerate(base):
        if i % 100 == 99:  # typo family: distance-1 twin of doc i-1
            s = base[i - 1]
            p = int(rng.integers(0, 20))
            mode = i % 3
            if mode == 0:
                s = s[:p] + "#" + s[p + 1:]      # substitution
            elif mode == 1:
                s = s[:p] + s[p + 1:]            # deletion
            else:
                s = s[:p] + "#" + s[p:]          # insertion
            planted.add((i - 1, i))
        texts.append(s)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "text": texts}))

    from raycrawl.ops.dedup import edit_prefix_pairs

    t0 = time.time()
    pairs = edit_prefix_pairs(ds, k=1, key_len=24).to_pandas()
    sec = time.time() - t0
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    recall = len(got & planted) / len(planted)
    keys = [t[:24] for t in texts]
    sample = pairs.head(2000)
    bad = sum(1 for a, b, d in zip(sample["doc_a"], sample["doc_b"],
                                   sample["dist"])
              if _ed(keys[int(a)], keys[int(b)]) != int(d) or int(d) > 1)
    print(json.dumps({
        "docs": n, "sec": round(sec, 1),
        "docs_per_sec": round(n / sec, 1),
        "planted": len(planted), "found_pairs": len(got),
        "planted_recall": round(recall, 4),
        "verify_violations_in_sample": bad,
    }))
    assert recall == 1.0, f"planted recall {recall} (blocking is complete)"
    assert bad == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
