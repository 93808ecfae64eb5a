"""Train the committed BPE merge table (cloudtile_spark/bpe.py MERGES).

Classic Sennrich BPE trainer over the documents corpus word frequencies
(no end-of-word marker — the GPT-2-style in-word variant the SQL encoder
implements). Asserts the single-pass-equivalence preconditions:

  * every merge product is a UNIQUE symbol string (no two merge paths
    produce the same symbol — the only loophole that could make the
    in-order single pass diverge from the iterative encoder);
  * merges never involve the space symbol (words delimit merges).

Usage:  python tools/train_bpe.py [sf_dir] [n_merges]
Rewrites the MERGES literal in cloudtile_spark/bpe.py; commit the diff.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges: list[tuple[str, str]] = []
    products = set()
    while len(merges) < n_merges:
        stats: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        # skip candidate pairs whose product collides with an existing
        # symbol string (preserves single-pass equivalence)
        best = None
        for pair, _ in sorted(stats.items(),
                              key=lambda kv: (-kv[1], kv[0])):
            if pair[0] + pair[1] not in products:
                best = pair
                break
        if best is None or stats[best] < 2:
            break
        a, b = best
        products.add(a + b)
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    assert len(set(a + b for a, b in merges)) == len(merges)
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    freq: collections.Counter = collections.Counter()
    for (t,) in rows:
        for w in re.sub(r"[^a-z ]", "", t.lower()).split(" "):
            if w:
                freq[w] += 1
    merges = train(freq, n_merges)
    print(f"{len(freq)} distinct words; {len(merges)} merges; "
          f"first 8: {merges[:8]}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cloudtile_spark", "bpe.py")
    src = open(path).read()
    lit = "MERGES: list[tuple[str, str]] = [\n" + "".join(
        f"    ({a!r}, {b!r}),\n" for a, b in merges) + "]"
    new = re.sub(
        r"MERGES: list\[tuple\[str, str\]\] = \[[^\]]*\]",
        lit.replace("\\", "\\\\"), src, count=1)
    assert new != src or "MERGES: list[tuple[str, str]] = []" not in src
    open(path, "w").write(new)
    print(f"wrote {len(merges)} merges to {path}")


if __name__ == "__main__":
    main()
