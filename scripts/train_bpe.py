#!/usr/bin/env python
"""Train the vendored BPE merge table (ext/bpe_merges.txt).

Word frequencies come from the synthetic documents corpus at sf0.01
plus a fixed common-English seed list (so merges reflect general
English subword structure, not only the corpus's narrow vocabulary).
Deterministic: same inputs -> same merge table.

Usage: python scripts/train_bpe.py [n_merges]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Common-English seed (public frequency knowledge, hand-curated):
# (word, weight) pairs blended in at modest weight so suffix/prefix
# merges (th, er, ing, est, ed, ly...) are learned even where the
# synthetic corpus lacks them.
_SEED = [
    ("the", 50), ("of", 30), ("and", 28), ("to", 26), ("in", 22),
    ("is", 20), ("that", 18), ("it", 17), ("was", 16), ("for", 15),
    ("on", 14), ("are", 14), ("with", 13), ("as", 13), ("his", 12),
    ("they", 12), ("at", 11), ("this", 11), ("have", 10), ("from", 10),
    ("or", 10), ("had", 9), ("by", 9), ("word", 9), ("but", 9),
    ("not", 9), ("what", 8), ("all", 8), ("were", 8), ("when", 8),
    ("there", 8), ("can", 7), ("said", 7), ("which", 7), ("their", 7),
    ("time", 7), ("will", 6), ("about", 6), ("would", 6), ("these", 6),
    ("other", 6), ("into", 5), ("more", 5), ("write", 5), ("number", 5),
    ("could", 5), ("people", 5), ("than", 5), ("first", 5), ("water", 4),
    ("been", 4), ("called", 4), ("find", 4), ("long", 4), ("down", 4),
    ("day", 4), ("did", 4), ("get", 4), ("come", 4), ("made", 4),
    ("part", 4), ("over", 4), ("new", 4), ("sound", 3), ("take", 3),
    ("only", 3), ("little", 3), ("work", 3), ("know", 3), ("place", 3),
    ("year", 3), ("live", 3), ("back", 3), ("give", 3), ("most", 3),
    ("very", 3), ("after", 3), ("thing", 3), ("our", 3), ("just", 3),
    ("name", 3), ("good", 3), ("sentence", 3), ("man", 3), ("think", 3),
    ("say", 3), ("great", 3), ("where", 3), ("help", 3), ("through", 3),
    ("much", 3), ("before", 3), ("line", 2), ("right", 2), ("too", 2),
    ("means", 2), ("old", 2), ("any", 2), ("same", 2), ("tell", 2),
    ("boy", 2), ("following", 2), ("came", 2), ("want", 2), ("show", 2),
    ("also", 2), ("around", 2), ("form", 2), ("three", 2), ("small", 2),
    ("set", 2), ("put", 2), ("end", 2), ("does", 2), ("another", 2),
    ("well", 2), ("large", 2), ("must", 2), ("big", 2), ("even", 2),
    ("such", 2), ("because", 2), ("turn", 2), ("here", 2), ("why", 2),
    ("asked", 2), ("went", 2), ("men", 2), ("read", 2), ("need", 2),
    ("land", 2), ("different", 2), ("home", 2), ("used", 2), ("hand", 2),
]


def main() -> None:
    # 64 merges: enough to learn real subword structure (er/in/th/
    # ing/est...) while leaving typical words split into ~1.7 pieces
    # — a tokenizer that memorizes every corpus word (fertility 1.0)
    # reports nothing
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import duckdb

    from python_minerva_etl_spark.ext.bpe import train_bpe

    freqs: Counter[str] = Counter()
    rows = duckdb.sql(
        "SELECT text FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')").fetchall()
    for (text,) in rows:
        freqs.update(re.findall(r"[a-z]+", text.lower()))
    for w, c in _SEED:
        freqs[w] += c

    merges = train_bpe(dict(freqs), n_merges)
    out = os.path.join(REPO, "python_minerva_etl_spark", "ext",
                       "bpe_merges.txt")
    with open(out, "w") as fh:
        fh.write("\n".join(f"{a} {b}" for a, b in merges) + "\n")
    print(f"trained {len(merges)} merges from {len(freqs)} word types "
          f"-> {out}")
    print("first 10:", merges[:10])


if __name__ == "__main__":
    main()
