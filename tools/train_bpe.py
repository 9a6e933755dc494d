#!/usr/bin/env python3
"""Offline BPE trainer for the graft tokenizer (q70).

Classic byte-pair-encoding training over word frequencies (Sennrich et al.
2016, arXiv:1508.07909): repeatedly merge the most frequent adjacent symbol
pair; ties break deterministically on the lexicographically smallest pair.
The resulting merges table is embedded as the offline-trained constant in
src/main/scala/graft/functions/Bpe.scala (provenance: this script over the
sf0.01 documents corpus). graft.functions.Bpe.train implements the same
algorithm in Scala for retraining on other corpora; BpeSpec cross-checks
the two on a fixture.

Usage: python3 tools/train_bpe.py [sf_dir] [n_merges]
"""
import sys
from collections import Counter

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24

con = duckdb.connect()
freqs = dict(con.execute(f"""
  SELECT w, count(*) FROM (
    SELECT lower(unnest(regexp_extract_all(text,
      '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS w
    FROM '{sf_dir}/documents.parquet')
  WHERE regexp_full_match(w, '[a-z]+') GROUP BY 1""").fetchall())

vocab = {tuple(w): f for w, f in freqs.items()}
merges = []
for _ in range(n_merges):
    pairs = Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += f
    if not pairs:
        break
    # deterministic: max count, then lexicographically smallest pair
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append(best)
    a, b = best
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

print("// trained by tools/train_bpe.py on %s (%d merges)" % (sf_dir, len(merges)))
for a, b in merges:
    print('    ("%s", "%s"),' % (a, b))
