#!/usr/bin/env python3
"""Independent BPE merge-table reference (Sennrich et al. 2016 semantics,
matching graft.llm.Bpe's documented contract):

  - corpus -> word-frequency dict over Dedup.tokens tokenization
    (lower, split on ' ', drop empties);
  - per round: weighted adjacent-pair count over the dict, argmax with
    ties broken (freq DESC, left ASC, right ASC); stop when max freq < 2;
  - dict rewrite: greedy LEFT-TO-RIGHT NON-OVERLAPPING merge — after a
    merge the new symbol cannot chain into the next match
    ("l l l" + (l,l) -> ["ll", "l"]).

Used to derive (and to audit) the pinned `bpe_merges` oracle vectors:
  python3 tools/bpe_reference.py /root/testdata/sf0.01 50 20
prints one `(rank, left, right, freq)` VALUES row per merge plus the
word-dict size guard. Written from the paper's algorithm; shares no code
with the Scala implementation.
"""
import sys
import duckdb


def merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(word_freq, num_merges):
    dict_ = [(list(w), n) for w, n in word_freq.items()]
    merges = []
    for r in range(1, num_merges + 1):
        pairs = {}
        for syms, n in dict_:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < 2:
            break
        merges.append((r, a, b, f))
        dict_ = [(merge_word(s, a, b), n) for s, n in dict_]
    return merges


def segment(token, merges):
    """Fold the merge table in rank order — the shipped-tokenizer apply
    step, same contract as graft.llm.Bpe.segment/segmentUdf."""
    syms = [""] if token == "" else list(token)
    for _, a, b, _ in sorted(merges):
        syms = merge_word(syms, a, b)
    return syms


def main():
    sf_dir, max_doc, k = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id < {max_doc}").fetchall()
    wf = {}
    for (text,) in rows:
        for t in text.lower().split(' '):
            if t:
                wf[t] = wf.get(t, 0) + 1
    merges = train(wf, k)
    print(f"-- corpus: doc_id < {max_doc} at {sf_dir}; dict_words = {len(wf)}")
    for r, a, b, f in merges:
        print(f"(CAST({r} AS BIGINT), '{a}', '{b}', CAST({f} AS BIGINT), "
              f"CAST({len(wf)} AS BIGINT)),")


if __name__ == "__main__":
    main()
