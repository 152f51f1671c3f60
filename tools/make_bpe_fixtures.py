#!/usr/bin/env python3
"""Independent BPE anchor for graft's merged-token counting.

Implements the STANDARD byte-pair-encoding merge loop (Sennrich et al.
2016 / the GPT-2 reference encoder's `bpe()` shape, public knowledge)
in Python, with zero shared code with the Scala kernel
(`functions/Bpe.scala`), over the pinned merge table committed at
`src/main/resources/graft/bpe/merges.txt` (GPT-2 merges.txt format:
one ranked pair per line, earlier = higher priority, space mapped to
the GPT-2 'Ġ' marker).

Emits `src/test/resources/bpe/token_counts.json`: for every word of
the pinned fixture vocabulary, the merged-token SEQUENCE and COUNT for
both the bare form (first pre-token of a text) and the space-prefixed
form (every later pre-token, per the GPT-2 pre-tokenizer's ' ?' prefix).
BpeSpec asserts the Scala encoder reproduces every sequence; the
q_token_count_bpe_merged / q_token_budget_bpe oracles embed the counts
as VALUES. Regenerate only when merges.txt or the vocabulary changes —
the outputs are committed.
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
MERGES = os.path.join(HERE, "..", "src/main/resources/graft/bpe/merges.txt")
OUT = os.path.join(HERE, "..", "src/test/resources/bpe/token_counts.json")

VOCAB = ["the", "and", "thing", "nation", "another", "rating",
         "there", "hand", "ordering", "that", "inner", "trend",
         "data", "king", "motion", "hat"]

SPACE = "Ġ"  # 'Ġ' — the GPT-2 byte-encoder's space marker


def load_ranks():
    ranks = {}
    with open(MERGES, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = len(ranks)
    return ranks


def bpe(word, ranks):
    """The standard merge loop: repeatedly merge the lowest-ranked
    adjacent pair, all its occurrences left-to-right, until no pair
    has a rank."""
    symbols = [SPACE if c == " " else c for c in word]
    while len(symbols) > 1:
        pairs = {(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        best = min(ranked, key=lambda p: ranks[p])
        merged = []
        i = 0
        while i < len(symbols):
            if (i + 1 < len(symbols)
                    and (symbols[i], symbols[i + 1]) == best):
                merged.append(symbols[i] + symbols[i + 1])
                i += 2
            else:
                merged.append(symbols[i])
                i += 1
        symbols = merged
    return symbols


def main():
    ranks = load_ranks()
    out = {}
    for w in VOCAB:
        bare = bpe(w, ranks)
        spaced = bpe(" " + w, ranks)
        out[w] = {
            "bare_tokens": bare, "bare_count": len(bare),
            "spaced_tokens": spaced, "spaced_count": len(spaced),
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {OUT}")
    for w, v in sorted(out.items()):
        print(f"  {w:10s} bare={v['bare_count']} {v['bare_tokens']}  "
              f"spaced={v['spaced_count']} {v['spaced_tokens']}")


if __name__ == "__main__":
    main()
