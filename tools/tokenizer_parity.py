#!/usr/bin/env python
"""Quantify tokenizer parity on the REAL reference corpora.

The reference tokenizes queries with nltk ``word_tokenize``
(= punkt sentence split + TreebankWordTokenizer per sentence;
/root/reference/utils/data_gen.py:23).  The punkt model data cannot be
downloaded in this container, so hual_tpu falls back to Treebank over the
whole query (hual_tpu/data/tokenize.py).  Round 1 asserted the fallback is
"identical for single-sentence queries" without measuring anything
(VERDICT.md missing #3); this tool measures it, over every sentence in the
mounted reference data.

Method: punkt can only change tokenization where it may insert a sentence
boundary, i.e. inside queries containing sentence-internal ``[.!?]`` followed
by whitespace.  For each query we compare

  A = Treebank(whole query)                      (our fallback)
  B = concat(Treebank(s) for s in liberal_split) (upper bound of any punkt
      splitting: split at EVERY [.!?]+ + whitespace)

If a query has no internal split candidate, punkt provably cannot act and
A == word_tokenize output exactly.  If A == B, then ANY punkt decision
(split or not, at any candidate) yields the same tokens, so A is again
exact.  Only queries with A != B are genuinely punkt-dependent; those are
counted and dumped for inspection.

Writes results/tokenizer_parity.json; tests/test_tokenizer_parity.py pins
the measured numbers.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hual_tpu.data.tokenize import tokenize  # noqa: E402

CORPora = None
SPLIT_RE = re.compile(r"(?<=[.!?])[\s]+")
CANDIDATE_RE = re.compile(r"[.!?][\s]+\S")

OUT = os.path.join(REPO, "results", "tokenizer_parity.json")


def _treebank():
    from nltk.tokenize import TreebankWordTokenizer

    return TreebankWordTokenizer()


def corpus_files(root: str = "/root/reference/data") -> list[str]:
    files = []
    for pat in ("charades_gt/*.json", "charades_re0/*.json",
                "anet_gt/*.json", "anet_re0/*.json"):
        files += sorted(glob.glob(os.path.join(root, pat)))
    return [f for f in files if os.path.getsize(f) > 0]


def analyze(files: list[str]) -> dict:
    tb = _treebank()
    total = 0
    with_candidate = 0
    punkt_dependent = 0
    examples = []
    per_file = {}
    for path in files:
        with open(path, encoding="utf8") as f:
            data = json.load(f)
        n, cand, dep = 0, 0, 0
        for record in data:
            sentence = str(record[3]).strip().lower()
            n += 1
            if not CANDIDATE_RE.search(sentence):
                continue  # punkt provably cannot split: A is exact
            cand += 1
            whole = tb.tokenize(sentence)
            split = [t for part in SPLIT_RE.split(sentence) if part
                     for t in tb.tokenize(part)]
            if whole != split:
                dep += 1
                if len(examples) < 20:
                    examples.append({"file": os.path.basename(
                        os.path.dirname(path)) + "/" + os.path.basename(path),
                        "sentence": sentence,
                        "treebank_whole": whole, "treebank_split": split})
        total += n
        with_candidate += cand
        punkt_dependent += dep
        per_file[os.path.relpath(path, "/root/reference/data")] = {
            "sentences": n, "split_candidates": cand, "punkt_dependent": dep}
    return {
        "total_sentences": total,
        "with_split_candidate": with_candidate,
        "punkt_dependent": punkt_dependent,
        "punkt_dependent_pct": round(100.0 * punkt_dependent / max(total, 1), 4),
        "per_file": per_file,
        "examples": examples,
        "method": "A=Treebank(whole) vs B=Treebank(liberal sentence split); "
                  "A==B => any punkt decision yields identical tokens",
    }


def main() -> int:
    files = corpus_files()
    if not files:
        print("no reference corpora found")
        return 1
    res = analyze(files)
    # sanity: our production tokenize() agrees with Treebank(whole) lowered
    tb = _treebank()
    probe = "person opens the door. then sits down."
    assert tokenize(probe) == tb.tokenize(probe.strip().lower())
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("per_file", "examples")}, indent=2))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
