"""Query tokenization (reference utils/data_gen.py:23 uses nltk word_tokenize).

``nltk.word_tokenize`` = punkt sentence split + TreebankWordTokenizer.  The
punkt model needs a download (unavailable offline); we use word_tokenize when
punkt is present and fall back to Treebank over the whole query otherwise.

The fallback is MEASURED exact on the reference corpora, not assumed: over
all 87,626 sentences in /root/reference/data, 9 contain a sentence-internal
split candidate and for all 9 the Treebank tokenization is split-invariant,
so zero queries depend on punkt (tools/tokenizer_parity.py;
results/tokenizer_parity.json; tests/test_tokenizer_parity.py).
"""

from __future__ import annotations

from typing import Callable, List

_tokenize: Callable[[str], List[str]] | None = None


def _build_tokenizer() -> Callable[[str], List[str]]:
    try:
        from nltk.tokenize import word_tokenize

        word_tokenize("probe sentence.", language="english")
        return lambda s: word_tokenize(s, language="english")
    except Exception:
        try:
            from nltk.tokenize import TreebankWordTokenizer

            tok = TreebankWordTokenizer()
            return tok.tokenize
        except Exception:
            # last-resort pure-python splitter (keeps tests hermetic)
            import re

            pattern = re.compile(r"\w+|[^\w\s]")
            return lambda s: pattern.findall(s)


def tokenize(sentence: str) -> List[str]:
    """Lower-cased word tokenization of one query (reference utils/data_gen.py:23)."""
    global _tokenize
    if _tokenize is None:
        _tokenize = _build_tokenizer()
    return _tokenize(sentence.strip().lower())
