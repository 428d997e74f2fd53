"""Porter stemming + the reference's notebook tokeniser (SURVEY §2.8 F16).

Reference: /root/reference/notebooks/outliers.ipynb cell 3 — lowercase,
``[^a-z- ]`` → space, ``\\s-\\s`` → space, spaCy POS filter (NOUN/ADJ,
lemma length > 1), PorterStemmer on each surviving token.

Parity tiers:

- ``porter_stem``: pure-Python implementation of the ORIGINAL Porter (1980)
  algorithm — no NLTK dependency. NLTK's PorterStemmer defaults to its
  NLTK_EXTENSIONS mode which deviates from the paper on a small word set
  (pooled irregulars, a few rule tweaks); the divergence is documented here
  and the goldens pin the paper's own examples.
- ``tokens_stemmed_udf``: notebook cleaning regexes + Porter, no POS filter
  (spaCy is absent in this container) — the always-available middle tier.
- ``tokens_pos_stemmed_udf``: the exact notebook chain including the spaCy
  NOUN/ADJ filter; import-gated, raises cleanly where spaCy is missing
  (same pattern as cleaning.clean_string_html_exact).

The regex tokeniser (operators/ml.tokens_col) remains the default scale
path: it is pure Catalyst, whereas stemming is inherently per-token Python.
"""

from __future__ import annotations

import pandas as pd

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in Porter's notation: the number of VC blocks in [C](VC)^m[V]."""
    m, prev_cons = 0, True
    started_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started_vowel = True
        elif started_vowel:
            m += 1
            started_vowel = False
        prev_cons = cons  # noqa: F841  (kept for clarity of the scan)
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace_longest(w: str, rules: list[tuple[str, str]], min_m: int) -> str:
    """Apply the longest-matching suffix rule whose stem satisfies m > min_m;
    per Porter, once the longest suffix in the step matches, no shorter
    suffix is tried even if the condition fails."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return w
    stem = w[: len(w) - len(best[0])]
    if _measure(stem) > min_m:
        return stem + best[1]
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Original Porter (1980) stemmer; words of length <= 2 are untouched."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, hit = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, hit = w[:-3], True
        if hit:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    w = _replace_longest(w, _STEP2, 0)  # Step 2 (m > 0)
    w = _replace_longest(w, _STEP3, 0)  # Step 3 (m > 0)

    # Step 4 (m > 1); 'ion' only after s/t
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if w.endswith("ion") and len(w) >= 4 and w[-4] in "st":
        if best is None or len("ion") > len(best):
            best = "ion"
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1:
            w = stem

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if _measure(w[:-1]) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def tokenize_notebook(text: str | None, stem: bool = True) -> list[str]:
    """outliers.ipynb cell 3 minus the spaCy POS filter: lowercase,
    ``[^a-z- ]`` → space, ``\\s-\\s`` → space, split, len > 1, Porter."""
    import re

    if text is None:
        return []
    t = re.sub(r"[^a-z- ]", " ", text.lower())
    t = re.sub(r"\s-\s", " ", t)
    toks = [t_ for t_ in t.split() if len(t_) > 1]
    return [porter_stem(t_) for t_ in toks] if stem else toks


def tokens_stemmed_udf():
    """pandas UDF: notebook cleaning + Porter stemming (no POS filter)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(tokenize_notebook)

    return _tok


def tokens_pos_stemmed_udf(model: str = "en_core_web_sm"):
    """pandas UDF: the EXACT notebook chain incl. spaCy NOUN/ADJ filtering
    and the lemma length > 1 gate. Requires spaCy + the model; raises
    ImportError at plan-build time where they are absent (gated, like
    cleaning.clean_string_html_exact)."""
    import spacy  # noqa: F401  (gate: container may not ship spaCy)
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        import re

        import spacy

        nlp = spacy.load(model, disable=["ner", "parser"])

        def one(text):
            if text is None:
                return []
            t = re.sub(r"[^a-z- ]", " ", text.lower())
            t = re.sub(r"\s-\s", " ", t)
            return [
                porter_stem(tok.text)
                for tok in nlp(t)
                if tok.pos_ in ("NOUN", "ADJ") and len(tok.lemma_) > 1
            ]

        return s.map(one)

    return _tok
