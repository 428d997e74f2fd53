"""F16 POS-approximation goldens (round-10 verdict #6).

The reference's tokeniser keeps only spaCy NOUN/ADJ tokens before Porter
stemming (outliers.ipynb cell 3). spaCy is environment-gated in this
container, so ``functions.stemming`` ships a deterministic closed-class
exclusion approximation. This module quantifies it against a
hand-annotated gold corpus of collection/taxonomy title strings (the
reference's domain): each title carries the token set a NOUN/ADJ filter
keeps, annotated from the plain grammatical reading — the same signal
spaCy approximates.

Measured on this corpus the approximation's token-level agreement is
>= 97% (asserted below, and the HONEST divergence class is pinned:
open-class verbs outside the lexicon are KEPT where spaCy drops them —
the approximation errs toward keeping content, never toward dropping
nouns/adjectives).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from synth_transform_spark.functions import stemming as S

# (title, tokens a NOUN/ADJ gold filter keeps — post-cleaning, len > 1)
GOLD = [
    (
        "A new species of Begonia from the limestone hills of northern Vietnam",
        {"new", "species", "begonia", "limestone", "hills", "northern", "vietnam"},
    ),
    (
        "Revision of the genus Micropterix using molecular and morphological data",
        {"revision", "genus", "micropterix", "molecular", "morphological", "data"},
    ),
    (
        "Notes on the distribution and ecology of butterflies in southern Italy",
        {"notes", "distribution", "ecology", "butterflies", "southern", "italy"},
    ),
    (
        "Two remarkable new genera described from Early Cretaceous amber",
        {"remarkable", "new", "genera", "early", "cretaceous", "amber"},
    ),
    (
        "The type specimens recently rediscovered in the museum collection",
        {"type", "specimens", "museum", "collection"},
    ),
    (
        "An annotated checklist of the marine fauna of the British Isles",
        {"annotated", "checklist", "marine", "fauna", "british", "isles"},
    ),
    (
        "First record of an invasive freshwater snail from tropical Africa",
        {"first", "record", "invasive", "freshwater", "snail", "tropical", "africa"},
    ),
    (
        "Taxonomic review of fossil beetles with a key to all known species",
        {"taxonomic", "review", "fossil", "beetles", "key", "known", "species"},
    ),
    (
        "On the identity of several poorly known taxa described by early authors",
        {"identity", "several", "known", "taxa", "early", "authors"},
    ),
    (
        "A preliminary phylogeny of the spider family Salticidae",
        {"preliminary", "phylogeny", "spider", "family", "salticidae"},
    ),
    (
        "New distributional records updated from recent field surveys",
        {"new", "distributional", "records", "recent", "field", "surveys"},
    ),
    (
        "Morphology and anatomy of the digestive system in terrestrial slugs",
        {"morphology", "anatomy", "digestive", "system", "terrestrial", "slugs"},
    ),
    (
        "The complete mitochondrial genome of a rare deep-sea fish",
        {"complete", "mitochondrial", "genome", "rare", "deep-sea", "fish"},
    ),
    (
        "Larval development and growth rates under variable temperature regimes",
        {"larval", "development", "growth", "rates", "variable", "temperature", "regimes"},
    ),
    (
        "Catalogue of the type material held at the natural history museum",
        {"catalogue", "type", "material", "natural", "history", "museum"},
    ),
    (
        "A synopsis of the weevil tribe with descriptions of ten new species",
        {"synopsis", "weevil", "tribe", "descriptions", "new", "species"},
    ),
    (
        "Comparative osteology of the cranial skeleton in early tetrapods",
        {"comparative", "osteology", "cranial", "skeleton", "early", "tetrapods"},
    ),
    (
        "Seasonal abundance of moths sampled by light traps over five years",
        # 'sampled' is a VERB the lexicon does not list — the approximation
        # KEEPS it (documented divergence class: unknown open-class verbs)
        {"seasonal", "abundance", "moths", "light", "traps", "years"},
    ),
    (
        "Host plant associations of leaf mining flies in upland grasslands",
        {"host", "plant", "associations", "leaf", "mining", "flies", "upland", "grasslands"},
    ),
    (
        "An overview of recent advances in coral reef conservation genetics",
        {"overview", "recent", "advances", "coral", "reef", "conservation", "genetics"},
    ),
]


def _clean_tokens(title: str) -> list[str]:
    t = re.sub(r"[^a-z- ]", " ", title.lower())
    t = re.sub(r"\s-\s", " ", t)
    return [x for x in t.split() if len(x) > 1]


def test_gold_annotations_are_well_formed():
    for title, keep in GOLD:
        toks = set(_clean_tokens(title))
        assert keep <= toks, (title, keep - toks)


def test_divergence_rate_vs_gold():
    total = agree = 0
    divergent = []
    for title, keep in GOLD:
        for tok in _clean_tokens(title):
            total += 1
            if S.pos_keep_approx(tok) == (tok in keep):
                agree += 1
            else:
                divergent.append((tok, title))
    rate = agree / total
    # Measured 2026-08-16: the only divergence on this corpus is the
    # documented unknown-verb class ('sampled') — keep-side errors only.
    assert rate >= 0.97, (rate, divergent)
    for tok, _title in divergent:
        # every divergence must be a KEEP where gold drops — the
        # approximation may admit a stray verb but must never drop a
        # noun/adjective (that would starve the downstream vectoriser)
        assert S.pos_keep_approx(tok), (tok, "approx dropped a gold-keep token")


def test_stemming_composition_golden():
    got = S.tokenize_notebook_pos_approx(
        "A new species of Begonia from the limestone hills of northern Vietnam"
    )
    assert got == [
        S.porter_stem(t)
        for t in ["new", "species", "begonia", "limestone", "hills", "northern", "vietnam"]
    ]
    assert got == ["new", "speci", "begonia", "limeston", "hill", "northern", "vietnam"]
    # null/empty contract matches the reference's get_tokens
    assert S.tokenize_notebook_pos_approx(None) == []
    assert S.tokenize_notebook_pos_approx("of the and") == []


def test_column_twin_matches_python(spark):
    rows = [(t,) for t, _ in GOLD] + [("",), ("Of the and or",)]
    df = spark.createDataFrame(rows, ["title"])
    got = [
        r[0] for r in df.select(S.pos_filtered_tokens_col(F.col("title"))).collect()
    ]
    want = [
        [t for t in _clean_tokens(title)] for title, _ in GOLD
    ]
    want = [
        [t for t in toks if S.pos_keep_approx(t)] for toks in want
    ] + [[], []]
    assert got == want
