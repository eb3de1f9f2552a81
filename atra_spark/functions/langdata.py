"""Deterministic mini language model: per-language marker word lists.

Stands in for the reference's whatlang trigram model
(atra/src/toolkit/language_detection.rs:97-140) in this sandbox: the
fixture generator writes pages whose body text draws from exactly one
language's vocabulary, and the detector scores marker-word hits per
language. Marker sets are pairwise disjoint, so detection is exact on
fixture data while remaining a real (if simple) frequency classifier
on arbitrary text. Codes are ISO-639-3 like the reference.
"""

from __future__ import annotations

# marker words (function words, pairwise disjoint across languages)
MARKERS: dict[str, tuple[str, ...]] = {
    "eng": ("the", "and", "of", "with", "from", "that", "this", "have", "was", "are"),
    "deu": ("der", "und", "nicht", "das", "ist", "ein", "mit", "für", "auf", "sich"),
    "fra": ("le", "les", "est", "une", "dans", "pour", "qui", "pas", "sur", "vous"),
    "spa": ("el", "los", "es", "una", "para", "por", "con", "como", "más", "pero"),
    "ita": ("il", "di", "che", "non", "per", "sono", "anche", "della", "come", "questo"),
}

# filler vocabulary per language (content words; overlap allowed — only
# MARKERS drive classification)
FILLER: dict[str, tuple[str, ...]] = {
    "eng": ("crawl", "page", "link", "data", "host", "queue", "table", "value"),
    "deu": ("seite", "daten", "wert", "tabelle", "rechner", "netz", "kette", "zahl"),
    "fra": ("page", "valeur", "table", "chaine", "reseau", "nombre", "texte", "mot"),
    "spa": ("pagina", "valor", "tabla", "cadena", "red", "numero", "texto", "palabra"),
    "ita": ("pagina", "valore", "tavola", "catena", "rete", "numero", "testo", "parola"),
}

LANGS = tuple(MARKERS)
UND = "und"

_MARKER_INDEX: dict[str, str] = {}
for _lang, _words in MARKERS.items():
    for _w in _words:
        _MARKER_INDEX[_w] = _lang


def detect_lang(text: str | None) -> tuple[str | None, float | None]:
    """(iso639-3 code, confidence) by marker-word frequency; und if no hits."""
    if not text:
        return None, None
    counts: dict[str, int] = {}
    total = 0
    for token in text.lower().split():
        token = token.strip(".,;:!?\"'()[]")
        lang = _MARKER_INDEX.get(token)
        if lang is not None:
            counts[lang] = counts.get(lang, 0) + 1
            total += 1
    if not counts:
        return UND, 0.0
    best = max(counts, key=lambda k: (counts[k], k))
    return best, counts[best] / total
