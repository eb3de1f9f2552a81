"""GDBR consent-banner identification + removal (atra/src/gdbr/
identifier.rs:486-645 + the svm crate's linear model over TF-IDF
features, re-expressed with stdlib + the tfidf kernel).

Pipeline (mirrors the reference):
1. score every text-bearing DOM element with a linear SVM over the
   element's TF-IDF vector (identifier.rs filter_fkt:523-546);
   script/style/programming subtrees are excluded
   (is_possibly_gdbr_text_containing_element:486-518)
2. climb from scoring leaves toward the root while parents still score
   above ``threshold`` (identify_gdbr_elements_in_html:552-625)
3. detach the most probable node — the max-scoring topmost candidate
   above ``filter_threshold`` (get_most_probable + remove_gdbr:627-645)

The model family matches the reference's: liblinear ``L2R_L2LOSS_SVR``
(epsilon-insensitive L2-loss support-vector REGRESSION to labels
{1.0, 0.0} with cost C=10, p(eps)=0.1 — identifier.rs test config
:686-691), trained here by deterministic full-batch projected
gradient descent on the primal over L2-normalized TF-IDF rows, with
optional German Snowball stemming + stopword removal exactly like the
reference's German pipeline (Algorithm::German + iso stopwords).
Regression-to-{0,1} is why the thresholds are 0.1 (climb) and 0.5
(final filter). Parity with the reference's own train/predict data is
pinned by tests/test_gdbr.py::TestReferenceFixtureParity over the
ported data/gdbr/de/svm.csv fixture. Off by default in the crawl
config (parity mode), like the reference's optional gdbr registry.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass, field
from html.parser import HTMLParser

import numpy as np

_EXCLUDED_TAGS = {"script", "style", "noscript", "template", "head", "meta", "link"}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _tokenize(text: str, lang: str | None = None) -> list[str]:
    """Lowercased word tokens; with ``lang`` (e.g. 'de') the
    reference's language pipeline applies: stopword removal + Snowball
    stemming (svm crate tokenizer with Algorithm::German)."""
    if lang is None:
        return [t for t in text.lower().split() if t]
    from .stemmer import SNOWBALL_STOPWORDS, get_stemmer

    code = {"de": "german", "deu": "german", "en": "english", "eng": "english"}.get(
        lang.lower(), lang.lower()
    )
    sw = SNOWBALL_STOPWORDS.get(code, frozenset())
    stem = get_stemmer(code)
    return [stem(w) for w in _WORD_RE.findall(text.lower()) if w not in sw]


def _tfidf_vector(tokens: list[str], idf: dict[str, float]) -> dict[str, float]:
    """TermFrequency x given idf — the vectorizer.rs contract."""
    if not tokens:
        return {}
    counts = Counter(tokens)
    total = float(len(tokens))
    return {w: (c / total) * idf.get(w, 0.0) for w, c in counts.items()}


@dataclass
class GdbrModel:
    idf: dict[str, float]
    weights: dict[str, float]
    bias: float = 0.0
    threshold: float = 0.1          # per-node climb threshold (:385-387)
    filter_threshold: float = 0.5   # removal threshold (:389-391)
    lang: str | None = None         # tokenizer language (stemmer+stopwords)

    def predict(self, text: str) -> float:
        """SVR score ~ regression to {0=content, 1=banner} over the
        L2-normalized TF-IDF vector (liblinear rows are normalized the
        same way in the svm crate's vectorizer)."""
        x = _tfidf_vector(_tokenize(text, self.lang), self.idf)
        norm = math.sqrt(sum(v * v for v in x.values()))
        if norm == 0.0:
            return self.bias
        return sum(self.weights.get(w, 0.0) * v for w, v in x.items()) / norm + self.bias


def train_gdbr_model(
    positive: list[str],
    negative: list[str],
    c: float = 10.0,
    eps: float = 0.1,
    iters: int = 4000,
    lang: str | None = None,
) -> GdbrModel:
    """Deterministic L2R_L2LOSS_SVR (the reference's liblinear solver
    family, identifier.rs:686-691: cost=10, p=0.1): full-batch
    gradient descent on the primal

        min_w  1/2 ||w||^2 + C * sum_i max(0, |w.x_i - y_i| - eps)^2

    with labels y in {1.0, 0.0} and L2-normalized TF-IDF rows. The
    step size is 1/(1 + 2C*sigma_max^2) (the objective's Lipschitz
    bound), so training is convergent and bit-reproducible — no RNG,
    no sample-order sensitivity."""
    texts = list(positive) + list(negative)
    y = np.array([1.0] * len(positive) + [0.0] * len(negative))
    docs = [_tokenize(t, lang) for t in texts]
    n = float(len(docs))
    wf = Counter(w for d in docs for w in set(d))
    idf = {w: math.log10(n / (cnt + 1.0)) + 1.0 for w, cnt in wf.items()}
    vocab = {w: i for i, w in enumerate(sorted(wf))}
    X = np.zeros((len(docs), len(vocab)))
    for i, d in enumerate(docs):
        if not d:
            continue
        for w in d:
            X[i, vocab[w]] += 1.0
    # tf = count/len, then x idf, then l2-normalize per row
    lens = np.array([max(1, len(d)) for d in docs], dtype=float)
    X /= lens[:, None]
    idf_arr = np.array([idf[w] for w in sorted(wf)])
    X *= idf_arr
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X /= norms[:, None]

    Xb = np.hstack([X, np.ones((len(docs), 1))])
    smax = float(np.linalg.norm(Xb, 2))
    lr = 1.0 / (1.0 + 2.0 * c * smax * smax)
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        r = Xb @ w - y
        a = np.abs(r) - eps
        mask = a > 0
        g = w.copy()
        g[-1] = 0.0  # bias unregularized (liblinear -B convention)
        if mask.any():
            g = g + 2.0 * c * (np.sign(r[mask]) * a[mask]) @ Xb[mask]
        w -= lr * g
    inv = sorted(wf)
    weights = {t: float(w[i]) for i, t in enumerate(inv) if w[i] != 0.0}
    return GdbrModel(idf=idf, weights=weights, bias=float(w[-1]), lang=lang)


class _Node:
    __slots__ = ("tag", "children", "texts", "parent")

    def __init__(self, tag: str, parent: "_Node | None") -> None:
        self.tag = tag
        self.parent = parent
        self.children: list[_Node] = []
        self.texts: list[str] = []

    def subtree_text(self) -> str:
        parts = list(self.texts)
        for c in self.children:
            parts.append(c.subtree_text())
        return " ".join(p for p in parts if p)

    def iter_elements(self):
        yield self
        for c in self.children:
            yield from c.iter_elements()


class _TreeBuilder(HTMLParser):
    """Minimal DOM tree: elements + per-element text runs (enough for
    subtree scoring and detachment; not a serializer)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        node = _Node(tag, self.stack[-1])
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data.strip():
            self.stack[-1].texts.append(data.strip())


def _in_excluded(node: _Node) -> bool:
    while node is not None:
        if node.tag in _EXCLUDED_TAGS:
            return True
        node = node.parent
    return False


def _parse(html_text: str) -> _Node | None:
    tb = _TreeBuilder()
    try:
        tb.feed(html_text)
        tb.close()
    except Exception:
        return None
    return tb.root


# w3schools-taxonomy tag categories the reference excludes from
# climbing (html.rs:216,218); P/A/Div/Title/Dialog/Details are
# whitelisted regardless (identifier.rs:489-498)
_CAT_STYLES_SEMANTICS = {
    "style", "div", "span", "header", "hgroup", "footer", "main",
    "section", "search", "article", "aside", "details", "dialog",
    "summary", "data",
}
_CAT_PROGRAMMING = {"script", "noscript", "applet", "embed", "object", "param"}
_CLIMB_WHITELIST = {"p", "a", "div", "title", "dialog", "details"}


def _climb_allowed(tag: str) -> bool:
    """is_possibly_gdbr_text_containing_element for elements
    (identifier.rs:486-518): whitelisted tags pass, otherwise any tag
    outside the Programming / StylesAndSemantics categories."""
    return tag in _CLIMB_WHITELIST or (
        tag not in _CAT_PROGRAMMING and tag not in _CAT_STYLES_SEMANTICS
    )


def _find(root: _Node, model: GdbrModel):
    """The reference's level-climb (identify_gdbr_elements_in_html,
    identifier.rs:547-625) + get_most_probable(:627-634), FilterMode::
    OnScore:

    - level 0: leaf TEXT nodes whose parent element is outside the
      Programming/StylesAndSemantics categories and whose own score
      clears ``threshold``
    - each next level: parents of the previous level that pass the
      climb tag filter AND score >= threshold on their subtree text;
      chains merge via a visited map
    - climbing continues only while a level holds >1 distinct nodes
      (one more level after the chains converge, then stop) — the
      winner is picked from the LAST level by own score, gated on
      ``filter_threshold``

    Returns (element|None, text_chunk_index|None, score): a level-0
    winner is a single text chunk inside its element.
    """
    thr = model.threshold
    level0: list[tuple[_Node, int, float, float]] = []  # (parent el, chunk idx, score, max)
    for node in root.iter_elements():
        if node.tag == "#root" or _in_excluded(node):
            continue
        if node.tag in _CAT_PROGRAMMING or node.tag in _CAT_STYLES_SEMANTICS:
            continue  # initial filter is category-only (:559-575), no whitelist
        for i, t in enumerate(node.texts):
            s = model.predict(t)
            if s >= thr:
                level0.append((node, i, s, s))
    if not level0:
        return None, None, 0.0

    # entry = [kind, element, chunk_idx|None, own_score, max_score]
    visited: dict[int, list] = {}
    levels: list[list] = [[["#text", n, i, s, mx] for n, i, s, mx in level0]]
    cur: list = levels[0]
    while True:
        nxt: dict[int, list] = {}
        for kind, node, _idx, _score, child_max in cur:
            # a text chunk's parent is its element; an element's parent
            # is its DOM parent
            parent = node if kind == "#text" else node.parent
            if parent is None or parent.tag == "#root":
                continue
            pid = id(parent)
            if pid in visited:
                ent = visited[pid]
                ent[4] = max(ent[4], child_max)
                nxt[pid] = ent
                continue
            if not _climb_allowed(parent.tag) or _in_excluded(parent):
                continue
            text = parent.subtree_text()
            if not text:
                continue
            s = model.predict(text)
            if s >= thr:
                ent = ["#el", parent, None, s, max(s, child_max)]
                visited[pid] = ent
                nxt[pid] = ent
        if not nxt:
            break
        levels.append(list(nxt.values()))
        cur = levels[-1]
        if len(nxt) == 1:
            break

    last = levels[-1]
    best = max(last, key=lambda e: e[3])
    kind, node, idx, s, _mx = best
    if s < model.filter_threshold:
        return None, None, s
    return node, (idx if kind == "#text" else None), s


def find_banner_score(html_text: str, model: GdbrModel) -> float:
    """Score of the most probable consent-banner element (0.0 if the
    page has no candidate) — the has_gbr test hook (identifier.rs:646)."""
    root = _parse(html_text)
    if root is None:
        return 0.0
    node, _idx, score = _find(root, model)
    return score if node is not None else min(score, 0.0)


def remove_consent_banner(html_text: str, model: GdbrModel) -> tuple[str, bool, float]:
    """(clean_document_text, removed?, score): detaches the identified
    banner node (or single text leaf) and re-emits the remaining
    document text in document order (remove_gdbr:640-645)."""
    root = _parse(html_text)
    if root is None:
        return "", False, 0.0
    node, idx, score = _find(root, model)
    if node is None:
        return root.subtree_text(), False, score
    if idx is not None:  # level-0 winner: detach one text leaf
        node.texts.pop(idx)
    else:
        node.parent.children.remove(node)
    return root.subtree_text(), True, score
