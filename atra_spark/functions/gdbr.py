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

The model is trained with deterministic sub-gradient descent on hinge
loss (the liblinear analog); ``train_gdbr_model`` builds one from
labeled texts. Off by default in the crawl config (parity mode), like
the reference's optional gdbr registry.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field
from html.parser import HTMLParser

_EXCLUDED_TAGS = {"script", "style", "noscript", "template", "head", "meta", "link"}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _tokenize(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


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

    def predict(self, text: str) -> float:
        x = _tfidf_vector(_tokenize(text), self.idf)
        return sum(self.weights.get(w, 0.0) * v for w, v in x.items()) + self.bias


def train_gdbr_model(
    positive: list[str],
    negative: list[str],
    epochs: int = 60,
    lr: float = 0.5,
    reg: float = 1e-3,
) -> GdbrModel:
    """Linear SVM (hinge loss, deterministic SGD over a fixed sample
    order) on TF-IDF features — the svm-crate training analog."""
    docs = [(t, 1.0) for t in positive] + [(t, -1.0) for t in negative]
    n = float(len(docs))
    wf = Counter(w for t, _y in docs for w in set(_tokenize(t)))
    idf = {w: math.log10(n / (c + 1.0)) + 1.0 for w, c in wf.items()}
    weights: dict[str, float] = {}
    bias = 0.0
    for _ in range(epochs):
        for text, y in docs:
            x = _tfidf_vector(_tokenize(text), idf)
            margin = y * (sum(weights.get(w, 0.0) * v for w, v in x.items()) + bias)
            for w in list(weights):
                weights[w] *= 1.0 - lr * reg
            if margin < 1.0:
                for w, v in x.items():
                    weights[w] = weights.get(w, 0.0) + lr * y * v
                bias += lr * y * 0.1
    return GdbrModel(idf=idf, weights=weights, bias=bias)


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


def _find(root: _Node, model: GdbrModel) -> tuple[_Node | None, float]:
    scored: list[tuple[float, _Node]] = []
    for node in root.iter_elements():
        if node.tag == "#root" or _in_excluded(node):
            continue
        text = node.subtree_text()
        if not text:
            continue
        s = model.predict(text)
        if s >= model.threshold:
            scored.append((s, node))
    if not scored:
        return None, 0.0
    # topmost candidates: drop nodes whose parent is also a candidate
    cand_ids = {id(n) for _s, n in scored}
    topmost = [
        (s, n) for s, n in scored if n.parent is None or id(n.parent) not in cand_ids
    ]
    best_s, best_n = max(topmost, key=lambda p: p[0])
    if best_s < model.filter_threshold:
        return None, best_s
    return best_n, best_s


def find_banner_score(html_text: str, model: GdbrModel) -> float:
    """Score of the most probable consent-banner element (0.0 if the
    page has no candidate) — the has_gbr test hook (identifier.rs:646)."""
    root = _parse(html_text)
    if root is None:
        return 0.0
    node, score = _find(root, model)
    return score if node is not None else min(score, 0.0)


def remove_consent_banner(html_text: str, model: GdbrModel) -> tuple[str, bool, float]:
    """(clean_document_text, removed?, score): detaches the identified
    banner node and re-emits the remaining document text in document
    order (remove_gdbr:640-645)."""
    root = _parse(html_text)
    if root is None:
        return "", False, 0.0
    node, score = _find(root, model)
    if node is None:
        return root.subtree_text(), False, score
    node.parent.children.remove(node)
    return root.subtree_text(), True, score
