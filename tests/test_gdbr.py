"""GDBR consent-banner identification/removal (gdbr/identifier.rs
analog): linear-SVM training, node scoring, climb + detach."""

import pytest

from atra_spark.functions.gdbr import (
    GdbrModel,
    find_banner_score,
    remove_consent_banner,
    train_gdbr_model,
)

BANNERS = [
    "wir verwenden cookies um unsere dienste zu verbessern akzeptieren ablehnen",
    "this website uses cookies to improve your experience accept all reject all",
    "we and our partners store cookies on your device consent preferences manage",
    "cookie einstellungen verwalten alle akzeptieren nur notwendige cookies zulassen",
    "by clicking accept you consent to the use of all cookies privacy settings",
    "diese seite nutzt cookies zur analyse akzeptieren einstellungen datenschutz",
]
CONTENT = [
    "the crawler fetches pages from the network and stores the text",
    "der rechner speichert die daten in einer tabelle mit werten",
    "spark partitions the frontier by host hash and joins the seen set",
    "a recipe for bread flour water salt yeast knead and bake",
    "die seite zeigt das wetter von morgen mit temperaturen und wind",
    "results are written as parquet snapshots with a manifest commit",
]


@pytest.fixture(scope="module")
def model():
    return train_gdbr_model(BANNERS, CONTENT)


class TestSvm:
    def test_separates_training_data(self, model):
        for t in BANNERS:
            assert model.predict(t) > 0, t
        for t in CONTENT:
            assert model.predict(t) < 0.5, t

    def test_generalizes_to_unseen_banner(self, model):
        s = model.predict("cookies akzeptieren oder ablehnen einstellungen verwalten")
        assert s > 0

    def test_deterministic_training(self):
        a = train_gdbr_model(BANNERS, CONTENT)
        b = train_gdbr_model(BANNERS, CONTENT)
        assert a.weights == b.weights and a.bias == b.bias


class TestRemoval:
    HTML = (
        "<html><body>"
        "<div id='consent'><p>this website uses cookies to improve your "
        "experience accept all reject all consent preferences</p></div>"
        "<main><p>the crawler fetches pages from the network and stores "
        "the text for analysis</p></main>"
        "</body></html>"
    )

    def test_banner_removed_content_kept(self, model):
        text, removed, score = remove_consent_banner(self.HTML, model)
        assert removed and score >= model.filter_threshold
        assert "cookies" not in text
        assert "crawler fetches pages" in text

    def test_clean_page_untouched(self, model):
        html = "<html><body><main><p>plain article text about bread baking " \
               "with flour water salt and yeast</p></main></body></html>"
        text, removed, _ = remove_consent_banner(html, model)
        assert not removed
        assert "bread baking" in text

    def test_score_hook(self, model):
        assert find_banner_score(self.HTML, model) > 0
        assert (
            find_banner_score(
                "<html><body><p>der rechner speichert die daten</p></body></html>",
                model,
            )
            <= 0
        )

    def test_extraction_batch_integration(self, model):
        import pandas as pd

        from atra_spark.functions.extract import extract_pages_batch

        pdf = pd.DataFrame(
            {"url": ["https://h.example/x"], "html": [self.HTML.encode()]}
        )
        out = next(iter(extract_pages_batch(iter([pdf]), gdbr_model=model)))
        assert "cookies" not in out.iloc[0]["text"]
        assert "crawler fetches pages" in out.iloc[0]["text"]
        # off by default: banner text retained (byte-parity mode)
        out2 = next(iter(extract_pages_batch(iter([pdf]))))
        assert "cookies" in out2.iloc[0]["text"]

    def test_scripts_excluded(self, model):
        html = (
            "<html><body><script>var cookies = 'accept all reject all consent';"
            "</script><p>the network stores the text</p></body></html>"
        )
        text, removed, _ = remove_consent_banner(html, model)
        assert not removed and "network stores" in text
