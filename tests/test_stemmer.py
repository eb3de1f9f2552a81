"""Snowball stemmer vectors (published algorithm outputs,
snowballstem.org) + tokenizer integration — the reference's optional
stemming tier (text_processing/src/tokenizer.rs:71-77)."""

from atra_spark.functions.stemmer import (
    SNOWBALL_STOPWORDS,
    get_stemmer,
    stem_english,
    stem_german,
)
from atra_spark.functions.textstats import tokenize

EN_VECTORS = {
    # exceptional forms + invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "news": "news", "sky": "sky", "exceed": "exceed", "proceed": "proceed",
    "inning": "inning",
    # step 1a/1b
    "caresses": "caress", "ponies": "poni", "ties": "tie", "cries": "cri",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "running": "run",
    "hopping": "hop", "hoping": "hope", "knitting": "knit",
    # 1c
    "happy": "happi",
    # step 2 (incl. the gener- R1 prefix exception)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "generously": "generous",
    # step 3
    "triplicate": "triplic", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "formative": "format",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words untouched
    "by": "by", "a": "a",
}

DE_VECTORS = {
    "aufeinander": "aufeinand", "katzen": "katz", "häuser": "haus",
    "freundlich": "freundlich", "freundliche": "freundlich",
    "bekanntmachung": "bekanntmach", "abenteuer": "abenteu",
    "kategorie": "kategori", "kategorien": "kategori",
    "schönheit": "schonheit", "tisch": "tisch", "tische": "tisch",
    "grossen": "gross",
}


class TestEnglish:
    def test_vectors(self):
        fails = {w: (stem_english(w), want) for w, want in EN_VECTORS.items()
                 if stem_english(w) != want}
        assert not fails, fails

    def test_mixed_case_lowers(self):
        assert stem_english("Running") == "run"


class TestGerman:
    def test_vectors(self):
        fails = {w: (stem_german(w), want) for w, want in DE_VECTORS.items()
                 if stem_german(w) != want}
        assert not fails, fails

    def test_eszett(self):
        assert stem_german("straße") == stem_german("strasse")


class TestRegistry:
    def test_iso_codes(self):
        assert get_stemmer("eng")("running") == "run"
        assert get_stemmer("deu")("katzen") == "katz"

    def test_unknown_language_identity_lowercase(self):
        assert get_stemmer("fra")("Mangées") == "mangées"

    def test_none(self):
        assert get_stemmer(None) is None


class TestTokenizerIntegration:
    def test_stemmed_pipeline(self):
        toks = tokenize(
            "The runners were running happily", stopwords="snowball", stemmer="english"
        )
        assert toks == ["runner", "run", "happili"]

    def test_snowball_stopwords_german(self):
        toks = tokenize(
            "Die Katzen und die Hunde", stopwords="snowball", stemmer="german"
        )
        assert toks == ["katz", "hund"]

    def test_default_behavior_unchanged(self):
        # the oracle-checked default path must not shift
        assert tokenize("the quick brown fox") == ["quick", "brown", "fox"]

    def test_stopword_lists_nonempty(self):
        assert len(SNOWBALL_STOPWORDS["english"]) > 100
        assert len(SNOWBALL_STOPWORDS["german"]) > 150
