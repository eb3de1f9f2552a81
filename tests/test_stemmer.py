"""Snowball stemmer vectors (published algorithm outputs,
snowballstem.org) + tokenizer integration — the reference's optional
stemming tier (text_processing/src/tokenizer.rs:71-77)."""
import os


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
        # french gained a real stemmer in round 3; polish remains the
        # declared identity fallback
        assert get_stemmer("pol")("Stronami") == "stronami"

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


class TestRussian:
    """Snowball Russian vectors, hand-traced from the published spec
    (perfective gerund / adjectival / verb / noun classes in RV,
    derivational ость in R2, step-4 tidy-up)."""

    VECTORS = {
        "книга": "книг", "книги": "книг", "книгами": "книг",
        "делав": "дела", "сделавшись": "сдела",
        "красивый": "красив", "красивая": "красив", "красивыми": "красив",
        "читала": "чита", "читают": "чита", "читать": "чита",
        "университет": "университет", "университета": "университет",
        "скорость": "скорост", "скоростью": "скорост",
        "важность": "важност", "важнейший": "важн",
        "жизнь": "жизн", "программирование": "программирован",
        "новостей": "новост", "ёлка": "елк",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_russian

        for w, s in self.VECTORS.items():
            assert stem_russian(w) == s, (w, stem_russian(w), s)


class TestFrench:
    VECTORS = {
        "continuation": "continu", "continuer": "continu",
        "majestueux": "majestu", "nationale": "national",
        "nations": "nation", "logique": "logiqu", "logiques": "logiqu",
        "éléments": "élément", "important": "import",
        "importantes": "import", "librement": "libr",
        "parlaient": "parl", "finissait": "fin",
        "volontairement": "volontair", "sérieuse": "sérieux",
        "sérieusement": "sérieux", "nourrissement": "nourr",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_french

        for w, s in self.VECTORS.items():
            assert stem_french(w) == s, (w, stem_french(w), s)


class TestSpanish:
    VECTORS = {
        "caminando": "camin", "bebiendo": "beb",
        "comiéndoselo": "com", "torturadora": "tortur",
        "nacional": "nacional", "nacionales": "nacional",
        "importante": "import", "facilidad": "facil",
        "felicidades": "felic", "rápidamente": "rapid",
        "generosidad": "gener", "cantando": "cant",
        "llegaron": "lleg", "viviendo": "viv",
        "lógica": "logic", "programación": "program",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_spanish

        for w, s in self.VECTORS.items():
            assert stem_spanish(w) == s, (w, stem_spanish(w), s)


class TestItalian:
    VECTORS = {
        "abbandonare": "abbandon", "abbandonati": "abbandon",
        "nazionale": "nazional", "nazionali": "nazional",
        "logica": "logic", "importante": "import",
        "felicità": "felic", "velocemente": "veloc",
        "mangiando": "mang", "parlavano": "parl",
        "costruzione": "costruzion", "bellissimo": "bellissim",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_italian

        for w, s in self.VECTORS.items():
            assert stem_italian(w) == s, (w, stem_italian(w), s)


class TestNewRegistryEntries:
    def test_iso_codes_resolve(self):
        from atra_spark.functions.stemmer import get_stemmer

        assert get_stemmer("fra")("nations") == "nation"
        assert get_stemmer("spa")("cantando") == "cant"
        assert get_stemmer("ita")("logica") == "logic"
        assert get_stemmer("rus")("книги") == "книг"

    def test_stopword_lists_nonempty_new(self):
        from atra_spark.functions.stemmer import SNOWBALL_STOPWORDS

        for lang in ("french", "spanish", "italian", "russian"):
            assert len(SNOWBALL_STOPWORDS[lang]) > 80, lang


class TestStopwordBreadth:
    """Stopword coverage matches the 18-algorithm stemmer surface
    (reference registers a per-ISO-language list through iso_stopwords,
    text_processing/src/stopword_registry.rs:17)."""

    def test_every_stemmer_language_has_stopwords(self):
        from atra_spark.functions.stemmer import (
            _RUST_STEMMERS_LANGS, SNOWBALL_STOPWORDS,
        )

        for lang, iso3 in _RUST_STEMMERS_LANGS.items():
            assert len(SNOWBALL_STOPWORDS.get(lang, ())) >= 50, lang
            assert SNOWBALL_STOPWORDS.get(iso3) is SNOWBALL_STOPWORDS[lang], iso3

    # one content-bearing sentence per new language: the closed-class
    # words must be filtered, the content words must survive (in
    # whatever stemmed form — the stem assertions live in the per-
    # stemmer golden tests, not here)
    SENTENCES = {
        "hungarian": ("ez egy nagyon szép ház és a kert", {"szép", "ház", "kert"}),
        "romanian": ("aceasta este o carte bună și un câine", {"carte", "bun", "câine"}),
        "turkish": ("bu çok güzel bir kitap ve bahçe", {"güzel", "kitap", "bahçe"}),
        "arabic": ("هذا كتاب جميل في الحديقة و البيت", {"كتاب", "جميل"}),
        "greek": ("αυτό είναι ένα ωραίο βιβλίο και ο κήπος", {"βιβλίο", "κήπος"}),
        "tamil": ("இது ஒரு அழகான புத்தகம் மற்றும் தோட்டம்", {"புத்தகம்", "தோட்டம்"}),
    }

    def test_tokenize_filters_new_language_stopwords(self):
        from atra_spark.functions.stemmer import SNOWBALL_STOPWORDS
        from atra_spark.functions.textstats import tokenize

        for lang, (sent, content) in self.SENTENCES.items():
            stop = SNOWBALL_STOPWORDS[lang]
            # stopword selection keys on the stemmer language; skip the
            # stemming step itself so content words stay assertable
            toks = tokenize(sent, stopwords="snowball", stemmer=lang)
            raw = tokenize(sent, remove_stopwords=False)
            assert set(raw) & stop, lang  # the sentence exercises the list
            assert all(t not in stop for t in toks), (lang, toks)
            # every content word survives in SOME (possibly stemmed) form
            assert len(toks) >= len(content) - 1, (lang, toks)

    def test_conflation_classes(self):
        """Inflection families map to one stem (the property TF-IDF
        and GDBR rely on)."""
        from atra_spark.functions.stemmer import (
            stem_french, stem_italian, stem_russian, stem_spanish,
        )

        assert len({stem_french(w) for w in ("continuer", "continuation")}) == 1
        assert len({stem_spanish(w) for w in ("nacional", "nacionales")}) == 1
        assert len({stem_italian(w) for w in ("abbandonare", "abbandonati")}) == 1
        assert len({stem_russian(w) for w in ("книга", "книги", "книгами")}) == 1


class TestSwedish:
    """snowballstem.org/algorithms/swedish/stemmer.html — vectors
    derived step-by-step from the published algorithm (möjligheterna→möj
    is the spec's own flagship conflation)."""

    VECTORS = {
        "jackorna": "jack", "klubbarna": "klubb", "hundarnas": "hund",
        "skulle": "skull", "möjligheterna": "möj", "flickor": "flick",
        "flickornas": "flick", "betalade": "betal", "svenskar": "svensk",
        "svensk": "svensk", "vackert": "vackert", "upprepa": "upprep",
        # step 2 consonant-pair shortening + step 3
        "religiositet": "religiositet", "stressigt": "stress",
        # valid s-ending gate: vowel before s blocks deletion
        "katts": "katt",  # whole tt pair must lie in R1 (PG15 official)
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_swedish

        fails = {w: (stem_swedish(w), want) for w, want in self.VECTORS.items()
                 if stem_swedish(w) != want}
        assert not fails, fails


class TestNorwegian:
    """snowballstem.org/algorithms/norwegian/stemmer.html (Bokmål)."""

    VECTORS = {
        "huset": "hus", "epler": "epl", "bilene": "bil",
        "gjestene": "gjest", "hans": "han", "kjørte": "kjørt",
        "arbeidet": "arbeid", "arbeider": "arbeid", "hetene": "het",
        "naturlig": "natur", "forskjellige": "forskjel",
        "billigste": "billigst",
        # erte/ert -> er (longest-match over the whole step-1 among)
        "forandret": "forandr",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_norwegian

        fails = {w: (stem_norwegian(w), want) for w, want in self.VECTORS.items()
                 if stem_norwegian(w) != want}
        assert not fails, fails

    def test_erte_beats_shorter_e(self):
        """A word ending 'erte' fully inside R1 must take the erte->er
        arm, not the bare-'e' delete arm."""
        from atra_spark.functions.stemmer import stem_norwegian

        assert stem_norwegian("markerte") == "marker"


class TestDutch:
    """snowballstem.org/algorithms/dutch/stemmer.html — the
    lichaam/lichamelijk/lichamelijkheden conflation is the spec's own
    worked example."""

    VECTORS = {
        "lichaam": "licham", "lichamen": "licham",
        "lichamelijk": "licham", "lichamelijkheden": "licham",
        "bedelaar": "bedelar", "lopen": "lop", "gelopen": "gelop",
        "huizen": "huiz", "huis": "huis", "appels": "appel",
        "moeilijkheden": "moeilijk", "dorpelingen": "dorpel",
        "yoghurt": "yoghurt", "lopend": "lopend",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_dutch

        fails = {w: (stem_dutch(w), want) for w, want in self.VECTORS.items()
                 if stem_dutch(w) != want}
        assert not fails, fails

    def test_accent_removal_and_marking(self):
        from atra_spark.functions.stemmer import stem_dutch

        # umlauts/acutes strip first (spec pre-step)
        assert stem_dutch("coördinatie") == stem_dutch("coordinatie")
        # consonant-marked i between vowels survives as i
        out = stem_dutch("draaien")
        assert "i" in out or "I" not in out


class TestPortuguese:
    """snowballstem.org/algorithms/portuguese/stemmer.html (ã/õ are
    internally a~/o~ exactly as the spec prescribes)."""

    VECTORS = {
        "bonita": "bonit", "bonito": "bonit",
        "quilométricas": "quilométr", "falaremos": "fal",
        "lógica": "lógic", "bolas": "bol", "bobagem": "bobag",
        "boa": "boa", "coração": "coraçã", "capitães": "capitã",
        "aborrecimento": "aborrec", "aborreço": "aborrec",
        # -ção keeps the nasal marker through the residual step
        "proposição": "proposiçã",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_portuguese

        fails = {w: (stem_portuguese(w), want) for w, want in self.VECTORS.items()
                 if stem_portuguese(w) != want}
        assert not fails, fails

    def test_conflation_classes(self):
        from atra_spark.functions.stemmer import stem_portuguese

        # inflected verb forms conflate with the stem
        assert len({stem_portuguese(w) for w in
                    ("falar", "falaremos", "falava", "falamos")}) == 1


class TestTranche3Registry:
    def test_iso_codes_resolve(self):
        from atra_spark.functions.stemmer import (
            STEMMERS,
            get_stemmer,
            stem_dutch,
            stem_norwegian,
            stem_portuguese,
            stem_swedish,
        )

        assert get_stemmer("swe") is stem_swedish
        assert get_stemmer("nor") is stem_norwegian
        assert get_stemmer("nld") is stem_dutch
        assert get_stemmer("por") is stem_portuguese
        assert STEMMERS["swedish"]("flickorna") == "flick"

    def test_stopword_lists_nonempty(self):
        from atra_spark.functions.stemmer import SNOWBALL_STOPWORDS

        for lang in ("swedish", "norwegian", "dutch", "portuguese",
                     "swe", "nor", "nld", "por"):
            assert len(SNOWBALL_STOPWORDS[lang]) > 30


class TestDanish:
    """snowballstem.org/algorithms/danish/stemmer.html — bestemmelse
    -> bestem is the spec's own worked example (els deletion + step-4
    undouble)."""

    VECTORS = {
        "huset": "hus", "husene": "hus", "hundene": "hund",
        "kagerne": "kag", "kirken": "kirk", "venlig": "ven",
        "venligst": "ven", "bestemmelse": "bestem",
        "indtagelsen": "indtag", "undersøgelse": "undersøg",
        "underligt": "under", "betalinger": "betaling",
        "spørgsmålet": "spørgsmål", "bøgerne": "bøg",
    }

    def test_vectors(self):
        from atra_spark.functions.stemmer import stem_danish

        fails = {w: (stem_danish(w), want) for w, want in self.VECTORS.items()
                 if stem_danish(w) != want}
        assert not fails, fails

    def test_registry_and_stopwords(self):
        from atra_spark.functions.stemmer import (
            SNOWBALL_STOPWORDS,
            get_stemmer,
            stem_danish,
        )

        assert get_stemmer("dan") is stem_danish
        assert len(SNOWBALL_STOPWORDS["danish"]) > 30
        # the a s-ending (Danish-specific: vowels a/å are valid
        # s-endings, unlike Swedish/Norwegian)
        assert stem_danish("villas") == "villa"


class TestPg15SnowballGoldens:
    """Tier-1b reference-grade fixtures: every implemented stemmer must
    reproduce PostgreSQL 15's embedded official Snowball implementation
    (the canonical snowballstem.org C sources, the same family
    rust-stemmers is generated from — atra reference
    text_processing/src/tokenizer.rs:31-72) exactly, on vocabulary
    drawn from this repo's language samples + PG stopword lists.
    Fixtures generated by scripts/gen_snowball_goldens.py."""

    FIXTURE_DIR = os.path.join(
        os.path.dirname(__file__), "fixtures", "snowball_pg15"
    )
    IMPLEMENTED = (
        "danish", "dutch", "english", "french", "german", "italian",
        "finnish", "hungarian", "norwegian", "portuguese",
        "romanian", "russian", "spanish", "swedish", "turkish",
    )

    def test_every_implemented_language_matches_official(self):
        for lang in self.IMPLEMENTED:
            fn = get_stemmer(lang)
            path = os.path.join(self.FIXTURE_DIR, lang + ".tsv")
            fails = []
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    word, want = line.rstrip("\n").split("\t")
                    got = fn(word)
                    if got != want:
                        fails.append((word, want, got))
            assert not fails, f"{lang}: {fails[:10]}"

    def test_fixture_coverage_is_substantial(self):
        # guards against a silently-truncated fixture making the
        # golden test vacuous
        for lang in self.IMPLEMENTED:
            path = os.path.join(self.FIXTURE_DIR, lang + ".tsv")
            n = sum(1 for _ in open(path, encoding="utf-8"))
            assert n >= 100, (lang, n)


class TestNativeLibstemmer:
    """Tier-2 reference parity for the native binding: the system
    libstemmer (Snowball's own C library, the project rust-stemmers is
    generated from) must reproduce the PG15 goldens on ALL 18
    rust-stemmers languages (text_processing/src/tokenizer.rs:31-72),
    and get_stemmer must route the three languages without a
    pure-Python spec implementation (greek, arabic, tamil) through it."""

    FIXTURE_DIR = TestPg15SnowballGoldens.FIXTURE_DIR
    ALL_LANGS = (
        "arabic", "danish", "dutch", "english", "finnish", "french",
        "german", "greek", "hungarian", "italian", "norwegian",
        "portuguese", "romanian", "russian", "spanish", "swedish",
        "tamil", "turkish",
    )

    def test_native_matches_goldens_all_languages(self):
        from atra_spark.functions.stemmer import native_stemmer

        total = 0
        for lang in self.ALL_LANGS:
            fn = native_stemmer(lang)
            if fn is None:
                import pytest
                pytest.skip("system libstemmer not available")
            path = os.path.join(self.FIXTURE_DIR, lang + ".tsv")
            fails = []
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    word, want = line.rstrip("\n").split("\t")
                    got = fn(word)
                    if got != want:
                        fails.append((word, want, got))
                    total += 1
            assert not fails, f"{lang}: {fails[:10]}"
        assert total >= 3000, total

    def test_get_stemmer_serves_native_only_languages(self):
        from atra_spark.functions.stemmer import native_stemmer

        if native_stemmer("greek") is None:
            import pytest
            pytest.skip("system libstemmer not available")
        for lang, iso3 in (("greek", "ell"), ("arabic", "ara"), ("tamil", "tam")):
            path = os.path.join(self.FIXTURE_DIR, lang + ".tsv")
            golden = dict(
                line.rstrip("\n").split("\t")
                for line in open(path, encoding="utf-8")
            )
            for key in (lang, iso3):
                fn = get_stemmer(key)
                for w, want in list(golden.items())[:50]:
                    assert fn(w) == want, (key, w)
        # the pinned empty-stem policy corner: a stem that reduces to
        # the empty string falls back to the lowercased input (PG
        # dict_snowball behaviour; greek stop-ish word όταν)
        assert get_stemmer("greek")("όταν") == "όταν"

    def test_pure_python_stays_primary(self):
        # english has a spec implementation; get_stemmer must NOT
        # replace it with the native handle
        assert get_stemmer("english") is stem_english
