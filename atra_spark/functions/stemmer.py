"""Snowball stemmers (English/Porter2 and German), pure Python.

The reference tokenizer optionally stems via the rust-stemmers crate
(text_processing/src/tokenizer.rs:71-77, Snowball algorithms). No
stemmer library ships in this environment, so the two algorithms the
reference's own tests exercise (English, German — tokenizer.rs:92-105)
are implemented here from the published Snowball specifications
(snowballstem.org). Languages beyond these two fall back to identity
(declared in COVERAGE.md).

Pure per-token string functions — used inside Arrow-batched pandas
UDFs (textstats.tokenize), never as row-at-a-time Spark UDFs.
"""

from __future__ import annotations

_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = "cdeghkmnrt"

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _r1_r2_en(w: str) -> tuple[int, int]:
    # R1: after the first non-vowel following a vowel (special prefixes
    # gener/commun/arsen per the spec)
    r1 = len(w)
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(w)):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _is_short_syllable(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive of the non-vowel)."""
    if i == 1:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    return (
        i >= 2
        and w[i] not in _VOWELS
        and w[i] not in "wxY"
        and w[i - 1] in _VOWELS
        and w[i - 2] not in _VOWELS
    )


def _is_short_word(w: str, r1: int) -> bool:
    return r1 >= len(w) and _is_short_syllable(w, len(w) - 1)


def _contains_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem_english(word: str) -> str:
    """Porter2 / Snowball English stemmer (snowballstem.org spec).

    Input is lowercased first (the reference stems the raw token and
    lowercases after, rust_stemmers behavior; Snowball suffix rules
    only match lowercase, so pre-lowercasing is the faithful reading
    for web text — declared deviation for mixed-case tokens).
    """
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS1:
        return _EXCEPTIONS1[w]
    # mark consonant-y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if c == "y" and w[i - 1] in _VOWELS else c
        for i, c in enumerate(w)
    ) if "y" in w[1:] else w

    r1, r2 = _r1_r2_en(w)

    # step 0: 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _contains_vowel(w[:-2]):
        w = w[:-1]
    if w in _EXCEPTIONS2:
        return w
    # step 1b
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _contains_vowel(stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short_word(w, r1):
                        w += "e"
                break
    # step 1c: y -> i after consonant (not at word start)
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    # step 2 (in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("biliti", "ble"),
        ("tional", "tion"), ("lessli", "less"), ("ation", "ate"),
        ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
        ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"),
        ("anci", "ance"), ("abli", "able"), ("entli", "ent"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) > 3 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) > 2 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # step 3 (in R1; ative needs R2)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    ):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # step 4 (in R2)
    for suf in (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    ):
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) > 3 and w[-4] in "st":
            w = w[:-3]

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _is_short_syllable(w, len(w) - 2)
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.lower()


# ---------------------------------------------------------------------------
# German (Snowball spec, snowballstem.org/algorithms/german/stemmer.html)
# ---------------------------------------------------------------------------
_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = "bdfghklmnrt"
_DE_ST_ENDING = "bdfghklmnt"


def _r1_r2_de(w: str) -> tuple[int, int]:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3)  # region before R1 must cover >= 3 letters
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r2 = i + 1
            break
    return min(r1, len(w)), r2


def stem_german(word: str) -> str:
    """Snowball German stemmer. Lowercases first; ß→ss; final umlaut
    removal per the spec."""
    w = word.lower().replace("ß", "ss")
    if len(w) <= 2:
        return w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    # mark u/y between vowels as consonant
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1_r2_de(w)

    # step 1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[: -len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and len(w) - 1 >= r1
                and len(w) > 1
                and w[-2] in _DE_S_ENDING
            ):
                w = w[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and len(w) - 2 >= r1
            and len(w) > 5
            and w[-3] in _DE_ST_ENDING
        ):
            w = w[:-2]

    # step 3 (d-suffixes)
    if w.endswith(("end", "ung")):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
    elif w.endswith(("isch", "ik", "ig")):
        suf = "isch" if w.endswith("isch") else w[-2:]
        if len(w) - len(suf) >= r2 and (len(w) - len(suf) == 0 or w[-len(suf) - 1] != "e"):
            w = w[: -len(suf)]
    elif w.endswith(("lich", "heit")):
        if len(w) - 4 >= r2:
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and len(w) - 2 >= r1:
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if len(w) - 4 >= r2:
            w = w[:-4]
            if w.endswith("lich") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith("ig") and len(w) - 2 >= r2:
                w = w[:-2]

    return (
        w.lower()
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )


# ---------------------------------------------------------------------------
# Snowball stopword lists (published with the Snowball project; the
# reference's iso_stopwords registry serves the same per-language role,
# stopword_registry.rs — list provenance declared in COVERAGE.md)
# ---------------------------------------------------------------------------
SNOWBALL_STOPWORDS: dict[str, frozenset[str]] = {
    "english": frozenset("""
        i me my myself we our ours ourselves you your yours yourself
        yourselves he him his himself she her hers herself it its itself
        they them their theirs themselves what which who whom this that
        these those am is are was were be been being have has had having
        do does did doing a an the and but if or because as until while
        of at by for with about against between into through during
        before after above below to from up down in out on off over
        under again further then once here there when where why how all
        any both each few more most other some such no nor not only own
        same so than too very s t can will just don should now
    """.split()),
    "german": frozenset("""
        aber alle allem allen aller alles als also am an ander andere
        anderem anderen anderer anderes anderm andern anderr anders auch
        auf aus bei bin bis bist da damit dann der den des dem die das
        daß derselbe derselben denselben desselben demselben dieselbe
        dieselben dasselbe dazu dein deine deinem deinen deiner deines
        denn derer dessen dich dir du dies diese diesem diesen dieser
        dieses doch dort durch ein eine einem einen einer eines einig
        einige einigem einigen einiger einiges einmal er ihn ihm es
        etwas euer eure eurem euren eurer eures für gegen gewesen hab
        habe haben hat hatte hatten hier hin hinter ich mich mir ihr
        ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
        jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein
        keine keinem keinen keiner keines können könnte machen man
        manche manchem manchen mancher manches mein meine meinem meinen
        meiner meines mit muss musste nach nicht nichts noch nun nur ob
        oder ohne sehr sein seine seinem seinen seiner seines selbst
        sich sie sind so solche solchem solchen solcher solches soll
        sollte sondern sonst über um und uns unse unsem unsen unser
        unses unter viel vom von vor während war waren warst was weg
        weil weiter welche welchem welchen welcher welches wenn werde
        werden wie wieder will wir wird wirst wo wollen wollte würde
        würden zu zum zur zwar zwischen
    """.split()),
}
SNOWBALL_STOPWORDS["eng"] = SNOWBALL_STOPWORDS["english"]
SNOWBALL_STOPWORDS["deu"] = SNOWBALL_STOPWORDS["german"]

STEMMERS = {"english": stem_english, "eng": stem_english,
            "german": stem_german, "deu": stem_german}


def get_stemmer(name: str | None):
    """Stemmer callable for a language name/ISO code, identity if the
    language has no implemented algorithm (declared fallback)."""
    if name is None:
        return None
    return STEMMERS.get(name.lower(), lambda w: w.lower())
