"""Generate authoritative Snowball stemmer golden vectors from
PostgreSQL 15's embedded official Snowball implementation.

PostgreSQL vendors the canonical snowballstem.org C sources
(src/backend/snowball, BSD-licensed, public); `ts_lexize` over a
snowball dictionary created WITHOUT a stopword list applies exactly
the published algorithm (plus lowercasing, which our stemmers also
do). This pins atra_spark's pure-Python stemmers to the official
implementation the reference's rust-stemmers crate is generated from
(atra reference: text_processing/src/tokenizer.rs:31-72).

Usage (one-time, in-sandbox; output committed as fixtures):
    su -s /bin/bash nobody -c "initdb -D /tmp/pgstem/data -U postgres --no-sync"
    su -s /bin/bash nobody -c "pg_ctl -D /tmp/pgstem/data \
        -o \"-c listen_addresses='' -c unix_socket_directories=/tmp/pgstem\" start"
    python scripts/gen_snowball_goldens.py

Writes tests/fixtures/snowball_pg15/<language>.tsv (word<TAB>stem).
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import unicodedata

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "snowball_pg15")
PG_STOP_DIR = "/usr/share/postgresql/15/tsearch_data"
PSQL = ["psql", "-h", "/tmp/pgstem", "-U", "postgres", "-X", "-q", "-t", "-A"]

# every language the reference's rust-stemmers tokenizer dispatches to
LANGS = [
    "arabic", "danish", "dutch", "english", "finnish", "french",
    "german", "greek", "hungarian", "italian", "norwegian",
    "portuguese", "romanian", "russian", "spanish", "swedish",
    "tamil", "turkish",
]

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _words_from_text(text: str) -> list[str]:
    return [w.lower() for w in _WORD_RE.findall(text)]


def _lang_vocab(lang: str) -> list[str]:
    """Vocabulary: the repo's own language-ID sample texts (written for
    this repo), the PostgreSQL stopword list when one ships for the
    language, and hand-written inflection-rich supplements below."""
    words: list[str] = []
    sys.path.insert(0, REPO)
    from atra_spark.functions.langdata import _profile_corpus, DETECT_LANGS  # noqa: E402

    iso = _ISO.get(lang)
    if iso and iso in DETECT_LANGS:
        words += _words_from_text(_profile_corpus(iso))
    stop = os.path.join(PG_STOP_DIR, f"{lang}.stop")
    if os.path.exists(stop):
        with open(stop, encoding="utf-8") as f:
            words += _words_from_text(f.read())
    words += _SUPPLEMENT.get(lang, [])
    # NFC-normalize (psql/snowball operate on NFC), dedup, stable order
    seen, out = set(), []
    for w in words:
        w = unicodedata.normalize("NFC", w)
        if w and w not in seen:
            seen.add(w)
            out.append(w)
    return out


_ISO = {
    "arabic": "ara", "danish": "dan", "dutch": "nld", "english": "eng",
    "finnish": "fin", "french": "fra", "german": "deu", "greek": "ell",
    "hungarian": "hun", "italian": "ita", "norwegian": "nor",
    "portuguese": "por", "romanian": "ron", "russian": "rus",
    "spanish": "spa", "swedish": "swe", "tamil": "tam", "turkish": "tur",
}

# hand-written morphologically rich supplements (inflected families so
# the vectors exercise suffix chains, not just surface stopwords)
_SUPPLEMENT: dict[str, list[str]] = {
    "finnish": _words_from_text(
        """
        taloissansakin taloissa talossa taloon talot talon taloja
        kirjoittaminen kirjoittamisen kirjoitettu kirjoittanut
        nopeasti nopeimmillaan nopeampi nopein suurimmissakin
        edeltäjistään edeltäjiensä ystävällisyydelläänkö
        järjestelmällisyydestään kansainvälisyyteen
        opiskelijoidenkin opettajillemme lukemattomia
        tietokoneellani tietokoneilla verkkosivustojen
        puhuttaessa ihmisyyteen yhteiskunnallisesti
        kauneimmatkaan vanhimmissakin pienemmässä
        juoksennellessaan syödessään vesissä vetten
        """
    ),
    "romanian": _words_from_text(
        """
        abilitățile abilitatea abilităților absolutul absolvenții
        acțiunile acțiunea activitățile adevărului aeroporturile
        bibliotecile bucuriile călătoriile capacitatea cercetările
        clădirile comunității conducerea contribuțiile copilăriei
        cunoștințele dezvoltarea dimensiunile drepturile educației
        evenimentele experiențele facultățile frumusețea generației
        guvernului importanța informațiile instituțiile încrederea
        întrebările jucătorii legăturile libertatea localitățile
        lucrările mulțumirile națiunile obiectivele organizațiile
        orașele părinților persoanele populația posibilitățile
        prieteniile problemele proiectele publicațiile realizările
        rezultatele sănătatea sărbătorile scriitorii serviciile
        societății soluțiile studenții tradițiile universitățile
        utilizatorii valorile vizitatorii frumoasă frumoși frumoase
        muncitoare muncitori vorbește vorbeau vorbiseră cântând
        mergând citească citeau iubire iubirii iubitor
        """
    ),
    "hungarian": _words_from_text(
        """
        babakocsijával házaikban könyveinket gyermekeiknek
        legnagyobbakként asztalokon székeken ablakokból
        barátaimmal tanárainknak egyetemeken városokban
        fejlesztéseket szolgáltatásainkat lehetőségeinket
        eredményeinkről kutatásainkban intézményeinknél
        történelmünkben kultúránkat nyelvünket irodalmunkból
        legszebbeket gyorsabban erősebbek okosabbakat
        szeretetteljes boldogságot egészségünkre
        számítógépeken telefonjaikkal üzeneteinket
        """
    ),
    "turkish": _words_from_text(
        """
        kitaplarından evlerimizde arkadaşlarımla çocuklarının
        öğretmenlerimiz üniversitelerde şehirlerarası
        bilgisayarlarımızı telefonlarından mesajlarınızı
        geliştirdiklerimiz çalışmalarımızda araştırmacıların
        gözlüklerini pencerelerden kapılarını bahçelerimizde
        en güzellerinden büyüklerimize küçüklerin
        yapabileceklerimizden gelemeyenlerin gittiklerinde
        okuduklarımız yazdıklarından söylediklerine
        türkçeleştiremediklerimizden muvaffakiyetsizleştiricileştiriveremeyebileceklerimizdenmişsinizcesine
        """
    ),
    "greek": _words_from_text(
        """
        υπολογιστές υπολογιστών βιβλιοθήκες βιβλιοθηκών
        πανεπιστήμια πανεπιστημίου μαθητές μαθητών δασκάλους
        ανθρώπους ανθρώπων γυναίκες γυναικών παιδιά παιδιών
        προβλήματα προβλημάτων αποτελέσματα αποτελεσμάτων
        κυβερνήσεις κυβερνήσεων αποφάσεις αποφάσεων
        ελευθερία ελευθερίας δημοκρατία δημοκρατίας
        ομορφότερος ομορφότερη γρηγορότερα μεγαλύτερες
        τραγουδούσαν διαβάζοντας γράφοντας μιλούσαμε
        αγαπημένος αγαπημένη εργαζόμενοι εργαζομένων
        """
    ),
    "arabic": _words_from_text(
        """
        المكتبات الكتاب الكتب كتابهم كتبهم مكتبة مكتبات
        المدرسة المدارس مدرستنا مدارسهم المعلمون المعلمين
        الطلاب طلابنا الجامعة الجامعات جامعتهم
        يكتبون تكتبين سيكتبون فكتبوا وكتبوا
        المستشفيات المستخدمين الاستخدامات استخداماتهم
        التكنولوجيا المعلومات معلوماتنا الحكومات حكومتهم
        والمسؤولية بالمسؤوليات للمسؤولين كالمعتادين
        """
    ),
    "tamil": _words_from_text(
        """
        புத்தகங்கள் புத்தகங்களை புத்தகத்தில் மாணவர்கள்
        மாணவர்களுக்கு பள்ளிகளில் ஆசிரியர்களால்
        கணினிகளில் தொலைபேசிகளை நகரங்களிலிருந்து
        குழந்தைகளுடன் பெற்றோர்களிடம் நண்பர்களோடு
        படித்தார்கள் எழுதுகிறார்கள் பேசுவார்கள்
        சென்றிருந்தேன் வந்திருக்கிறாள் செய்யப்பட்டது
        """
    ),
    # light supplements for already-implemented languages: the repo
    # sample texts + stop lists dominate; add a few suffix-chain words
    "english": ["nationalization", "hopefulness", "generously",
                "traditional", "citizenship", "agreed", "dying",
                "flying", "sensational", "rationalize"],
    "german": ["freundlichkeiten", "unabhängigkeitserklärung",
               "wissenschaftlerinnen", "möglichkeiten", "größten",
               "aufgeschlossenheit", "verantwortungsbewusstsein"],
    "french": ["nationalisation", "heureusement", "développement",
               "connaissances", "militantisme", "généralement",
               "possibilités", "chanteraient", "finissaient"],
    "spanish": ["nacionalización", "felizmente", "desarrollo",
                "conocimientos", "generalmente", "posibilidades",
                "cantarían", "terminaban", "universidades"],
    "italian": ["nazionalizzazione", "felicemente", "sviluppo",
                "conoscenze", "generalmente", "possibilità",
                "canterebbero", "finivano", "università"],
    "russian": ["национализация", "возможностями", "университетах",
                "развивающийся", "прекраснейшая", "читавшие",
                "государственность", "ответственностью"],
    "portuguese": ["nacionalização", "felizmente", "desenvolvimento",
                   "conhecimentos", "geralmente", "possibilidades",
                   "cantariam", "terminavam", "universidades"],
    "dutch": ["mogelijkheden", "verantwoordelijkheid", "ontwikkeling",
              "wetenschappers", "universiteiten", "vriendelijkste"],
    "swedish": ["möjligheterna", "utvecklingen", "universiteten",
                "vänligaste", "ansvarigheten", "forskarnas"],
    "norwegian": ["mulighetene", "utviklingen", "universitetene",
                  "vennligste", "forskernes", "hemmelighetene"],
    "danish": ["mulighederne", "udviklingen", "universiteterne",
               "venligste", "forskernes", "hemmelighederne"],
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for lang in LANGS:
        # dictionary WITHOUT StopWords: pure algorithm, every word stems
        subprocess.run(
            PSQL + ["-c",
                    f"DROP TEXT SEARCH DICTIONARY IF EXISTS g_{lang}; "
                    f"CREATE TEXT SEARCH DICTIONARY g_{lang} "
                    f"(TEMPLATE = snowball, Language = {lang});"],
            check=True, capture_output=True,
        )
        vocab = _lang_vocab(lang)
        # one round-trip: VALUES list -> ts_lexize
        values = ",".join("(" + _q(w) + ")" for w in vocab)
        sql = (
            f"SELECT w || E'\\t' || (ts_lexize('g_{lang}', w))[1] "
            f"FROM (VALUES {values}) AS t(w);"
        )
        r = subprocess.run(PSQL + ["-c", sql], check=True,
                           capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if "\t" in ln]
        out = os.path.join(OUT_DIR, f"{lang}.tsv")
        with open(out, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{lang}: {len(lines)} vectors -> {out}")


def _q(w: str) -> str:
    return "'" + w.replace("'", "''") + "'"


if __name__ == "__main__":
    main()
