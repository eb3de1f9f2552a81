"""Language identification: Cavnar-Trenkle character-trigram rank
profiles (the public algorithm family behind whatlang's trigram model,
atra/src/toolkit/language_detection.rs:97-253), plus the marker-word
lists that drive the JVM-side lang_scores operator and the fixture
vocabulary.

Profiles are built at import from embedded per-language sample text
(written for this repo; no external data). Detection ranks the
document's top trigrams against each language profile and picks the
minimum out-of-place distance — deterministic, pure Python, run inside
the Arrow extraction batches. Codes are ISO-639-3 like the reference.
"""

from __future__ import annotations

import re
from collections import Counter

# marker words (function words, pairwise disjoint across languages) —
# used by the fixture generator, the JVM lang_scores operator, and as
# profile vocabulary
MARKERS: dict[str, tuple[str, ...]] = {
    "eng": ("the", "and", "of", "with", "from", "that", "this", "have", "was", "are"),
    "deu": ("der", "und", "nicht", "das", "ist", "ein", "mit", "für", "auf", "sich"),
    "fra": ("le", "les", "est", "une", "dans", "pour", "qui", "pas", "sur", "vous"),
    "spa": ("el", "los", "es", "una", "para", "por", "con", "como", "más", "pero"),
    "ita": ("il", "di", "che", "non", "per", "sono", "anche", "della", "come", "questo"),
    "rus": ("это", "как", "что", "для", "его", "она", "они", "был", "при", "или"),
    "jpn": ("これ", "それ", "です", "ます", "から", "まで", "など", "して", "いる", "ある"),
}

# filler vocabulary per language (content words; overlap allowed — only
# MARKERS drive the fixture construction golden)
FILLER: dict[str, tuple[str, ...]] = {
    "eng": ("crawl", "page", "link", "data", "host", "queue", "table", "value"),
    "deu": ("seite", "daten", "wert", "tabelle", "rechner", "netz", "kette", "zahl"),
    "fra": ("page", "valeur", "table", "chaine", "reseau", "nombre", "texte", "mot"),
    "spa": ("pagina", "valor", "tabla", "cadena", "red", "numero", "texto", "palabra"),
    "ita": ("pagina", "valore", "tavola", "catena", "rete", "numero", "testo", "parola"),
    "rus": ("страница", "данные", "таблица", "ссылка", "число", "сеть", "текст", "слово"),
    "jpn": ("ページ", "データ", "リンク", "テーブル", "ネット", "テキスト", "数値", "言葉"),
}

# per-language sample text for trigram profiles (written for this repo)
_SAMPLES: dict[str, str] = {
    "eng": (
        "the quick survey shows that this page links data from every host "
        "we have seen and the table of values was built with care so that "
        "all of the results are stored with the text and the links that "
        "come from this crawl of the network"
    ),
    "deu": (
        "der rechner speichert die daten und die tabelle ist nicht leer "
        "denn ein netz von seiten wurde mit sorgfalt gebaut und der wert "
        "jeder kette steht auf der seite für sich damit das ergebnis "
        "nicht verloren geht und sich die zahl der seiten erhöht"
    ),
    "fra": (
        "le réseau garde les pages et la table est pleine de valeurs car "
        "une chaine de textes a été construite pour que les mots restent "
        "dans le nombre et que vous puissiez voir qui a mis le texte sur "
        "la page sans que les valeurs ne soient pas perdues"
    ),
    "spa": (
        "el sistema guarda los datos y la tabla es una red de paginas con "
        "valores para que el numero de palabras quede como texto y no se "
        "pierda pero los enlaces siguen en la cadena por si el valor de "
        "una pagina cambia más tarde con el texto"
    ),
    "ita": (
        "il sistema salva i dati e la tavola non è vuota perché una rete "
        "di pagine è stata costruita per questo e anche il numero delle "
        "parole resta come testo della catena che sono i valori di ogni "
        "pagina come questo testo che non si perde"
    ),
    "rus": (
        "это система хранит данные и таблица не пуста потому что сеть "
        "страниц была построена для того чтобы число слов осталось как "
        "текст и ссылка не потерялась при этом они видят что его значение "
        "или она была на странице как текст для всех"
    ),
    "jpn": (
        "これ は システム です データ を テーブル に 保存 します ページ の "
        "ネット から リンク まで テキスト など を 集めて いる 数値 も ある "
        "それ から 言葉 を して 保存 します これ まで の ページ です"
    ),
}

# profile-only languages (round-3 widening toward whatlang's coverage,
# language_detection.rs:97-253): detection knows them, the fixture
# generator does not (LANGS below stays the frozen fixture set).
# Samples are function-word-dense running text written for this repo.
_EXTRA_SAMPLES: dict[str, str] = {
    "por": (
        "o sistema guarda os dados e a tabela não está vazia porque uma "
        "rede de páginas foi construída com cuidado para que o número de "
        "palavras fique como texto e não se perca mas as ligações ficam "
        "na cadeia se o valor de uma página mudar mais tarde e você pode "
        "ver quem colocou o texto na página sem que os valores sejam "
        "perdidos pois isso é o que importa quando tudo está guardado"
    ),
    "nld": (
        "het systeem bewaart de gegevens en de tabel is niet leeg omdat "
        "een netwerk van pagina's met zorg werd gebouwd zodat het aantal "
        "woorden als tekst blijft en niet verloren gaat maar de links "
        "blijven in de keten als de waarde van een pagina later verandert "
        "en je kunt zien wie de tekst op de pagina heeft gezet zonder dat "
        "de waarden verloren gaan want dat is wat telt"
    ),
    "pol": (
        "system przechowuje dane a tabela nie jest pusta ponieważ sieć "
        "stron została zbudowana starannie żeby liczba słów pozostała "
        "jako tekst i nie zginęła ale łącza zostają w łańcuchu jeśli "
        "wartość strony zmieni się później i można zobaczyć kto umieścił "
        "tekst na stronie bez utraty wartości bo to jest właśnie to co "
        "się liczy kiedy wszystko jest zapisane"
    ),
    "tur": (
        "sistem verileri saklar ve tablo boş değildir çünkü sayfalardan "
        "oluşan bir ağ özenle kuruldu böylece kelime sayısı metin olarak "
        "kalır ve kaybolmaz ama bağlantılar zincirde kalır eğer bir "
        "sayfanın değeri daha sonra değişirse ve metni sayfaya kimin "
        "koyduğunu değerler kaybolmadan görebilirsiniz çünkü her şey "
        "saklandığında önemli olan budur"
    ),
    "ces": (
        "systém ukládá data a tabulka není prázdná protože síť stránek "
        "byla pečlivě postavena aby počet slov zůstal jako text a "
        "neztratil se ale odkazy zůstávají v řetězu pokud se hodnota "
        "stránky později změní a můžete vidět kdo umístil text na "
        "stránku aniž by se hodnoty ztratily protože právě to se počítá "
        "když je všechno uloženo"
    ),
    "swe": (
        "systemet sparar uppgifterna och tabellen är inte tom eftersom "
        "ett nätverk av sidor byggdes med omsorg så att antalet ord "
        "stannar som text och inte går förlorat men länkarna stannar i "
        "kedjan om värdet på en sida ändras senare och du kan se vem som "
        "satte texten på sidan utan att värdena går förlorade för det är "
        "vad som räknas när allting är sparat"
    ),
    "dan": (
        "systemet gemmer oplysningerne og tabellen er ikke tom fordi et "
        "netværk af sider blev bygget med omhu således at antallet af "
        "ord bliver som tekst og ikke går tabt men henvisningerne bliver "
        "i kæden hvis værdien af en side ændres senere og du kan se hvem "
        "der satte teksten på siden uden at værdierne går tabt for det "
        "er hvad der tæller når alting er gemt"
    ),
    "ron": (
        "sistemul păstrează datele și tabelul nu este gol pentru că o "
        "rețea de pagini a fost construită cu grijă astfel încât numărul "
        "de cuvinte să rămână ca text și să nu se piardă dar legăturile "
        "rămân în lanț dacă valoarea unei pagini se schimbă mai târziu "
        "și puteți vedea cine a pus textul pe pagină fără ca valorile să "
        "se piardă pentru că asta contează când totul este păstrat"
    ),
    "fin": (
        "järjestelmä tallentaa tiedot ja taulukko ei ole tyhjä koska "
        "sivujen verkko rakennettiin huolella jotta sanojen määrä pysyy "
        "tekstinä eikä katoa mutta linkit pysyvät ketjussa jos sivun "
        "arvo muuttuu myöhemmin ja voit nähdä kuka laittoi tekstin "
        "sivulle ilman että arvot katoavat koska sillä on merkitystä "
        "kun kaikki on tallennettu"
    ),
    "hun": (
        "a rendszer megőrzi az adatokat és a táblázat nem üres mert az "
        "oldalak hálózata gondosan épült hogy a szavak száma szövegként "
        "maradjon és ne vesszen el de a hivatkozások a láncban maradnak "
        "ha egy oldal értéke később megváltozik és láthatod ki tette a "
        "szöveget az oldalra anélkül hogy az értékek elvesznének mert ez "
        "számít amikor minden el van mentve"
    ),
    "ukr": (
        "ця система зберігає дані і таблиця не порожня тому що мережа "
        "сторінок була побудована дбайливо щоб кількість слів залишилася "
        "як текст і не загубилася але посилання залишаються в ланцюзі "
        "якщо значення сторінки зміниться пізніше і ви можете побачити "
        "хто поклав текст на сторінку без втрати значень бо саме це має "
        "значення коли все збережено"
    ),
    "ell": (
        "το σύστημα φυλάει τα δεδομένα και ο πίνακας δεν είναι άδειος "
        "γιατί ένα δίκτυο σελίδων χτίστηκε με προσοχή ώστε ο αριθμός των "
        "λέξεων να μείνει ως κείμενο και να μη χαθεί αλλά οι σύνδεσμοι "
        "μένουν στην αλυσίδα αν η αξία μιας σελίδας αλλάξει αργότερα και "
        "μπορείτε να δείτε ποιος έβαλε το κείμενο στη σελίδα χωρίς να "
        "χαθούν οι αξίες γιατί αυτό μετράει όταν όλα είναι φυλαγμένα"
    ),
    "kor": (
        "이 시스템 은 데이터 를 저장 하고 테이블 은 비어 있지 않습니다 "
        "왜냐하면 페이지 의 네트워크 가 신중하게 만들어져서 단어 의 수가 "
        "텍스트 로 남고 사라지지 않기 때문입니다 그러나 링크 는 체인 에 "
        "남아 있으며 페이지 의 값 이 나중에 바뀌면 누가 텍스트 를 페이지 "
        "에 넣었는지 값 을 잃지 않고 볼 수 있습니다"
    ),
    "ara": (
        "هذا النظام يحفظ البيانات والجدول ليس فارغا لأن شبكة من الصفحات "
        "بنيت بعناية حتى يبقى عدد الكلمات كنص ولا يضيع لكن الروابط تبقى "
        "في السلسلة إذا تغيرت قيمة صفحة لاحقا ويمكنك أن ترى من وضع النص "
        "على الصفحة دون أن تضيع القيم لأن هذا هو ما يهم عندما يكون كل "
        "شيء محفوظا"
    ),
    "heb": (
        "המערכת שומרת את הנתונים והטבלה אינה ריקה כי רשת של דפים נבנתה "
        "בזהירות כדי שמספר המילים יישאר כטקסט ולא יאבד אבל הקישורים "
        "נשארים בשרשרת אם הערך של דף משתנה מאוחר יותר ואתה יכול לראות "
        "מי שם את הטקסט על הדף מבלי שהערכים יאבדו כי זה מה שחשוב כאשר "
        "הכל שמור"
    ),
    "fas": (
        "این سامانه داده ها را نگه می دارد و جدول خالی نیست زیرا شبکه ای "
        "از صفحه ها با دقت ساخته شد تا شمار واژه ها به صورت متن بماند و "
        "گم نشود اما پیوندها در زنجیره می مانند اگر ارزش یک صفحه بعدا "
        "تغییر کند و می توانید ببینید چه کسی متن را روی صفحه گذاشت بدون "
        "اینکه ارزش ها از دست بروند زیرا این همان چیزی است که اهمیت دارد"
    ),
    "hin": (
        "यह प्रणाली आंकड़ों को सुरक्षित रखती है और तालिका खाली नहीं है "
        "क्योंकि पृष्ठों का जाल सावधानी से बनाया गया ताकि शब्दों की संख्या "
        "पाठ के रूप में बनी रहे और खो न जाए लेकिन कड़ियाँ श्रृंखला में "
        "रहती हैं यदि किसी पृष्ठ का मूल्य बाद में बदल जाए और आप देख सकते "
        "हैं कि किसने पाठ को पृष्ठ पर रखा बिना मूल्यों के खोए"
    ),
    "tha": (
        "ระบบนี้เก็บข้อมูลและตารางไม่ว่างเปล่าเพราะเครือข่ายของหน้าถูกสร้าง"
        "อย่างระมัดระวังเพื่อให้จำนวนคำยังคงเป็นข้อความและไม่สูญหายแต่ลิงก์"
        "ยังอยู่ในห่วงโซ่ถ้าค่าของหน้าเปลี่ยนภายหลังและคุณสามารถเห็นว่าใคร"
        "วางข้อความบนหน้าโดยไม่สูญเสียค่าเพราะนี่คือสิ่งที่สำคัญ"
    ),
    "vie": (
        "hệ thống này lưu giữ dữ liệu và bảng không trống vì một mạng "
        "lưới các trang được xây dựng cẩn thận để số lượng từ vẫn còn là "
        "văn bản và không bị mất nhưng các liên kết vẫn ở trong chuỗi "
        "nếu giá trị của một trang thay đổi sau này và bạn có thể thấy "
        "ai đã đặt văn bản lên trang mà không mất các giá trị vì đó là "
        "điều quan trọng khi mọi thứ được lưu giữ"
    ),
    "ind": (
        "sistem ini menyimpan data dan tabel tidak kosong karena "
        "jaringan halaman dibangun dengan hati hati supaya jumlah kata "
        "tetap sebagai teks dan tidak hilang tetapi tautan tetap dalam "
        "rantai jika nilai sebuah halaman berubah kemudian dan anda "
        "dapat melihat siapa yang meletakkan teks pada halaman tanpa "
        "kehilangan nilai karena itulah yang penting ketika semuanya "
        "tersimpan"
    ),
    "zho": (
        "这个系统保存数据而且表格不是空的因为页面的网络被仔细地建立起来"
        "使得词的数量作为文本保留下来而不会丢失但是链接留在链条里如果"
        "一个页面的值后来改变了你可以看到谁把文本放在页面上而值不会丢失"
        "因为当一切都被保存时这才是重要的"
    ),
    "bul": (
        "тази система пази данните и таблицата не е празна защото мрежа "
        "от страници беше изградена внимателно така че броят на думите "
        "да остане като текст и да не се изгуби но връзките остават във "
        "веригата ако стойността на една страница се промени по-късно и "
        "можете да видите кой е сложил текста на страницата без да се "
        "изгубят стойностите защото това е важното когато всичко е "
        "запазено"
    ),
    "nor": (
        "systemet lagrer opplysningene og tabellen er ikke tom fordi et "
        "nettverk av sider ble bygget med omhu slik at antallet ord blir "
        "værende som tekst og ikke går tapt men lenkene blir i kjeden "
        "hvis verdien av en side endres senere og du kan se hvem som "
        "satte teksten på siden uten at verdiene går tapt for det er det "
        "som teller når alt er lagret"
    ),
}

LANGS = tuple(MARKERS)  # frozen fixture set (generator + JVM markers)
DETECT_LANGS = LANGS + tuple(_EXTRA_SAMPLES)  # full detection coverage
UND = "und"

_PROFILE_TOP = 300
_WORD_CLEAN_RE = re.compile(r"[^\w\s]", re.UNICODE)
_WS_RE = re.compile(r"\s+")

_MARKER_INDEX: dict[str, str] = {}
for _lang, _words in MARKERS.items():
    for _w in _words:
        _MARKER_INDEX[_w] = _lang


def _trigram_ranks(text: str, top: int = _PROFILE_TOP) -> dict[str, int]:
    """Rank map of the ``top`` most frequent char trigrams (padded,
    punctuation stripped, whitespace collapsed). Counter ties break by
    first occurrence — deterministic for identical input."""
    t = " ".join(_WORD_CLEAN_RE.sub("", text.lower()).split())
    t = f" {t} "
    if len(t) < 3:
        return {}
    grams = Counter([t[i : i + 3] for i in range(len(t) - 2)])
    return {g: r for r, (g, _c) in enumerate(grams.most_common(top))}


def _build_profiles() -> dict[str, dict[str, int]]:
    out = {}
    for lang in LANGS:
        corpus = " ".join(
            (_SAMPLES[lang],)
            + MARKERS[lang] * 3  # function words dominate real rank profiles
            + FILLER[lang] * 2
        )
        out[lang] = _trigram_ranks(corpus)
    for lang, sample in _EXTRA_SAMPLES.items():
        out[lang] = _trigram_ranks(sample)
    return out


_PROFILES = _build_profiles()


def detect_lang(text: str | None) -> tuple[str | None, float | None]:
    """(iso639-3 code, confidence) by trigram rank distance
    (Cavnar-Trenkle out-of-place measure); ``und`` when the document
    profile matches no language (numbers-only, empty, markup noise)."""
    if not text:
        return None, None
    # 1024 chars carry ample trigram signal (Cavnar-Trenkle used 300-
    # gram profiles over short documents); the 4096-char window cost
    # ~28% of total extraction CPU for no accuracy gain on the corpus
    doc = _trigram_ranks(text[:1024])
    if not doc:
        return UND, 0.0
    max_rank = _PROFILE_TOP
    worst = len(doc) * max_rank
    best_lang, best_dist = None, None
    for lang in DETECT_LANGS:
        prof = _PROFILES[lang]
        d = sum(abs(prof.get(g, max_rank) - r) for g, r in doc.items())
        if best_dist is None or d < best_dist or (d == best_dist and lang < best_lang):
            best_lang, best_dist = lang, d
    conf = 1.0 - (best_dist / worst) if worst else 0.0
    if conf <= 0.02:  # indistinguishable from "matches nothing"
        return UND, 0.0
    return best_lang, conf
