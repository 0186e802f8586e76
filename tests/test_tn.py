"""Golden tests for the semiotic-class text normalization cascade.

Pins the WFST-class coverage the reference gets from NeMo TN grammars
(reference: cli/frontend.py:31-35,322-338): dates, times, currency, decimals,
percent, fractions, ordinals, roman numerals, measures, phone numbers,
ranges, cardinals — per language.
"""

import pytest

from cosyvoice2_eu_tpu.frontend.text import normalize_french, normalize_german, normalize_english
from cosyvoice2_eu_tpu.frontend.tn import normalize_numbers_dates_units as tn


FR_CASES = [
    ("Le 12/03/2024 à 14h30.", "Le douze mars deux mille vingt-quatre à quatorze heures trente."),
    ("Il est 1h.", "Il est une heure."),
    ("Ça coûte 12,50 €.", "Ça coûte douze euros cinquante."),
    ("Ça coûte 15 €.", "Ça coûte quinze euros."),
    ("Environ 3,5 % de hausse.", "Environ trois virgule cinq pour cent de hausse."),
    ("Pi vaut 3,14 environ.", "Pi vaut trois virgule un quatre environ."),
    ("Le 1er prix et la 2e place.", "Le premier prix et la deuxième place."),
    ("Au XVe siècle.", "Au quinzième siècle."),
    ("Louis XIV et François Ier régnaient.", None),  # just no digits left
    ("Une distance de 5 km.", "Une distance de cinq kilomètres."),
    ("Une distance de 3,5 km.", "Une distance de trois virgule cinq kilomètres."),
    ("Ça coûte 1 234,56 €.", "Ça coûte mille deux-cent-trente-quatre euros cinquante-six."),
    ("Appelez le 06 12 34 56 78.", "Appelez le zéro six douze trente-quatre cinquante-six soixante-dix-huit."),
    ("Entre 10-20 minutes.", "Entre dix à vingt minutes."),
    ("Il y a 1 234 habitants.", "Il y a mille deux-cent-trente-quatre habitants."),
    ("Il fait -5 degrés.", "Il fait moins cinq degrés."),
    ("La moitié vaut 1/2.", "La moitié vaut un demi."),
]

DE_CASES = [
    ("Am 12.03.2024 um 14:30 Uhr.", "Am zwölfte März zweitausend vierundzwanzig um vierzehn Uhr dreißig."),
    ("Es kostet 12,50 €.", "Es kostet zwölf Euro fünfzig."),
    ("Etwa 3,5 % mehr.", "Etwa drei Komma fünf Prozent mehr."),
    ("Pi ist 3,14 ungefähr.", "Pi ist drei Komma eins vier ungefähr."),
    ("Der 3. Versuch.", "Der dritte Versuch."),
    ("Eine Strecke von 5 km.", "Eine Strecke von fünf Kilometer."),
    ("Eine Strecke von 3,5 km.", "Eine Strecke von drei Komma fünf Kilometer."),
    ("Zwischen 10-20 Minuten.", "Zwischen zehn bis zwanzig Minuten."),
    ("Es gibt 1.234 Einwohner.", "Es gibt eintausend zweihundertvierunddreißig Einwohner."),
    ("Es sind -5 Grad.", "Es sind minus fünf Grad."),
    ("Die Hälfte ist 1/2.", "Die Hälfte ist ein halb."),
    ("Es war 1995.", "Es war eintausend neunhundertfünfundneunzig."),
]

EN_CASES = [
    ("It costs $12.50 today.", "It costs twelve dollars fifty cents today."),
    ("About 3.5 % more.", "About three point five percent more."),
    ("The 3rd attempt and the 21st day.", "The third attempt and the twenty first day."),
    ("A distance of 5 km.", "A distance of five kilometers."),
    ("A distance of 3.5 km.", "A distance of three point five kilometers."),
    ("Between 10-20 minutes.", "Between ten to twenty minutes."),
    ("There are 1,234,567 people.",
     "There are one million two hundred thirty-four thousand five hundred sixty-seven people."),
    ("It is -5 degrees.", "It is minus five degrees."),
    ("Meet at 14:30 sharp.", "Meet at fourteen thirty sharp."),
]


def _no_digits(s: str) -> bool:
    return not any(ch.isdigit() for ch in s)


@pytest.mark.parametrize("src,want", FR_CASES)
def test_fr_tn(src, want):
    got = tn(src, "fr")
    assert _no_digits(got), got
    if want is not None:
        assert got == want


@pytest.mark.parametrize("src,want", DE_CASES)
def test_de_tn(src, want):
    got = tn(src, "de")
    assert _no_digits(got), got
    if want is not None:
        assert got == want


@pytest.mark.parametrize("src,want", EN_CASES)
def test_en_tn(src, want):
    got = tn(src, "en")
    assert _no_digits(got), got
    if want is not None:
        assert got == want


def test_electronic():
    assert tn("Écrivez à test@example.com !", "fr") == \
        "Écrivez à test arobase example point com !"
    assert "Punkt" in tn("info@firma.de", "de")
    assert tn("visit www.example.com now", "en") == "visit www dot example dot com now"


def test_full_normalizers_leave_no_digits():
    fr = normalize_french("M. Dupont paie 1 234,56 € le 12/03/2024 à 14h30 au 3e étage.")
    de = normalize_german("Dr. Meier zahlt 1.234,56 € am 12.03.2024 um 14:30 Uhr, z.B. 50 %.")
    en = normalize_english("Pay $1,234.56 on the 3rd at 14:30, about 50 %.")
    for s in (fr, de, en):
        assert _no_digits(s), s


def test_trigram_lid_short_mixed_sentences():
    """Statistical LID (frontend/lid.py, the lingua analog frontend.py:297)
    on exactly the short mixed-language sentences the heuristic missed."""
    from cosyvoice2_eu_tpu.frontend.text import detect_language as d

    cases = [
        ("Je ne sais pas", "fr"), ("Das weiß ich nicht", "de"),
        ("I don't know about that", "en"),
        ("Nous allons au cinema ce soir", "fr"),
        ("Wir gehen heute abend ins kino", "de"),
        ("We are going to the cinema tonight", "en"),
        ("la vie est belle", "fr"), ("das leben ist schoen", "de"),
        ("life is beautiful", "en"),
        ("merci beaucoup", "fr"), ("vielen dank", "de"),
        ("thank you very much", "en"),
        ("une bonne idee pour demain", "fr"),
        ("eine gute idee fuer morgen", "de"),
        ("a good idea for tomorrow", "en"),
    ]
    wrong = [(t, want, d(t)) for t, want in cases if d(t) != want]
    assert not wrong, wrong


def test_trigram_lid_orthographic_shortcuts():
    from cosyvoice2_eu_tpu.frontend.lid import detect_language

    assert detect_language("Straße") == "de"  # ß pins German
    assert detect_language("ça va") == "fr"   # ç pins French
    assert detect_language("xq zz") == "en"   # too little evidence -> default


def test_zh_detection_and_normalization():
    """zh short-circuit (reference frontend.py:299) + native basic zh TN
    (the reference without ttsfrd/WeTextProcessing returns text unchanged;
    frontend/zh.py verbalizes numbers and maps punctuation)."""
    from cosyvoice2_eu_tpu.frontend.text import detect_language
    from cosyvoice2_eu_tpu.frontend.zh import normalize_chinese, number_to_words_zh

    assert detect_language("你好，世界") == "zh"
    assert detect_language("这是 2024 年的测试") == "zh"

    assert number_to_words_zh(0) == "零"
    assert number_to_words_zh(10) == "十"
    assert number_to_words_zh(14) == "十四"
    assert number_to_words_zh(25) == "二十五"
    assert number_to_words_zh(105) == "一百零五"
    assert number_to_words_zh(1001) == "一千零一"
    assert number_to_words_zh(10000) == "一万"
    assert number_to_words_zh(12345) == "一万二千三百四十五"
    # zero-group separator: 一亿零一千, NOT 一亿一千 (which reads as 1.1亿)
    assert number_to_words_zh(100001000) == "一亿零一千"
    assert number_to_words_zh(100000001) == "一亿零一"
    # 10^12 group has its own unit
    assert number_to_words_zh(10**12) == "一万亿"
    assert number_to_words_zh(9999999999999) == (
        "九万亿九千九百九十九亿九千九百九十九万九千九百九十九"
    )
    # beyond supported units: digit-by-digit, never silently unit-less
    assert number_to_words_zh(10**16) == "一" + "零" * 16

    s = normalize_chinese("今年是2024年，增长25%，价格3.5元.")
    assert "二零二四年" in s
    assert "百分之二十五" in s
    assert "三点五" in s
    assert s.endswith("。")
    assert not any(c.isdigit() for c in s)
