"""openai-faithful normaliser tests (eval/normalizers.py).

Expected outputs mirror openai/whisper's EnglishTextNormalizer semantics
(numbers, ordinals, currency, contractions, spellings) so WER computed
through eval/harness.py is comparable to published Whisper numbers.
"""

import pytest

from openai_whisper_coreml_tpu.eval.normalizers import (
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishSpellingNormalizer,
    EnglishTextNormalizer,
)


@pytest.fixture(scope="module")
def num():
    return EnglishNumberNormalizer()


@pytest.mark.parametrize("inp,out", [
    ("two", "2"),
    ("thirty one", "31"),
    ("five twenty four", "524"),
    ("nineteen ninety nine", "1999"),
    ("twenty nineteen", "2019"),
    ("one point five", "1.5"),
    ("three point one four", "3.14"),
    ("two point five million", "2500000"),
    ("four point two percent", "4.2%"),
    ("fifty thousand", "50000"),
    ("one hundred and five", "105"),
    ("six hundred and sixty six", "666"),
    ("ten thousand three hundred", "10300"),
    ("minus five hundred", "-500"),
    ("double oh seven", "007"),
    ("nineteen oh five", "1905"),
    ("twenty first", "21st"),
    ("third", "3rd"),
    ("hundredth", "100th"),
    ("the nineteen seventies", "the 1970s"),
    ("five dollars", "$5"),
    ("one dollar", "$1"),
    ("five dollars and seventy cents", "$5.70"),
    ("seventy cents", "¢70"),
    ("zero point five", "0.5"),
    ("one and a half", "1.5"),
    ("a hundred", "100"),
    ("nineteen hundred", "1900"),
    ("one million", "1000000"),
    ("two thousand and one", "2001"),
    ("one percent", "1%"),
    ("he was born in nineteen sixty four", "he was born in 1964"),
])
def test_number_normalizer(num, inp, out):
    assert num(inp) == out


def test_number_normalizer_leaves_prose_alone(num):
    # bare interjection "oh", lone "one(s)", and "a" must not turn numeric
    assert num("oh say can you see") == "oh say can you see"
    assert num("I have one brother") == "I have one brother"
    assert num("the ones that matter") == "the ones that matter"
    assert num("a cat and a dog") == "a cat and a dog"


@pytest.mark.parametrize("inp,out", [
    ("colour", "color"), ("colours", "colors"), ("organise", "organize"),
    ("organisation", "organization"), ("centre", "center"),
    ("theatre", "theater"), ("analyse", "analyze"), ("litre", "liter"),
    ("metre", "meter"), ("fibre", "fiber"), ("sombre", "somber"),
    ("favourite", "favorite"), ("catalogue", "catalog"),
    ("neighbour", "neighbor"), ("behaviour", "behavior"),
    ("defence", "defense"), ("travelling", "traveling"),
    # non-British lookalikes stay put
    ("rise", "rise"), ("hour", "hour"), ("there", "there"),
    ("surprise", "surprise"), ("exercise", "exercise"), ("tour", "tour"),
    ("genre", "genre"), ("acre", "acre"),
])
def test_spelling_normalizer(inp, out):
    assert EnglishSpellingNormalizer()(inp) == out


def test_english_text_normalizer_pipeline():
    et = EnglishTextNormalizer()
    assert et("Mr. Brown won't pay $1,000 for the colour TV.") == \
        "mister brown will not pay $1000 for the color tv"
    assert et("It's twenty twenty-five and they're here!") == \
        "it is 2025 and they are here"
    assert et("I can't do [noise] that (laughs)") == "i can not do that"
    assert et("Let's meet at three thirty") == "let us meet at 330"
    assert et("um, I guess they've been, uh, busy") == \
        "i guess they have been busy"
    assert et("she'd gone by noon") == "she had gone by noon"


def test_basic_normalizer_diacritics():
    b = BasicTextNormalizer(remove_diacritics=True)
    assert b("Héllo, wörld!") == "hello world"


def test_wer_uses_english_normalizer():
    from openai_whisper_coreml_tpu.eval.wer import compute_wer

    r = compute_wer(["Mister Brown paid one thousand dollars."],
                    ["mr. brown paid $1,000"])
    assert r.wer == 0.0


def test_digit_tokens_with_decimal_and_currency_scale_multipliers():
    from openai_whisper_coreml_tpu.eval.normalizers import (
        EnglishNumberNormalizer)

    n = EnglishNumberNormalizer()
    assert n("1.5 million") == "1500000"
    assert n("$10 million") == "$10000000"
    assert n("$1.5 billion") == "$1500000000"
    assert n("50.5 percent") == "50.5%"
    assert n("$10 dollars") == "$10"


def test_and_joins_numbers_only_after_multipliers():
    from openai_whisper_coreml_tpu.eval.normalizers import (
        EnglishNumberNormalizer)

    n = EnglishNumberNormalizer()
    # post-1-respell keeps "one" spelled (openai readability rule)
    assert n("one and two") == "one and 2"
    assert n("sixty and five") == "60 and 5"
    assert n("one hundred and five") == "105"
    assert n("two thousand and eight") == "2008"


def test_ise_keep_covers_inflections():
    from openai_whisper_coreml_tpu.eval.normalizers import (
        EnglishTextNormalizer)

    e = EnglishTextNormalizer()
    for w in ("promised", "surprised", "praised", "advising", "exercised",
              "promises"):
        assert e(w) == w, w
    assert e("organised") == "organized"
    assert e("realising") == "realizing"


def test_ligatures_and_split_letters():
    from openai_whisper_coreml_tpu.eval.normalizers import (
        BasicTextNormalizer, remove_symbols_and_diacritics)

    assert remove_symbols_and_diacritics("søren œuvre straße") == \
        "soren oeuvre strasse"
    assert BasicTextNormalizer(split_letters=True)("héllo") == "h é l l o"
