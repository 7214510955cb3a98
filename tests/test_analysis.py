"""Analyzer goldens — mirrors the reference's token-level tests
(`analysis/EnglishStemmingAnalyzerTest.java:28-43`)."""

from anserini_spark.analysis.analyzer import analyze, tokenize
from anserini_spark.analysis.porter import porter_stem


def test_reference_golden_porter_stop():
    assert analyze("City buses are running on schedule.") == [
        "citi", "buse", "run", "schedul",
    ]


def test_reference_golden_porter_keepstop():
    assert analyze("City buses are running on schedule.", keep_stopwords=True) == [
        "citi", "buse", "ar", "run", "on", "schedul",
    ]


def test_reference_golden_nostem():
    assert analyze("City buses are running on schedule.", stem="none") == [
        "city", "buses", "running", "schedule",
    ]


def test_possessive():
    assert analyze("the dog's") == ["dog"]
    assert analyze("DOG'S", stem="none") == ["dog"]
    assert analyze("dog’s bone", stem="none") == ["dog", "bone"]


def test_tokenizer_uax29_subset():
    assert tokenize("can't stop") == ["can't", "stop"]
    assert tokenize("visit example.com now") == ["visit", "example.com", "now"]
    assert tokenize("pi is 3.14, count 1,000") == ["pi", "is", "3.14", "count", "1,000"]
    assert tokenize("foo-bar under_score") == ["foo", "bar", "under_score"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_tokenizer_long_token_dropped():
    assert tokenize("a" * 256) == []
    assert tokenize("a" * 255) == ["a" * 255]


def test_porter_paper_examples():
    golden = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for w, s in golden.items():
        assert porter_stem(w) == s, f"{w} -> {porter_stem(w)} != {s}"


def test_short_words_unstemmed():
    for w in ["a", "is", "be", "ox"]:
        assert porter_stem(w) == w
