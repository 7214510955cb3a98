"""Golden-token tests for the non-English analyzer chains
(`analysis/multilingual.py`) and end-to-end lang-routed retrieval.

The CJK goldens pin the Lucene CJKAnalyzer contract
(StandardTokenizer -> width fold -> lowercase -> CJKBigramFilter ->
stop set); the French goldens pin the FrenchAnalyzer chain shape with
the published Savoy minimal stemmer (see module docstring for the
light-vs-minimal divergence note).
"""

import pytest

from anserini_spark.analysis.analyzer import analysis_version, analyze_for
from anserini_spark.analysis.multilingual import (
    analyzer_for_lang,
    cjk_analyze,
    fr_analyze,
    fr_minimal_stem,
)


# ------------------------------------------------------------- CJK

@pytest.mark.parametrize("text,expected", [
    # run of n CJK chars -> n-1 overlapping bigrams
    ("火花合并", ["火花", "花合", "合并"]),
    # lone CJK char between boundaries -> unigram
    ("大", ["大"]),
    ("a 大 b", ["大", "b"]),  # 'a' is a CJK stop word, 'b' is not
    # latin tokens pass through lowercased, CJK stop set applied
    ("Spark AND 火花", ["spark", "火花"]),
    ("the that www 表", ["表"]),
    # fullwidth ASCII folds to ASCII (CJKWidthFilter)
    ("ｓｐａｒｋ", ["spark"]),
    # ideographic space is a boundary
    ("火花　合并", ["火花", "合并"]),
    # latin embedded inside CJK splits the runs
    ("abc漢字def", ["abc", "漢字", "def"]),
    # cross-script bigrams (hiragana/katakana, incl. the prolonged
    # sound mark U+30FC which is in the katakana block)
    ("こんにちは", ["こん", "んに", "にち", "ちは"]),
    ("ワールド", ["ワー", "ール", "ルド"]),
    # hangul syllables bigram too (CJKBigramFilter HANGUL flag)
    ("한국어", ["한국", "국어"]),
    # punctuation splits runs; each side bigrams independently
    ("火花，合并", ["火花", "合并"]),
    ("", []),
])
def test_cjk_goldens(text, expected):
    assert cjk_analyze(text) == expected


def test_cjk_unigram_only_when_isolated():
    # a 2-char run never emits its unigrams, only the bigram
    assert "火" not in cjk_analyze("火花")
    assert cjk_analyze("火,花") == ["火", "花"]


# ---------------------------------------------------------- French

@pytest.mark.parametrize("text,expected", [
    # elision: l' d' qu' ... stripped before lowercase/stop/stem
    ("L'avion", ["avion"]),
    ("l'homme d'affaires", ["homme", "affair"]),  # homme < 6 chars
    ("qu'il jusqu'au", []),  # il + au are stop words after elision
    # stop words removed
    ("le chat et les chiens", ["chat", "chien"]),
    # -aux -> -al (len >= 6)
    ("chevaux", ["cheval"]),
    ("journaux", ["journal"]),
    # sequential s/r/e strip for len >= 6
    ("grande", ["grand"]),
    ("grandes", ["grand"]),
    # short words unchanged
    ("beau", ["beau"]),
    ("", []),
])
def test_fr_goldens(text, expected):
    assert fr_analyze(text) == expected


@pytest.mark.parametrize("word,stem", [
    ("chevaux", "cheval"),
    ("chevaliers", "chevali"),
    ("grande", "grand"),
    ("belle", "belle"),      # < 6 chars: unchanged
    ("cheval", "cheval"),
    ("animaux", "animal"),
])
def test_fr_minimal_stem(word, stem):
    assert fr_minimal_stem(word) == stem


# ----------------------------------------------------- routing/meta

def test_analyzer_for_lang():
    assert analyzer_for_lang("zh") == "cjk"
    assert analyzer_for_lang("ja") == "cjk"
    assert analyzer_for_lang("fr") == "fr"
    assert analyzer_for_lang("en") == "porter"
    assert analyzer_for_lang("xx") == "none"


def test_analyze_for_routes_chains():
    assert analyze_for("cjk")("火花") == ["火花"]
    assert analyze_for("fr")("L'avion") == ["avion"]
    assert analyze_for("ws")("a b") == ["a", "b"]
    assert analyze_for("porter")("running") == ["run"]


def test_analysis_versions_distinct():
    vs = {analysis_version(a) for a in ("porter", "krovetz", "none",
                                        "ws", "cjk", "fr")}
    assert len(vs) == 6  # every chain has its own gate version


# ------------------------------------------------ end-to-end (spark)

def test_cjk_and_fr_index_search(spark, tmp_path):
    """Index a tiny corpus through each chain and retrieve: the
    query-side analyzer must mirror the index-side chain (bigrams for
    zh, elision+stem for fr)."""
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import SimpleSearcher

    zh_rows = [
        ("https://zh/1", "火花合并很快", "zh"),
        ("https://zh/2", "窗口批次流", "zh"),
        ("https://zh/3", "顾客的值很大", "zh"),
    ]
    corpus = spark.createDataFrame(zh_rows, "url string, text string, lang string")
    out = str(tmp_path / "zh_idx")
    build_index(spark, corpus, IndexConfig(
        out_dir=out, analyzer="cjk", lang="zh",
        doc_partitions=2, block_partitions=2))
    s = SimpleSearcher(spark, out)
    hits = s.search("火花合并", k=3)
    assert hits and hits[0][0] == "https://zh/1"

    fr_rows = [
        ("https://fr/1", "L'avion des chevaux rapides", "fr"),
        ("https://fr/2", "le chat et la grande maison", "fr"),
    ]
    corpus = spark.createDataFrame(fr_rows, "url string, text string, lang string")
    out = str(tmp_path / "fr_idx")
    build_index(spark, corpus, IndexConfig(
        out_dir=out, analyzer="fr", lang="fr",
        doc_partitions=2, block_partitions=2))
    s = SimpleSearcher(spark, out)
    # query 'cheval' (singular) matches doc with 'chevaux' via -aux->-al
    hits = s.search("cheval", k=2)
    assert hits and hits[0][0] == "https://fr/1"
    # elision on the query side too ("avions" itself would be stopped
    # — it is an avoir conjugation in the snowball stop list)
    hits = s.search("d'avion", k=2)
    assert hits and hits[0][0] == "https://fr/1"


def test_store_positions_refused_for_non_english(spark):
    from anserini_spark.index.build import IndexConfig, _analyze_for

    with pytest.raises(ValueError, match="store_positions"):
        _analyze_for(IndexConfig(out_dir="/tmp/x", analyzer="cjk",
                                 store_positions=True))
