"""Lucene's English stopword set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET,
33 words) — referenced by `analysis/DefaultEnglishAnalyzer.java:57`.
This list is public (Apache Lucene, derives from the classic Snowball
English stoplist subset that ships with StandardAnalyzer).
"""

ENGLISH_STOP_WORDS = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    ]
)
