"""Tweet analyzer — the reference's microblog chain
(`analysis/TweetAnalyzer.java:36-45`): WhitespaceTokenizer ->
TweetLowerCaseEntityPreservingFilter -> PorterStemFilter (keyword
tokens skip stemming).

The entity-preserving filter
(`analysis/TweetLowerCaseEntityPreservingFilter.java`) is a stateful
splitter re-derived here as a pure function over each whitespace
token, matching the reference's own goldens
(`TweetTokenizationTest.java:34-68`, pinned in
``tests/test_tweet_analysis.py``):

* a token that IS a URL is emitted verbatim (case preserved, no stem);
* a full mention/hashtag (``@u``/``#tag``, ASCII or fullwidth sign) is
  lowercased and kept whole (no stem);
* otherwise the token splits on its first NON-ENTITY delimiter
  (punctuation set below; the delimiter is dropped); if the head is
  then a valid entity it is kept whole, else it splits again on the
  first ENTITY delimiter (``@ # ＠ ＃ _`` — also dropped), is
  lowercased, scrubbed of remaining non-alphanumerics, and stemmed;
* the ``.`` is a delimiter only OUTSIDE an acronym run — position i
  splits iff a char two left or two right exists and is not itself a
  ``.`` (so ``U.S.A.`` scrubs to ``usa`` but ``C...D`` splits);
* the ``&`` is preserved between two uppercase letters (``AT&T`` ->
  ``att``) and a delimiter otherwise.

Entity shapes are simplified from twitter-text's Regex: URLs require
an explicit http(s) scheme (twitter-text also matches bare domains);
mentions are ``[@＠]\\w+(/\\w+)?``; hashtags are ``[#＃]\\w+`` with at
least one letter. All eleven reference golden tweets tokenize
identically under these shapes.
"""

from __future__ import annotations

import re
from typing import List

from .porter import porter_stem

_URL_RE = re.compile(r"^https?://\S+$", re.IGNORECASE)
_MENTION_RE = re.compile(r"^[@＠]\w+(?:/\w+)?$", re.UNICODE)
_HASHTAG_RE = re.compile(r"^[#＃]\w*[^\W\d_]\w*$", re.UNICODE)

_ENTITY_DELIMS = set("@#＠＃_")
_NONENTITY_DELIMS = set('[]!"$%()*+,/:;<=>?\\^`{|}~-…¬·')

_INVALID, _HASHTAG, _MENTION, _URL = 0, 1, 2, 3


def _entity_type(term: str) -> int:
    if _URL_RE.match(term):
        return _URL
    if _MENTION_RE.match(term):
        return _MENTION
    if _HASHTAG_RE.match(term):
        return _HASHTAG
    return _INVALID


def _is_nonentity_delim(s: str, i: int) -> bool:
    ch = s[i]
    if ch in _NONENTITY_DELIMS:
        return True
    if ch == ".":
        # a period inside an x.y.z acronym run is NOT a delimiter
        return (i >= 2 and s[i - 2] != ".") or \
            (i + 2 < len(s) and s[i + 2] != ".")
    if ch == "&":
        # AT&T-style uppercase&uppercase is preserved
        return (i < 1 or i + 1 >= len(s)
                or not s[i - 1].isupper() or not s[i + 1].isupper())
    return False


def _scrub(s: str) -> str:
    return "".join(c for c in s if c.isalnum())


def _process(tok: str):
    """One filter step: returns (emitted term or None, keyword?,
    [remainder tokens to reprocess, in order])."""
    ent = _entity_type(tok)
    if ent == _URL:
        return tok, True, []
    if ent != _INVALID:
        # mention/hashtag regexes anchor the sign at position 0 (URLs
        # returned above), so a full-match entity always starts with
        # an entity delimiter: lowercase, keyword, done. (The Java
        # filter re-scans for a mid-token sign because twitter-text's
        # fuller regexes permit lookbehind context; ours cannot match
        # that shape.)
        return tok.lower(), True, []

    tails: List[str] = []
    head = tok
    for i in range(len(head)):
        if _is_nonentity_delim(head, i):
            tails.append(head[i + 1:])
            head = head[:i]
            break
    if _entity_type(head) != _INVALID:
        return head.lower(), True, tails
    for i, c in enumerate(head):
        if c in _ENTITY_DELIMS:
            tails.insert(0, head[i + 1:])
            head = head[:i]
            break
    return _scrub(head.lower()), False, tails


def tweet_analyze(text: str, stemming: bool = True) -> List[str]:
    """Full TweetAnalyzer chain over one tweet."""
    if not text:
        return []
    out: List[str] = []
    for ws_tok in text.split():
        queue = [ws_tok]
        while queue:
            term, keyword, rest = _process(queue.pop(0))
            queue[0:0] = [r for r in rest if r]
            if not term:
                continue
            out.append(porter_stem(term)
                       if stemming and not keyword else term)
    return out
