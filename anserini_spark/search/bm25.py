"""BM25 scoring math, float32, matching the reference's arithmetic.

Reference: `search/similarity/AccurateBM25Similarity.java:29-174` —

    idf(n, N)  = ln(1 + (N - n + 0.5) / (n + 0.5))          (L48-50)
    weight     = boost * idf                                 (float32)
    cache1     = k1 * (1 - b)                                (L123-133)
    cache2     = k1 * b / avgdl
    score(tf, dl) = weight * tf / (tf + cache1 + cache2*dl)  (L136-141)

Defaults k1=0.9, b=0.4 (`SearchArgs.java:115-119`); N = docCount (docs
with >=1 indexed term), avgdl = sumTotalTermFreq / docCount
(`AccurateBM25Similarity.java:52-54`). All arithmetic float32; idf is
computed in float64 then narrowed, as Lucene computes the double idf
and stores the float weight.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Params:
    k1: float = 0.9
    b: float = 0.4
    k: int = 1000  # hits (SearchArgs.java:85-86)
    # lossy=True reproduces the reference's DEFAULT ``-bm25`` runs:
    # doclen is quantized through Lucene's SmallFloat byte4 roundtrip
    # (the 1-byte norm of BM25Similarity; see
    # `util/ExtractDocumentLengths.java:85-93`). lossy=False is the
    # ``-bm25accurate`` exact-norm path (AccurateBM25Similarity).
    lossy: bool = False


def idf(df: int, doc_count: int) -> float:
    return math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))


class BM25Scorer:
    """Per-collection constants + vectorized float32 score kernel."""

    def __init__(self, doc_count: int, avgdl: float, params: BM25Params):
        self.doc_count = doc_count
        self.avgdl = avgdl
        self.params = params
        self.cache1 = np.float32(params.k1) * (
            np.float32(1.0) - np.float32(params.b)
        )
        self.cache2 = np.float32(params.k1) * np.float32(params.b) / np.float32(
            avgdl
        )

    def weight(self, df: int) -> np.float32:
        return np.float32(idf(df, self.doc_count))

    def _dl(self, dls: np.ndarray) -> np.ndarray:
        if self.params.lossy:
            from .smallfloat import quantize_length

            return quantize_length(dls).astype(np.float32)
        return np.asarray(dls).astype(np.float32)

    def score(self, weight: np.float32, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float32)
        dl = self._dl(dls)
        return weight * tf / (tf + self.cache1 + self.cache2 * dl)

    def max_block_score(self, weight: np.float32, max_tf, min_dl) -> np.ndarray:
        """Upper bound of any posting in a block: score is increasing in
        tf and decreasing in dl, so (max_tf, min_dl) bounds it. The
        lossy quantization is monotone, so quantize(min_dl) ==
        min(quantize(dl)) and the bound stays valid."""
        tf = np.asarray(max_tf, dtype=np.float32)
        dl = self._dl(np.asarray(min_dl))
        return weight * tf / (tf + self.cache1 + self.cache2 * dl)
