"""Score-ties adjustment — the always-on final reranker stage.

Reference: `rerank/lib/ScoreTiesAdjusterReranker.java:36-73`: walk hits
in rank order; round each score to 4 decimals; within a run of equal
rounded scores subtract ``dup * 1e-6`` where ``dup`` counts prior
duplicates in the run, so emitted scores strictly decrease and
trec_eval re-sorting cannot permute ties.

Implemented as declarative window ops (no UDF): ranks are already
assigned, ties are consecutive, so ``dup = row_number within (qid,
rounded) - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adjust_score_ties(hits: DataFrame, qid_col: str = "qid",
                      rank_col: str = "rank",
                      score_col: str = "score") -> DataFrame:
    rounded = F.round(F.col(score_col).cast("double"), 4)
    w = Window.partitionBy(qid_col, rounded).orderBy(F.col(rank_col))
    dup = F.row_number().over(w) - F.lit(1)
    return hits.withColumn(
        score_col, rounded - dup.cast("double") * F.lit(1e-6)
    )
