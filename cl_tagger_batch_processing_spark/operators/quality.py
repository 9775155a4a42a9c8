"""The canonical document quality score — ONE definition shared by every
consumer (text_quality_score, text_quality_calibration,
dedup_exact_keep_best), so the copies cannot drift: 0.5·stopword_ratio +
0.25·uniq_ratio + 0.25·(min(avg_token_len, 8)/8), all exact-int ratios
divided once in double. A leaf module (imports nothing from operators/*)
so both text.py and dedup.py can depend on it without a cycle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["a", "the", "of", "and", "in", "to"]


def quality_components(text_col: Column, toks_col: Column) -> dict[str, Column]:
    """stop_ratio / uniq_ratio / avg_len / score Columns from a text column
    and its whitespace-token array (pass the array as its OWN attribute —
    HOF lambdas get no CSE; see text.text_repetition)."""
    n_tokens = F.size(toks_col)
    stop_ratio = (
        F.size(F.filter(toks_col, lambda t: t.isin(STOPWORDS))).cast("double")
        / n_tokens
    )
    uniq_ratio = F.size(F.array_distinct(toks_col)).cast("double") / n_tokens
    avg_len = (
        F.length(F.replace(text_col, F.lit(" "), F.lit(""))).cast("double") / n_tokens
    )
    score = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.25) * uniq_ratio
        + F.lit(0.25) * (F.least(avg_len, F.lit(8.0)) / F.lit(8.0))
    )
    return {
        "stop_ratio": stop_ratio,
        "uniq_ratio": uniq_ratio,
        "avg_len": avg_len,
        "score": score,
    }
