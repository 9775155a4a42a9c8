"""Physical-plan inspection helpers.

"Would this plan survive a 100× scale-up?" is checkable: filters must reach
the parquet scan, small dimensions must broadcast, the as-of join must stay
one exchange. These helpers read the optimized/executed plan text so tests
can pin plan SHAPE, not just results — a silent regression to a sort-merge
join or a full-schema scan fails CI even while answers stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text — unlike plan toString(), scan details
    (PushedFilters / ReadSchema) are printed in full, never truncated to
    the maxFields line-length cap."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — column pruning evidence."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def count_operator(df: DataFrame, operator: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'SortMergeJoin') in the executed plan."""
    return executed_plan(df).count(operator)


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only — excludes BroadcastExchange (which carries
    the 'Exchange' substring but moves no partitioned data)."""
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            executed_plan(df),
        )
    )
