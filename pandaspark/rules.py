"""Data-driven rule-cascade compiler — the reference's signature capability
(SURVEY.md §2.3) as a pure expression compiler.

The reference applies an ordered dict of category → {attribute: [substrings]}
as sequential masked updates where *later rules overwrite earlier matches*
(dict order = precedence), plus hand-written predicate rules after the loop
(/root/reference/panda.py:467-523) and a transfer cascade (531-547).

Here the cascade compiles to ONE chained `when` expression evaluated in
REVERSE rule order (first `when` = last rule = highest precedence) — a single
narrow projection, fully Catalyst-optimizable, no UDF, no driver-side loop
over data. At 100 TB this is one map-side pass fused into whole-stage
codegen; a ~400-branch CASE WHEN may exceed the JIT method limit, in which
case Spark transparently falls back to interpreted expression eval (still
vectorized columnar reads) — `chunk_size` exists to split the cascade into
sequential projections if profiling ever demands it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import ci_contains

__all__ = [
    "SubstringRule",
    "PredicateRule",
    "Rule",
    "rules_from_map",
    "compile_cascade",
    "apply_cascade",
]


@dataclass(frozen=True)
class SubstringRule:
    """Case-insensitive literal substring on one attribute, optionally
    scoped to an account (the reference's tuple rules)."""

    category: str
    attribute: str
    needle: str
    account: str | None = None

    def condition(self) -> Column:
        cond = ci_contains(self.attribute, self.needle)
        if self.account is not None:
            cond = cond & (F.col("account") == self.account)
        return cond


@dataclass(frozen=True)
class PredicateRule:
    """Arbitrary boolean-Column rule (the reference's 5 special cases:
    amount thresholds, equality on account/book_text, regex, conjunctions)."""

    category: str
    build: Callable[[], Column]

    def condition(self) -> Column:
        return self.build()


Rule = Union[SubstringRule, PredicateRule]


def rules_from_map(mapping: dict[str, dict[str, list]]) -> list[Rule]:
    """Flatten the reference's rule-table shape (category → attribute →
    [needle | (account, needle)]) into an ordered rule list. Dict order is
    preserved — it IS the precedence."""
    rules: list[Rule] = []
    for category, attr_map in mapping.items():
        for attribute, needles in attr_map.items():
            if not isinstance(needles, list):
                raise TypeError(f"rule table for {category!r}.{attribute!r} must be a list")
            for item in needles:
                if isinstance(item, tuple):
                    account, needle = item
                    rules.append(SubstringRule(category, attribute, needle, account))
                else:
                    rules.append(SubstringRule(category, attribute, item))
    return rules


def compile_cascade(rules: Sequence[Rule], existing: Column | None = None) -> Column:
    """Compile an ordered cascade into one Column with last-match-wins
    semantics. Rows matching no rule get `existing` (default NULL)."""
    acc = existing if existing is not None else F.lit(None).cast("string")
    expr: Column | None = None
    for rule in reversed(rules):
        cond, val = rule.condition(), F.lit(rule.category)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    if expr is None:
        return acc
    return expr.otherwise(acc)


def apply_cascade(
    df: DataFrame,
    rules: Sequence[Rule],
    target: str = "category",
    chunk_size: int | None = None,
) -> DataFrame:
    """Derive `target` from the cascade. Pure (no mutation): categorization
    is a view over the data, so re-running is idempotent by construction —
    the reference's key semantic (SURVEY.md §3.2).

    chunk_size splits the cascade into several sequential projections (each
    overriding the last) to bound codegen method size; semantics identical.
    """
    existing = F.col(target) if target in df.columns else None
    if not chunk_size:
        return df.withColumn(target, compile_cascade(rules, existing))
    acc = existing if existing is not None else F.lit(None).cast("string")
    out = df.withColumn(target, acc)
    for i in range(0, len(rules), chunk_size):
        out = out.withColumn(target, compile_cascade(rules[i : i + chunk_size], F.col(target)))
    return out
