"""Hypothesis property tests over the scalar library and the rule cascade
(SURVEY.md §5.2 item 3). Each example batches many generated rows into ONE
Spark job, so randomized coverage stays fast."""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandaspark.functions import fingerprint, parse_german_number
from pandaspark.rules import SubstringRule, apply_cascade

FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _german(cents: int) -> str:
    sign = "-" if cents < 0 else ""
    euros, rest = divmod(abs(cents), 100)
    whole = f"{euros:,}".replace(",", ".")
    return f"{sign}{whole},{rest:02d}"


@FAST
@given(st.lists(st.integers(min_value=-(10**13), max_value=10**13), min_size=1, max_size=50))
def test_german_number_roundtrip(spark, cents_list):
    rows = [(i, _german(c)) for i, c in enumerate(cents_list)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {
        r.i: r.cents
        for r in df.select(
            "i", (parse_german_number("s") * 100).cast("long").alias("cents")
        ).collect()
    }
    assert got == {i: c for i, c in enumerate(cents_list)}


_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=30,
    ),
)


@FAST
@given(
    st.lists(
        st.tuples(_text, _text, _text, st.one_of(st.none(), st.integers(-(10**9), 10**9))),
        min_size=1,
        max_size=30,
    )
)
def test_fingerprint_matches_reference_semantics(spark, rows):
    """fingerprint == sha256 of '|'-joined natural key with nulls → ''/'0'
    (the reference's exact padding), for arbitrary unicode incl. '|'."""
    d0 = dt.date(2024, 1, 15)
    d1 = dt.date(2024, 1, 16)
    data = [("acct", d0, d1, p, b, u, c) for (p, b, u, c) in rows]
    df = spark.createDataFrame(
        data,
        "account string, book_date date, valuta_date date, party string,"
        " book_text string, purpose string, amount_cents long",
    )
    got = [r.fp for r in df.select(fingerprint().alias("fp")).collect()]
    want = [
        hashlib.sha256(
            "|".join(
                [
                    "acct",
                    "2024-01-15",
                    "2024-01-16",
                    p if p is not None else "",
                    b if b is not None else "",
                    u if u is not None else "",
                    str(c) if c is not None else "0",
                ]
            ).encode()
        ).hexdigest()
        for (p, b, u, c) in rows
    ]
    assert got == want


@FAST
@given(
    st.lists(st.sets(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), max_size=5), min_size=1, max_size=40),
    st.permutations(["aa", "bb", "cc", "dd", "ee"]),
)
def test_cascade_precedence_last_match_wins(spark, row_tokens, rule_order):
    """For a row containing tokens {t...}, the cascade must assign the
    category of the LAST rule (in declaration order) whose token appears —
    the reference's dict-order overwrite semantics, for every permutation."""
    rules = [SubstringRule(f"cat_{tok}", "party", tok) for tok in rule_order]
    data = [(i, " ".join(sorted(toks)) or None) for i, toks in enumerate(row_tokens)]
    df = spark.createDataFrame(data, "i int, party string")
    got = {r.i: r.category for r in apply_cascade(df, rules).collect()}
    for i, toks in enumerate(row_tokens):
        matching = [t for t in rule_order if t in toks]
        want = f"cat_{matching[-1]}" if matching else None
        assert got[i] == want, (i, toks, rule_order)
