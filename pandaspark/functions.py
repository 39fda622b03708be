"""Scalar expression library — the reference's entire scalar surface
(SURVEY.md §2.2, §2.8) as pure Catalyst expressions. Zero Python UDFs:
every helper returns a Column built from pyspark.sql.functions, so the
whole surface stays inside whole-stage codegen at any scale.

Reference behaviors mirrored (citations are behavioral, not code):
  - German number parse        /root/reference/panda.py:62-67
  - day-first date parse       /root/reference/panda.py:60-61
  - cents encode/decode        /root/reference/panda.py:678-679, 652-653
  - whitespace→null normalize  /root/reference/panda.py:555
  - manual-category precedence /root/reference/panda.py:552-558
  - SHA-256 fingerprint        /root/reference/panda.py:569-593
  - '::' category hierarchy    /root/reference/panda.py:87-465
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "parse_german_number",
    "parse_german_date",
    "to_cents",
    "from_cents",
    "null_normalize",
    "effective_category",
    "fingerprint",
    "category_level",
    "in_category_subtree",
    "ci_contains",
    "amount_type",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_german_number(c: Column | str) -> Column:
    """'1.234,56' → 1234.56 (exact decimal).

    Strip thousands '.', then ',' → '.' — the same transform as the
    reference's two-step replace, executed as ONE translate pass:
    translate(c, ',.', '.') maps ',' → '.' and deletes '.' (unpaired
    matching chars are removed). Character-for-character identical to the
    regex pair on any input, but translate is a plain codegen'd char scan —
    no regex engine on a 100 TB hot path. Decimal (not double) so money
    arithmetic stays exact.
    """
    cleaned = F.translate(_col(c), ",.", ".")
    return cleaned.cast("decimal(18,2)")


def parse_german_date(c: Column | str) -> Column:
    """'31.12.2024' → DATE (day-first)."""
    return F.to_date(_col(c), "d.M.yyyy")


def to_cents(c: Column | str) -> Column:
    """Euros → integer cents with half-to-even rounding.

    The reference rounds through numpy (banker's rounding); F.bround is
    Spark's HALF_EVEN and matches. LongType: exact at any scale, no float
    drift through aggregations.
    """
    return F.bround(_col(c) * 100).cast("long")


def from_cents(c: Column | str) -> Column:
    """Integer cents → euro double (the reference's analysis-side view)."""
    return _col(c) / F.lit(100.0)


def null_normalize(c: Column | str) -> Column:
    """Whitespace-only or empty strings → NULL (reference regex ^\\s*$)."""
    c = _col(c)
    return F.when(c.rlike(r"^\s*$"), F.lit(None)).otherwise(c)


def effective_category(
    category_manual: Column | str = "category_manual",
    category: Column | str = "category",
) -> Column:
    """cat = manual override if present (whitespace ≠ present) else rule result."""
    return F.coalesce(null_normalize(category_manual), _col(category))


def fingerprint(
    account: Column | str = "account",
    book_date: Column | str = "book_date",
    valuta_date: Column | str = "valuta_date",
    party: Column | str = "party",
    book_text: Column | str = "book_text",
    purpose: Column | str = "purpose",
    amount_cents: Column | str = "amount_cents",
) -> Column:
    """SHA-256 hex of the natural key, nulls → ''/'0', '|'-joined.

    concat_ws *skips* nulls while the reference inserts empty strings, so
    every field is coalesced explicitly — silent hash divergence otherwise.
    """
    parts = [
        F.coalesce(_col(account).cast("string"), F.lit("")),
        F.coalesce(F.date_format(_col(book_date), "yyyy-MM-dd"), F.lit("")),
        F.coalesce(F.date_format(_col(valuta_date), "yyyy-MM-dd"), F.lit("")),
        F.coalesce(_col(party).cast("string"), F.lit("")),
        F.coalesce(_col(book_text).cast("string"), F.lit("")),
        F.coalesce(_col(purpose).cast("string"), F.lit("")),
        F.coalesce(_col(amount_cents).cast("string"), F.lit("0")),
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)


def category_level(c: Column | str, level: int) -> Column:
    """Nth level of a '::'-hierarchical category (0-based); NULL past depth."""
    return F.element_at(F.split(_col(c), "::"), level + 1)


def in_category_subtree(c: Column | str, prefix: str) -> Column:
    """Null-safe subtree test: cat startswith prefix (NULL → false)."""
    return F.coalesce(_col(c), F.lit("")).startswith(prefix)


def ci_contains(c: Column | str, needle: str) -> Column:
    """Case-insensitive *literal* substring, null-safe (NULL → false).

    Literal semantics (no regex metacharacters), matching pandas
    str.contains(..., regex=False).
    """
    return F.lower(F.coalesce(_col(c), F.lit(""))).contains(needle.lower())


def amount_type(c: Column | str = "amount") -> Column:
    """'Gutschrift' (credit) if amount > 0 else 'Abbuchung' (debit)."""
    return F.when(_col(c) > 0, F.lit("Gutschrift")).otherwise(F.lit("Abbuchung"))
