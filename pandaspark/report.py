"""Self-contained HTML report over the §3.3 analysis pack — the engine's
user-facing document, mirroring the reference's only rendered artifact
(/root/reference/reports/finanzberatung-report.html, fed by the
panda_analysis.py notebook cells).

Split in three layers so each is independently testable:

  build_report(spark_df, year, ...) -> dict     bounded plain-Python data
  render_html(data)                 -> str      pure string, golden-testable
  write_report(...)                            CLI glue (report command)

The reference's home-office (Arbeitszimmer) pack hard-codes personal
constants (flat size, purchase costs, provider strings); those are NOT
ported — `HomeOfficeConfig` takes the same *shapes* (area ratio,
category- and pattern-matched cost lines, usage-share communication
lines) as user-supplied configuration.

Scale notes: every section is year/account-filtered first (partition
pruning against the book_year-partitioned store), aggregated in Spark,
and only report-sized results (category totals, residual rows capped at
`max_residual_rows`) are collected. Nothing row-scale reaches the driver.
"""

from __future__ import annotations

import html
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import analytics


@dataclass(frozen=True)
class CostLine:
    """One home-office cost position: matched by category subtree OR a
    case-insensitive regex over party/purpose; `share` overrides the area
    ratio (communication lines use a usage share instead)."""

    label: str
    category: str | None = None
    pattern: str | None = None
    share: float | None = None


@dataclass(frozen=True)
class HomeOfficeConfig:
    area_total_m2: float
    area_office_m2: float
    lines: tuple[CostLine, ...] = field(default_factory=tuple)
    account: str | None = None

    @property
    def ratio(self) -> float:
        return self.area_office_m2 / self.area_total_m2


def _rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    if limit is not None:
        df = df.limit(limit)
    return [r.asDict() for r in df.collect()]


def _line_total(df: DataFrame, year: int, line: CostLine, account: str | None) -> float:
    from .functions import in_category_subtree

    base = df.filter(F.year("book_date") == year)
    if account:
        base = base.filter(F.col("account") == account)
    if line.category:
        base = base.filter(in_category_subtree("cat", line.category))
    if line.pattern:
        rx = f"(?i)({line.pattern})"
        base = base.filter(
            F.coalesce("party", F.lit("")).rlike(rx)
            | F.coalesce("purpose", F.lit("")).rlike(rx)
        )
    [row] = base.agg(F.round(F.sum("amount"), 2).alias("total")).collect()
    return float(row.total or 0.0)


def build_report(
    df: DataFrame,
    year: int = 2024,
    keyword_patterns: str | None = None,
    home_office: HomeOfficeConfig | None = None,
    max_residual_rows: int = 50,
) -> dict:
    """Compute every report section; returns plain Python (JSON-shaped).

    `df` is the categorized working set (analytics.with_cat over
    read_store)."""
    data: dict = {"year": year, "sections": {}}
    data["sections"]["income"] = _rows(analytics.income_overview(df, year))
    data["sections"]["expenses"] = _rows(analytics.expense_overview(df, year))
    residuals = _rows(
        analytics.cumulative_uncategorized(df, year), limit=max_residual_rows
    )
    data["sections"]["uncategorized"] = residuals
    if keyword_patterns:
        [kw] = _rows(analytics.keyword_costs(df, keyword_patterns, year))
        data["sections"]["keyword"] = {"patterns": keyword_patterns, **kw}
    if home_office:
        lines = []
        for line in home_office.lines:
            total = _line_total(df, year, line, home_office.account)
            share = line.share if line.share is not None else home_office.ratio
            lines.append(
                {
                    "label": line.label,
                    "total": round(total, 2),
                    "share": round(share, 4),
                    "deductible": round(total * share, 2),
                }
            )
        data["sections"]["home_office"] = {
            "area_total_m2": home_office.area_total_m2,
            "area_office_m2": home_office.area_office_m2,
            "ratio": round(home_office.ratio, 4),
            "lines": lines,
            "total_deductible": round(sum(x["deductible"] for x in lines), 2),
        }
    return data


# --- rendering ----------------------------------------------------------------

_CSS = """
body{font-family:system-ui,-apple-system,'Segoe UI',Roboto,sans-serif;margin:0;
 background:#f4f5f7;color:#222;line-height:1.45;font-size:15px}
.wrap{max-width:840px;margin:0 auto;padding:36px 24px 64px}
h1{font-size:26px;margin:0 0 4px}
p.sub{color:#667;margin:0 0 20px;font-size:14px}
section{background:#fff;border:1px solid #dde1e6;border-radius:10px;
 padding:18px 22px;margin:18px 0}
h2{font-size:18px;margin:0 0 10px}
table{width:100%;border-collapse:collapse;font-size:14px}
th,td{text-align:left;padding:7px 8px;border-bottom:1px solid #e8eaee}
th{font-size:12px;text-transform:uppercase;letter-spacing:.04em;color:#667}
td.num,th.num{text-align:right;font-variant-numeric:tabular-nums;white-space:nowrap}
tr.total td{border-top:2px solid #222;border-bottom:none;font-weight:700}
.empty{color:#667;font-style:italic}
"""


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:,.2f}"
    return str(v)


def _table(rows: list[dict], num_cols: set[str], total_row_key: str | None = None) -> str:
    if not rows:
        return '<p class="empty">no rows</p>'
    cols = list(rows[0].keys())
    head = "".join(
        f'<th class="num">{html.escape(c)}</th>' if c in num_cols else f"<th>{html.escape(c)}</th>"
        for c in cols
    )
    body = []
    for r in rows:
        cls = ' class="total"' if total_row_key and r.get(total_row_key) == "TOTAL" else ""
        tds = "".join(
            f'<td class="num">{_fmt(r[c])}</td>' if c in num_cols else f"<td>{html.escape(_fmt(r[c]))}</td>"
            for c in cols
        )
        body.append(f"<tr{cls}>{tds}</tr>")
    return f"<table><thead><tr>{head}</tr></thead><tbody>{''.join(body)}</tbody></table>"


def render_html(data: dict) -> str:
    year = data["year"]
    s = data["sections"]
    parts = [
        "<!DOCTYPE html>",
        '<html lang="en"><head><meta charset="utf-8">',
        f"<title>Finance report {year}</title>",
        f"<style>{_CSS}</style></head><body>",
        '<div class="wrap">',
        f"<h1>Finance report {year}</h1>",
        '<p class="sub">Generated by pandaspark from the transactions store.</p>',
    ]
    inc = s.get("income", [])
    parts.append("<section><h2>1 · Income</h2>")
    parts.append(_table(inc, {"total"}, total_row_key="cat"))
    parts.append("</section>")

    exp = s.get("expenses", [])
    num_cols = set(exp[0].keys()) - {"cat"} if exp else set()
    parts.append("<section><h2>2 · Expenses by category × account</h2>")
    parts.append(_table(exp, num_cols))
    parts.append("</section>")

    unc = s.get("uncategorized", [])
    parts.append("<section><h2>3 · Uncategorized residuals</h2>")
    parts.append(_table(unc, {"amount", "cumulative"}))
    parts.append("</section>")

    if "keyword" in s:
        kw = s["keyword"]
        parts.append(
            f"<section><h2>4 · Keyword costs</h2><p>pattern: <code>{html.escape(kw['patterns'])}</code>"
            f" — {kw['n']} transactions, total {_fmt(kw['total'])}</p></section>"
        )
    if "home_office" in s:
        ho = s["home_office"]
        parts.append("<section><h2>5 · Home office</h2>")
        parts.append(
            f"<p>Area share: {_fmt(ho['area_office_m2'])} / {_fmt(ho['area_total_m2'])} m²"
            f" = {ho['ratio'] * 100:.2f}%</p>"
        )
        parts.append(_table(ho["lines"], {"total", "share", "deductible"}))
        parts.append(
            f"<p><strong>Total deductible {year}: {_fmt(ho['total_deductible'])}</strong></p>"
        )
        parts.append("</section>")
    parts.append("</div></body></html>")
    return "\n".join(parts)


def write_report(spark, store_path: str, out_path: str, year: int, **kwargs) -> dict:
    from .store import read_store

    df = analytics.with_cat(read_store(spark, store_path))
    data = build_report(df, year, **kwargs)
    with open(out_path, "w") as fh:
        fh.write(render_html(data))
    return data
