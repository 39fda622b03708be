"""Report sink: the analysis pack rendered to a self-contained HTML
document (reference parity: reports/finanzberatung-report.html is the
reference's only user-facing rendered artifact; the underlying numbers
are the §3.3 analytics functions already oracle-tested elsewhere).

The golden-file test pins the ENTIRE rendered document byte-for-byte on
a synthetic store — any drift in section math, ordering, or markup shows
up as a diff."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pandaspark import analytics
from pandaspark.report import CostLine, HomeOfficeConfig, build_report, render_html

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "report_2024.html")


@pytest.fixture(scope="module")
def working_set(spark):
    rows = [
        # (account, book_date, party, book_text, purpose, amount, category, category_manual, transfer_category)
        ("giro", dt.date(2024, 1, 16), "Employer GmbH", "Gehalt/Rente", "Gehalt Januar", 3500.0, "einnahmen::gehalt::andreas", None, None),
        ("gesa", dt.date(2024, 2, 16), "Employer AG", "Gehalt/Rente", "Gehalt Februar", 2800.0, "einnahmen::gehalt::gesa", None, None),
        ("giro", dt.date(2024, 3, 1), "Familienkasse", "Gutschrift", "Kindergeld", 250.0, "einnahmen::kindergeld", None, None),
        ("giro", dt.date(2024, 1, 20), "REWE", "Lastschrift", "Einkauf", -54.3, "einkaufen", None, None),
        ("common", dt.date(2024, 4, 5), "Stadtwerke", "Lastschrift", "Strom Abschlag", -80.0, "wohnen::strom", None, None),
        ("common", dt.date(2024, 5, 5), "Hausverwaltung", "Dauerauftrag", "Wohngeld Mai", -320.0, "wohnen::wohngeld", None, None),
        ("common", dt.date(2024, 6, 12), "Finanzamt", "Lastschrift", "Grundsteuer Q2", -95.5, None, "wohnen::steuer", None),
        ("giro", dt.date(2024, 7, 3), "Mobilfunk AG", "Lastschrift", "Rechnung 2212", -29.99, "kommunikation::mobil", None, None),
        ("giro", dt.date(2024, 8, 9), "Unknown Shop", "Lastschrift", "Bestellung 4711", -12.34, None, None, None),
        ("gesa", dt.date(2024, 9, 2), "Mystery Corp", "Lastschrift", "Abo", -99.0, None, None, None),
        ("giro", dt.date(2024, 10, 1), "Sparkonto", "Umbuchung", "Sparen", -500.0, None, None, "intern::sparen"),
        ("giro", dt.date(2023, 12, 30), "REWE", "Lastschrift", "Einkauf Vorjahr", -20.0, "einkaufen", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "account string, book_date date, party string, book_text string,"
        " purpose string, amount double, category string,"
        " category_manual string, transfer_category string",
    )
    return analytics.with_cat(df)


@pytest.fixture(scope="module")
def report_data(working_set):
    ho = HomeOfficeConfig(
        area_total_m2=110.0,
        area_office_m2=13.0,
        account=None,
        lines=(
            CostLine("Electricity", pattern="stadtwerke"),
            CostLine("Housing fee", category="wohnen::wohngeld"),
            CostLine("Property tax", pattern="grundst"),
            CostLine("Mobile phone", pattern="2212", share=0.60),
        ),
    )
    return build_report(
        working_set, year=2024, keyword_patterns="grundst|wohngeld", home_office=ho
    )


def test_report_sections_math(report_data):
    s = report_data["sections"]
    income = {r["cat"]: r["total"] for r in s["income"]}
    assert income == {
        "einnahmen::gehalt::andreas": 3500.0,
        "einnahmen::gehalt::gesa": 2800.0,
        "einnahmen::kindergeld": 250.0,
        "TOTAL": 6550.0,
    }
    exp = {r["cat"]: r for r in s["expenses"]}
    # intern transfer + einnahmen excluded; transfer_category rows excluded
    assert set(exp) == {
        "einkaufen", "wohnen::strom", "wohnen::wohngeld", "wohnen::steuer",
        "kommunikation::mobil", "Uncategorized",
    }
    assert exp["wohnen::steuer"]["common"] == -95.5  # manual override wins
    assert exp["Uncategorized"]["total"] == -111.34
    # uncategorized residuals: ascending by amount with running total
    unc = s["uncategorized"]
    assert [r["amount"] for r in unc] == [-99.0, -12.34]
    assert [r["cumulative"] for r in unc] == [-99.0, -111.34]
    assert s["keyword"] == {"patterns": "grundst|wohngeld", "n": 2, "total": -415.5}
    ho = s["home_office"]
    assert ho["ratio"] == round(13.0 / 110.0, 4)
    lines = {x["label"]: x for x in ho["lines"]}
    assert lines["Housing fee"]["total"] == -320.0
    assert lines["Mobile phone"]["share"] == 0.6
    assert lines["Mobile phone"]["deductible"] == round(-29.99 * 0.6, 2)
    assert ho["total_deductible"] == round(
        sum(x["deductible"] for x in ho["lines"]), 2
    )


def test_report_golden_html(report_data):
    got = render_html(report_data)
    if not os.path.exists(GOLDEN):  # pragma: no cover - bootstrap only
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            fh.write(got)
        pytest.fail("golden file was missing; wrote it — rerun to compare")
    with open(GOLDEN) as fh:
        want = fh.read()
    assert got == want


def test_report_cli_end_to_end(tmp_path, spark):
    """`pandaspark report` over a real imported store writes a parseable
    document with every configured section."""
    import json

    from pandaspark.cli import main

    csv = tmp_path / "umsatz_DE22222222222222222222_2024.csv"
    csv.write_text(
        "\n".join(
            [
                "Umsatzanzeige;Datei erstellt am: 01.02.2024",
                "",
                "Buchung;Wertstellungsdatum;Auftraggeber/Empfänger;Buchungstext;"
                "Verwendungszweck;Betrag;Saldo;Währung",
                "15.01.2024;15.01.2024;REWE;Lastschrift;Einkauf;-54,30;1.000,00;EUR",
                "16.01.2024;16.01.2024;Employer;Gehalt/Rente;Gehalt;3.500,00;4.500,00;EUR",
                "17.01.2024;17.01.2024;Stadtwerke;Lastschrift;Strom;-80,00;4.420,00;EUR",
            ]
        )
        + "\n",
        encoding="iso-8859-1",
    )
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps({
        "einkaufen": {"party": ["rewe"]},
        "einnahmen::gehalt::andreas": {"party": ["employer"]},
    }))
    amap = tmp_path / "accounts.json"
    amap.write_text(json.dumps({"DE22222222222222222222": "giro"}))
    store = str(tmp_path / "store")
    assert main([
        "ing-import", str(csv), "--store", store,
        "--rules", str(rules), "--account-map", str(amap),
    ]) == 0
    ho_cfg = tmp_path / "ho.json"
    ho_cfg.write_text(json.dumps({
        "area_total_m2": 100.0, "area_office_m2": 10.0,
        "lines": [{"label": "Electricity", "pattern": "stadtwerke"}],
    }))
    out = tmp_path / "report.html"
    assert main([
        "report", "--store", store, "--out", str(out), "--year", "2024",
        "--pattern", "strom", "--home-office-config", str(ho_cfg),
    ]) == 0
    doc = out.read_text()
    assert doc.startswith("<!DOCTYPE html>")
    assert "Finance report 2024" in doc
    assert "einnahmen::gehalt::andreas" in doc
    assert "Home office" in doc and "Electricity" in doc
    assert "10.00%" in doc  # area share rendered
