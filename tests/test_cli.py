"""The CLI front door (reference: panda.py Typer commands) drives the same
library code the tests already verify — these tests check the wiring:
import → categorize → analyze → backup/restore round-trip, idempotent
re-import, and the registry query runner."""

from __future__ import annotations

import json

import pytest

from pandaspark.cli import main
from pandaspark.store import read_store

from .conftest import SF_DIR

CSV_HEADER = (
    "Buchung;Wertstellungsdatum;Auftraggeber/Empfänger;Buchungstext;"
    "Verwendungszweck;Betrag;Saldo;Währung"
)


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    csv = d / "umsatz_DE11111111111111111111_2024.csv"
    csv.write_text(
        "\n".join(
            [
                "Umsatzanzeige;Datei erstellt am: 01.02.2024",
                "",
                CSV_HEADER,
                "15.01.2024;15.01.2024;REWE Märkte GmbH;Lastschrift;Einkauf;-54,30;1.234,56;EUR",
                "16.01.2024;16.01.2024;Kreuzwerker;Gehalt/Rente;Gehalt Januar;3.500,00;4.734,56;EUR",
                "17.01.2024;17.01.2024;Stadtwerke;Lastschrift;Strom;-80,00;4.654,56;EUR",
            ]
        )
        + "\n",
        encoding="iso-8859-1",
    )
    rules = d / "rules.json"
    rules.write_text(
        json.dumps(
            {
                "einkaufen": {"party": ["rewe"]},
                "wohnen::strom": {"party": ["stadtwerke"]},
                "einnahmen::gehalt": {"party": [["giro", "kreuzwerker"]]},
            }
        )
    )
    amap = d / "accounts.json"
    amap.write_text(json.dumps({"DE11111111111111111111": "giro"}))
    return {"dir": d, "csv": str(csv), "rules": str(rules), "amap": str(amap)}


def test_cli_import_categorize_analyze_backup(cli_env, spark, capsys):
    store = str(cli_env["dir"] / "store")
    argv = [
        "ing-import",
        cli_env["csv"],
        "--store",
        store,
        "--rules",
        cli_env["rules"],
        "--account-map",
        cli_env["amap"],
    ]
    assert main(argv) == 0
    df = read_store(spark, store)
    assert df.count() == 3
    cats = {r.party: r.category for r in df.collect()}
    assert cats["REWE Märkte GmbH"] == "einkaufen"
    assert cats["Kreuzwerker"] == "einnahmen::gehalt"  # account-scoped JSON rule

    # re-import the same file: upsert is idempotent, ids unchanged
    assert main(argv) == 0
    df2 = read_store(spark, store)
    assert df2.count() == 3
    assert {r.transaction_id for r in df2.collect()} == {1, 2, 3}

    # categorize with an overriding rule table (later rules win)
    rules2 = cli_env["dir"] / "rules2.json"
    rules2.write_text(json.dumps({"food": {"party": ["rewe"]}}))
    assert main(["categorize", "--store", store, "--rules", str(rules2)]) == 0
    df3 = read_store(spark, store)
    assert {r.party: r.category for r in df3.collect()}["REWE Märkte GmbH"] == "food"
    # untouched rows keep their previous category (cascade preserves existing)
    assert {r.party: r.category for r in df3.collect()}["Kreuzwerker"] == "einnahmen::gehalt"

    # analyze prints a CSV header + rows
    capsys.readouterr()
    assert (
        main(["analyze", "--store", store, "--report", "expense_overview", "--year", "2024"])
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 2 and "," in out[0]

    # backup → restore round-trip preserves the row multiset
    backup = str(cli_env["dir"] / "backup.yaml")
    assert main(["backup", "--store", store, "--out", backup, "--format", "yaml"]) == 0
    restored = str(cli_env["dir"] / "restored")
    assert main(["restore", "--backup", backup, "--store", restored]) == 0
    a = read_store(spark, store).drop("book_year")
    b = read_store(spark, restored).drop("book_year")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_cli_query_runner(capsys):
    assert main(["query", "--name", "q01_pricing_summary", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("l_returnflag") or "," in out[0]
    assert len(out) >= 2


def test_cli_unknown_names_fail_cleanly(capsys):
    assert main(["query", "--name", "nope", "--sf-dir", SF_DIR]) == 2
    with pytest.raises(SystemExit):
        main(["bogus-command"])
