"""Bank-statement CSV ingest (SURVEY.md §2.1 S1-S4) — distributed, no
driver-side file handling.

The source format (behavioral spec: /root/reference/panda.py:18-82) is a
German ING export: ISO-8859-1, ';'-separated, a variable-length preamble
before the header line, day-first dates, German decimals, and the account
encoded as an IBAN in the file name.

Spark-first design: Spark's CSV reader cannot skip a *variable-length*
preamble, and its text source is UTF-8-only. So files are read through the
`binaryFile` source (one row per file — bank exports are inherently small
per-file; thousands of files parallelize across the cluster), decoded
JVM-side with F.decode, sliced at the header with instr/substring, and
exploded into lines — every step a built-in expression, zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import parse_german_date, parse_german_number

HEADER_PREFIX = "Buchung;Wertstellungsdatum;Auftraggeber"

#: IBAN → logical account. 5-entry dim: compiled to a map expression
#: (broadcast-join-free; at 100 TB a constant map beats even a broadcast join).
DEFAULT_ACCOUNT_MAP = {
    "DE97500105175409854125": "common",
    "DE69500105175402313946": "giro",
    "DE27500105175404412327": "gesa",
    "DE18500105175525166237": "extra",
    "DE28500105175544958810": "extra-common",
}

#: German header → canonical column. Looked up by header *name* per file
#: (array_position over the split header), so files with shuffled or extra
#: columns (the two Währung columns, future bank format drift) still parse.
CSV_COLUMNS = [
    ("Buchung", "book_date_raw"),
    ("Wertstellungsdatum", "valuta_date_raw"),
    ("Auftraggeber/Empfänger", "party"),
    ("Buchungstext", "book_text"),
    ("Verwendungszweck", "purpose"),
    ("Betrag", "amount_raw"),
    ("Saldo", "balance_raw"),
]


def read_ing_csv(
    spark: SparkSession,
    path: str,
    account_map: dict[str, str] | None = None,
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """Path (glob ok) of ING CSV exports → canonical 8-column frame:
    account, book_date, valuta_date, party, book_text, purpose, amount,
    balance. Fully distributed; preamble length may differ per file."""
    account_map = account_map if account_map is not None else DEFAULT_ACCOUNT_MAP

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    txt = F.decode(F.col("content"), encoding)

    # Slice from the header line onward (preamble is variable-length).
    start = F.instr(txt, F.lit(HEADER_PREFIX))
    body = F.substring(txt, start, F.length(txt))

    lines = F.split(body, r"\r?\n")
    header = F.element_at(lines, 1)
    data_lines = F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))

    df = (
        raw.withColumn("_hfields", F.split(header, ";"))
        .filter(F.element_at("_hfields", 1) == "Buchung")
        .withColumn("line", F.explode(data_lines))
        .filter(F.trim("line") != "")
        .withColumn("fields", F.split("line", ";"))
    )

    for german, name in CSV_COLUMNS:
        pos = F.array_position("_hfields", german)  # 1-based, 0 if absent
        df = df.withColumn(name, F.get("fields", (pos - 1).cast("int")))

    # account from the IBAN embedded in the file name: <prefix>_<IBAN>_<sfx>.csv
    iban = F.regexp_extract(F.col("path"), r"_([A-Z]{2}\d+)_", 1)
    account_expr = F.create_map(*[F.lit(x) for kv in account_map.items() for x in kv])
    df = df.withColumn("account", F.element_at(account_expr, iban))

    empty_to_null = lambda c: F.when(F.trim(c) == "", None).otherwise(F.col(c) if isinstance(c, str) else c)
    return df.select(
        "account",
        parse_german_date("book_date_raw").alias("book_date"),
        parse_german_date("valuta_date_raw").alias("valuta_date"),
        empty_to_null("party").alias("party"),
        empty_to_null("book_text").alias("book_text"),
        empty_to_null("purpose").alias("purpose"),
        parse_german_number("amount_raw").cast("double").alias("amount"),
        parse_german_number("balance_raw").cast("double").alias("balance"),
    )
