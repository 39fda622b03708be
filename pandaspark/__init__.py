"""pandaspark — a PySpark-native analytics engine with the query and
data-processing capabilities of anpr/pandacount, rebuilt Spark-first.

Everything compiles to pure DataFrame expressions (zero row-at-a-time Python
UDFs on the reference-parity surface); storage is Parquet; the operator
surface is extended with LLM-data-pipeline primitives (dedup, similarity
search, text analysis) designed for 100 TB scale.

Blueprint: SURVEY.md. Reference (behavioral spec only): /root/reference/.
"""

__version__ = "0.1.0"
