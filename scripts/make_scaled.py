"""Build the synthetic N× scale-up used for the scaling evidence in
docs/SCALING.md (default 5× of sf0.1 into /tmp/sf0.5syn).

Fact tables (lineitem, orders, customer, supplier, part, events,
documents, embeddings) are replicated K times with key offsets so every
copy joins consistently (orderkey/custkey/suppkey/partkey/vec_id/doc_id
all shift by copy*stride). Dimension tables (region, nation) are shared.

Content perturbation per copy keeps the dedup/LSH/ANN families honest:
  - documents: vowels rotate (a→e→i→o→u→a) once per copy index, so copies
    are NOT near-duplicates of each other (cross-copy near-dup pairs would
    otherwise grow quadratically and say nothing about real scaling);
  - embeddings: the vector's sign flips on odd copies and a copy-dependent
    orthogonal-ish rotation (coordinate roll) is applied, so ANN buckets
    don't collapse onto K identical centroids.

Timestamps, prices, and categorical columns are left untouched — the value
distributions (and therefore plan shapes: selectivities, group counts per
key) match the original data.

Usage: python scripts/make_scaled.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

STRIDE = 100_000_000  # far above any key in the fixtures

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def scale(spark: SparkSession, src: str, dst: str, k: int) -> None:
    """Write the k× key-offset scale-up of src into dst (see module doc)."""
    os.makedirs(dst, exist_ok=True)

    for t in SHARED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: shared copy")

    vowels = "aeiou"
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for c in range(k):
            df = base
            for kc in keys:
                df = df.withColumn(kc, F.col(kc) + F.lit(c * STRIDE))
            if t == "documents" and c > 0:
                rot = vowels[c % 5] + vowels[(1 + c) % 5] + vowels[(2 + c) % 5] + vowels[
                    (3 + c) % 5
                ] + vowels[(4 + c) % 5]
                df = df.withColumn("text", F.translate("text", vowels, rot))
                # the vowel rotation has period 5: without a second axis,
                # copies c and c+5 would be IDENTICAL text, so any K>5 set
                # would hand the dedup/LSH family clone groups whose
                # candidate volume scales with K instead of the corpus —
                # rotate the consonant alphabet by c//5 as well (combined
                # period 5*19=95, byte-identical to the old scheme for K<=5)
                if c // 5:
                    cons = "bcdfghjklmnpqrstvwz"
                    s = c // 5 % len(cons)
                    df = df.withColumn(
                        "text", F.translate("text", cons, cons[s:] + cons[:s])
                    )
            if t == "embeddings" and c > 0:
                sign = -1.0 if c % 2 else 1.0
                # roll period must exceed K/2 or copies collide (old c%8 +
                # sign parity repeated every 16 copies = exact clone vectors
                # for K>16); 63 keeps every copy distinct to K=63 and is
                # byte-identical to the old scheme for K<=8
                roll = c % 63
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        F.concat(
                            F.slice(F.col("embedding"), roll + 1, 10_000),
                            F.slice(F.col("embedding"), 1, roll),
                        ),
                        lambda x: x * F.lit(sign),
                    ).cast("array<float>"),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{k} -> {dst}/{t}.parquet")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-scaled")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # argv parsed here, not at module level: tests import `scale` under
    # pytest, whose own flags (-x -q) would otherwise hit int(argv[3])
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.5syn"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    scale(spark, src, dst, k)
    spark.stop()


if __name__ == "__main__":
    main()
