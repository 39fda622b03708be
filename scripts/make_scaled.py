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

Usage: python scripts/make_scaled.py [src_dir] [dst_dir] [K] [hot_frac]
(hot_frac > 0 plants a hot key — see `scale()`; default 0 = uniform)
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

VOWELS = "aeiou"
CONS = "bcdfghjklmnpqrstvwz"


def doc_perm(c: int) -> tuple[str, str]:
    """The letter permutation applied to copy c's document text, as
    (source_alphabet, target_alphabet) for one `translate` call.

    Three axes, because the state space must exceed the copy count or the
    set contains cross-copy clone texts (the generator defect class the
    25× step first caught — clone groups hand the dedup/LSH families
    candidate volume that scales with the COPY COUNT, not the corpus):

      vowel rotation by c%5            (5 states)
      consonant rotation by (c//5)%19  (19 states; added for K>5)
      consonant REVERSAL on odd c//95  (2 states; added for K>95)

    The reversal is the only sound third axis of three tried: rotating
    digits left digit-free docs cloned, and adding 7·(c//95) to the
    consonant rotation re-aligned with a different c//5 (both measured at
    24,960 clone texts for K=100). A reversal is never a rotation of 19
    elements, so {rot} and {rev∘rot} are disjoint: 5·19·2 = 190 distinct
    permutations, injective in c (asserted by test_make_scaled). Copies
    c<95 are byte-identical to the published scheme, so the recorded
    5×/25× evidence is unaffected."""
    tgt_v = "".join(VOWELS[(i + c) % 5] for i in range(5))
    s = (c // 5) % 19
    tgt_c = CONS[s:] + CONS[:s]
    if (c // 95) % 2:
        tgt_c = tgt_c[::-1]
    return VOWELS + CONS, tgt_v + tgt_c


def scale(
    spark: SparkSession, src: str, dst: str, k: int, hot_frac: float = 0.0
) -> None:
    """Write the k× key-offset scale-up of src into dst (see module doc).

    `hot_frac` > 0 plants a REAL hot key after the copies are built: that
    fraction of lineitem rows is remapped to l_suppkey=0 and of events rows
    to user_id=0 (deterministic row-hash selection, so both engines and
    every re-run see the same rows). Key 0 exists in every copy's dimension
    range, so referential joins stay valid — the result is the "one mega
    supplier / one mega user" distribution that a uniform synthetic
    scale-up can never produce, used by the salted-join/skew evidence in
    docs/SCALING.md. Default 0.0 keeps all prior 5×/25× sets byte-stable."""
    # generator validity bound: documents have 190 distinct letter
    # permutations and embeddings 126 distinct (roll, sign) states — past
    # min(190, 126) the copies MUST contain cross-copy clones, which hands
    # the dedup/LSH families candidate volume that scales with the copy
    # count instead of the corpus. Fail loudly instead of measuring that.
    if k > 126:
        raise ValueError(
            f"K={k} exceeds the perturbation state space (126 distinct "
            "copies): the set would contain cross-copy clone texts/vectors "
            "— add another perturbation axis before building it"
        )
    os.makedirs(dst, exist_ok=True)

    for t in SHARED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: shared copy")

    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for c in range(k):
            df = base
            for kc in keys:
                df = df.withColumn(kc, F.col(kc) + F.lit(c * STRIDE))
            if t == "documents" and c > 0:
                src_a, tgt_a = doc_perm(c)
                if tgt_a != src_a:
                    df = df.withColumn("text", F.translate("text", src_a, tgt_a))
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
        if hot_frac > 0 and t in ("lineitem", "events"):
            key = "l_suppkey" if t == "lineitem" else "user_id"
            picker = F.pmod(
                F.xxhash64(*[F.col(c) for c in out.columns]), F.lit(10_000)
            ) < round(hot_frac * 10_000)  # round, not int(): 0.29*1e4 is 2899.999…
            out = out.withColumn(
                key, F.when(picker, F.lit(0)).otherwise(F.col(key))
            )
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
    hot_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    scale(spark, src, dst, k, hot_frac)
    spark.stop()


if __name__ == "__main__":
    main()
