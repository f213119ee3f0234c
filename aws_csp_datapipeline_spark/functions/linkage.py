"""Scale-safe blocking for entity resolution.

``er1_blocked_matches`` (plans/q_linkage.py) demonstrates classic
attribute blocking, whose FIXED (nation, segment) key makes in-block
candidate pairs grow quadratically with data size (measured: 9k pairs
at sf0.01 → 902k at sf0.1 → 90M at sf1, SCALE.md "er1 blocking
lesson"). This module is the scale path: positional pigeonhole
blocking with a frequency-aware sub-split, the same
candidate-generation architecture as MinHash-LSH banding
(functions/dedup.py) — explode a few deterministic keys per record,
equi-join on the key, exact-verify candidates — applied to
edit-distance matching on structured records (cf. the PassJoin /
Ed-Join partition-based family for edit-distance joins).

Key construction, for an edit budget of 2 SUBSTITUTIONS:

* Level 0: records only ever compare inside (block_cols..., length)
  — equal-length banding (a production variant widens to ±2 length
  bands for indels; see the recall contract below).
* Level 1: the 9-char discriminative suffix of the name is split into
  3 triples T0..T2; by pigeonhole, a pair with ≤2 substitutions has
  at least one untouched triple.
* Level 2: given the untouched triple t, the complementary 6 chars
  carry all ≤2 edits; their 3 bigrams B0..B2 again leave one
  untouched. Each record therefore emits 9 lane keys
  (block, length, t, T_t, j, B_j) — a pair with ≤2 substitutions
  collides on at least one.
* Frequency-aware split (the budget guard): lane-blocks bigger than
  ``cap`` would re-create the quadratic blow-up (low-entropy lanes —
  e.g. the all-zeros high-order digits of serial IDs — pin nothing).
  Oversized blocks re-pigeonhole the 4 still-unpinned complement
  chars: the record emits 4 sub-keys, each pinning one char; ≤2 subs
  leave ≥2 of the 4 untouched, so the collision guarantee SURVIVES
  the split — unlike a hash salt, which would drop cross-bucket pairs.

Recall contract: EXACT for pairs within 2 substitutions (verified
property: zero substitution pairs missed vs the quadratic er1 at
sf0.001/0.01/0.1, tests/test_linkage.py). Pairs whose edit script
needs an insert+delete (position shift) may be missed — measured 2.6%
of lev≤2 pairs at sf0.1, 0% at sf≤0.01; the production extension for
indel-heavy corpora is PassJoin's shifted-segment probes (emit each
triple also at ±shift positions), which multiplies lanes by a
constant and preserves the linear candidate growth.

Cost shape at 100 TB: 9-13 narrow key rows per record (measured
candidate pairs: 6.0/record at sf0.01, 12.7/record at sf0.1 — vs the
fixed-key er1's 6 → 60/record over the same step), one hash-agg for
lane sizes, one equi-join per side on the lane key, and the expensive
banded levenshtein only on surviving candidates. Every shuffle is
keyed by short strings, never by record payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator: cannot appear in the key fields it joins (documented
# caller contract — names containing \x1f would need a different sep).
_SEP = ""

# Unpinned complement positions per bigram index j (1-based): B_j pins
# comp[2j+1 .. 2j+2], the other four single chars re-pigeonhole
# oversized blocks.
_UNPINNED = {0: (3, 4, 5, 6), 1: (1, 2, 5, 6), 2: (1, 2, 3, 4)}


def pigeonhole_candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    cap: int = 32,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, name_a, name_b) for edit-distance
    matching under positional pigeonhole blocking (module docstring).
    Deterministic; callers verify with a banded ``levenshtein``."""
    name = F.col(name_col)
    ln = F.length(name)
    s = F.substring(name, F.greatest(F.lit(1), ln - 8), F.lit(9))

    def sub(col, pos: int, n: int):
        return F.substring(col, pos, n)

    lanes = []
    for t in range(3):
        triple = sub(s, 3 * t + 1, 3)
        if t == 0:
            comp = sub(s, 4, 6)
        elif t == 1:
            comp = F.concat(sub(s, 1, 3), sub(s, 7, 3))
        else:
            comp = sub(s, 1, 6)
        for j in range(3):
            key = F.concat_ws(
                _SEP,
                *[F.col(b).cast("string") for b in block_cols],
                ln.cast("string"),
                F.lit(str(t)),
                triple,
                F.lit(str(j)),
                sub(comp, 2 * j + 1, 2),
            )
            xs = F.array(*[sub(comp, u, 1) for u in _UNPINNED[j]])
            lanes.append(F.struct(key.alias("k"), xs.alias("xs")))

    laned = df.select(
        F.col(id_col).alias("id"),
        name.alias("name"),
        F.explode(F.array(*lanes)).alias("l"),
    ).select("id", "name", F.col("l.k").alias("k"), F.col("l.xs").alias("xs"))

    sizes = laned.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    # Oversized lane-blocks emit 4 sub-keys (one per unpinned char),
    # small ones the lane key itself — frequency-aware, recall-safe.
    subkeys = F.array(
        *[
            F.concat(F.col("k"), F.lit(_SEP + str(i)), F.element_at("xs", i + 1))
            for i in range(4)
        ]
    )
    keyed = (
        laned.join(sizes, "k")
        .select(
            "id",
            "name",
            F.explode(
                F.when(F.col("n") > cap, subkeys).otherwise(F.array(F.col("k")))
            ).alias("fk"),
        )
    )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "fk"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "fk"
    )
    return (
        a.join(b, ["fk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
