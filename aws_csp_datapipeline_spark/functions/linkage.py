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

Two-phase architecture (the textbook ER pipeline at scale):

1. COLLAPSE exact duplicates: all lane construction, frequency
   splitting, candidate joins, and levenshtein verification run on
   DISTINCT (block, name) representatives. A duplicate-heavy corpus
   (the common case in web-scale entity data — and the measured case
   in the replicated .scratch/sf10 corpus, where every name appears
   100×) pays the expensive matching ONCE per distinct name, not once
   per record: without this, 100× duplication inflates the verify
   join's input ~10,000× and the old id-level formulation ground a
   13-minute sf10 stage (SCALE.md "er2 at sf10").
2. EXPAND back to record pairs: verified name-pairs equi-join to the
   record table on (block, name) twice; same-name record pairs come
   from a (block, name) self-equi-join at dist 0. Both joins emit
   each output pair exactly once — no distinct over the (possibly
   huge) record-pair set is ever needed, so this phase is
   OUTPUT-BOUND: its cost is the size of the answer, the lower bound
   for any correct implementation.

Key construction, for an edit budget of 2 SUBSTITUTIONS:

* Level 0: names only ever compare inside (block_cols..., length)
  — equal-length banding (a production variant widens to ±2 length
  bands for indels; see the recall contract below).
* Level 1: the 9-char discriminative suffix of the name is split into
  3 triples T0..T2; by pigeonhole, a pair with ≤2 substitutions has
  at least one untouched triple.
* Level 2: given the untouched triple t, the complementary 6 chars
  carry all ≤2 edits; their 3 bigrams B0..B2 again leave one
  untouched. Each name therefore emits 9 lane keys
  (block, length, t, T_t, j, B_j) — a pair with ≤2 substitutions
  collides on at least one.
* Frequency-aware split (the budget guard): lane-blocks bigger than
  ``cap`` would re-create the quadratic blow-up (low-entropy lanes —
  e.g. the all-zeros high-order digits of serial IDs — pin nothing).
  Oversized blocks re-pigeonhole the 4 still-unpinned complement
  chars: the name emits 4 sub-keys, each pinning one char; ≤2 subs
  leave ≥2 of the 4 untouched, so the collision guarantee SURVIVES
  the split — unlike a hash salt, which would drop cross-bucket pairs.

Recall contract: EXACT for pairs within 2 substitutions (verified
property: zero substitution pairs missed vs the quadratic er1 at
sf0.001/0.01/0.1, tests/test_linkage.py); identical-name pairs are
always emitted (phase-2 self-join — they need no blocking at all).
Pairs whose edit script needs an insert+delete (position shift) may
be missed — measured 2.6% of lev≤2 pairs at sf0.1, 0% at sf≤0.01;
the production extension for indel-heavy corpora is PassJoin's
shifted-segment probes (emit each triple also at ±shift positions),
which multiplies lanes by a constant and preserves the linear
candidate growth.

Cost shape at 100 TB: one distinct over (block, short-name) keys,
9-13 narrow key rows per DISTINCT name (measured candidate pairs:
6.0/record at sf0.01, 12.7/record at sf0.1 — vs the fixed-key er1's
6 → 60/record over the same step), one hash-agg for lane sizes, one
equi-join per side on the lane key, the banded levenshtein only on
surviving DISTINCT-name candidates, and output-bound expansion
joins. Every shuffle is keyed by short strings, never by record
payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator: cannot appear in the key fields it joins (documented
# caller contract — names containing \x1f would need a different sep).
_SEP = "\x1f"

# Unpinned complement positions per bigram index j (1-based): B_j pins
# comp[2j+1 .. 2j+2], the other four single chars re-pigeonhole
# oversized blocks.
_UNPINNED = {0: (3, 4, 5, 6), 1: (1, 2, 5, 6), 2: (1, 2, 3, 4)}


def _candidate_name_pairs(
    df: DataFrame,
    name_col: str,
    block_cols: list[str],
    cap: int,
) -> DataFrame:
    """Distinct candidate name pairs (block_cols..., name_a, name_b),
    name_a < name_b, from pigeonhole lanes over the DISTINCT
    (block, name) representatives of ``df`` (module docstring)."""
    names = df.select(*block_cols, name_col).distinct()
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

    laned = names.select(
        *block_cols,
        name.alias("_n"),
        F.explode(F.array(*lanes)).alias("l"),
    ).select(
        *block_cols, "_n", F.col("l.k").alias("k"), F.col("l.xs").alias("xs")
    )

    # sizes counts DISTINCT NAMES per lane (not records): duplication
    # never triggers the split, only genuine name-space density does.
    sizes = laned.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    # Oversized lane-blocks emit 4 sub-keys (one per unpinned char),
    # small ones the lane key itself — frequency-aware, recall-safe.
    subkeys = F.array(
        *[
            F.concat(F.col("k"), F.lit(_SEP + str(i)), F.element_at("xs", i + 1))
            for i in range(4)
        ]
    )
    # Join-strategy note: static size estimates cannot see the ×9
    # explode fan-out (the scan side is small, the lane relations are
    # not), so Catalyst's initial plan broadcast BOTH the sizes join
    # and the self-join below — on an id-level formulation at sf10
    # that built a 13.5M-row broadcast and OOM'd the driver;
    # shuffled-hash then OOM'd the per-partition build map (no spill
    # fallback — the session-level SHJ caveat, session.py). merge
    # (sort-merge) is the only strategy here that degrades by
    # spilling instead of failing, which is what a frequency-blind
    # operator must pick: this is the inverse of the repo's "no
    # broadcast hints on scaled inputs" rule, not an exception to it.
    # Bonus: the two self-join sides sort+shuffle an identical
    # subtree, so the exchange is computed once and reused.
    keyed = laned.join(sizes.hint("merge"), "k").select(
        *block_cols,
        "_n",
        F.explode(
            F.when(F.col("n") > cap, subkeys).otherwise(F.array(F.col("k")))
        ).alias("fk"),
    )
    a = keyed.select(*block_cols, F.col("_n").alias("name_a"), "fk")
    b = keyed.select(F.col("_n").alias("name_b"), "fk")
    return (
        a.hint("merge")
        .join(b, ["fk"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select(*block_cols, "name_a", "name_b")
        .distinct()
    )


def _expand_to_ids(
    recs: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    name_pairs: DataFrame,
) -> DataFrame:
    """Output-bound expansion: name-level pairs back to record-level
    (id_a < id_b, name_a, name_b [, carried cols]) via two equi-joins
    on (block, name). Each output pair is produced exactly once — an
    unordered id pair determines its name pair — so no record-level
    distinct is needed."""
    carried = [c for c in name_pairs.columns if c not in
               (*block_cols, "name_a", "name_b")]
    # Parallelism guard for the fan-out: the name-pair set is orders
    # of magnitude smaller than its record-pair expansion, so AQE
    # (rightly, by shuffle bytes) coalesces the distinct's exchange to
    # ~1 partition — and when Catalyst then broadcasts the record
    # side, the ENTIRE fan-out is produced serially by that one task
    # (measured at sf10: 1 task, 7+ min, 31 cores idle). An explicit
    # round-robin spread of the TINY side costs nothing at any scale
    # and parallelizes the output-bound phase under any join strategy;
    # explicit repartition counts are exempt from AQE re-coalescing.
    n_parts = int(
        name_pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    name_pairs = name_pairs.repartition(n_parts)
    ra = recs.select(
        *[F.col(b).alias(f"_ba_{b}") for b in block_cols],
        F.col(name_col).alias("_na"),
        F.col(id_col).alias("_ia"),
    )
    rb = recs.select(
        *[F.col(b).alias(f"_bb_{b}") for b in block_cols],
        F.col(name_col).alias("_nb"),
        F.col(id_col).alias("_ib"),
    )
    joined = (
        name_pairs.join(
            ra,
            [F.col(f"_ba_{b}") == F.col(b) for b in block_cols]
            + [F.col("_na") == F.col("name_a")],
        )
        .join(
            rb,
            [F.col(f"_bb_{b}") == F.col(b) for b in block_cols]
            + [F.col("_nb") == F.col("name_b")],
        )
    )
    fwd = F.col("_ia") < F.col("_ib")
    return joined.select(
        F.least("_ia", "_ib").alias("id_a"),
        F.greatest("_ia", "_ib").alias("id_b"),
        F.when(fwd, F.col("name_a")).otherwise(F.col("name_b")).alias("name_a"),
        F.when(fwd, F.col("name_b")).otherwise(F.col("name_a")).alias("name_b"),
        *carried,
    )


def _same_name_pairs(
    recs: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
) -> DataFrame:
    """All (id_a < id_b) pairs of records sharing (block, name) —
    exact duplicates need no blocking; the self-equi-join is
    output-bound."""
    a = recs.select(
        *block_cols,
        F.col(name_col).alias("name_a"),
        F.col(id_col).alias("id_a"),
    )
    b = recs.select(
        *[F.col(c).alias(f"_b_{c}") for c in (*block_cols, name_col, id_col)]
    )
    return (
        a.join(
            b,
            [F.col(f"_b_{c}") == F.col(c) for c in block_cols]
            + [F.col(f"_b_{name_col}") == F.col("name_a")],
        )
        .filter(F.col("id_a") < F.col(f"_b_{id_col}"))
        .select(
            "id_a",
            F.col(f"_b_{id_col}").alias("id_b"),
            "name_a",
            F.col("name_a").alias("name_b"),
        )
    )


def pigeonhole_candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    cap: int = 32,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, name_a, name_b) for edit-distance
    matching under positional pigeonhole blocking (module docstring).
    Deterministic; callers verify with a banded ``levenshtein``.
    Identical-name pairs (trivially distance 0) are always candidates."""
    recs = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    npairs = _candidate_name_pairs(recs, "_nm", block_cols, cap)
    expanded = _expand_to_ids(recs, "_id", "_nm", block_cols, npairs)
    same = _same_name_pairs(recs, "_id", "_nm", block_cols)
    return expanded.unionByName(same)


def _shifted_candidate_name_pairs(
    df: DataFrame,
    name_col: str,
    block_cols: list[str],
    cap: int,
) -> DataFrame:
    """Indel-complete candidate name pairs (PassJoin-style shifted
    probes): every in-block pair within levenshtein 2 — substitutions
    AND insert/deletes — collides on at least one key.

    Construction (all on DISTINCT (block, name) representatives):

    * INDEX lanes: the 9-char suffix splits into 3 triples; key
      (block, t, triple). No length in the key — lev≤2 pairs may
      differ in length by up to 2.
    * PROBE lanes: each name also probes every (t, triple-content)
      it would present to a partner whose suffix window is displaced:
      the triple CONTENT is re-extracted at absolute offset δ ∈
      [-2, +2]. If lev(a,b) ≤ 2 then (partition a's suffix) some
      triple of a is untouched and appears in b end-anchored within
      displacement ≤ 2 (net length change to its right ≤ #edits) —
      so index(a) meets probe(b); the lemma applies symmetrically, so
      ordering the pair by name loses nothing.
    * Frequency-aware split (cap): an oversized level-1 lane
      re-pigeonholes the 6-char complement into parts — 3 bigrams for
      the contiguous complements (t=0,2); for t=1 the complement
      spans a seam, so its parts are bigram+single per region (4
      parts, seam never crossed — a seam-spanning part could be
      displaced DIFFERENTLY on each side). ≤2 edits leave ≥1 of 3
      (or ≥2 of 4) parts untouched, and the untouched part appears
      within ±2 of its canonical absolute position — probed
      accordingly. Recall survives the split exactly as in the
      aligned scheme.
    * SHORT lane: the suffix/probe arithmetic is clamp-free only for
      len ≥ 13, so every name with len ≤ 14 also shares one
      (block, short) lane — a pair outside the long path's guarantee
      has min len ≤ 12, hence both sides ≤ 14, hence collides there.

    Cost shape: ~18 short key rows per DISTINCT name (+ ~15-20 per
    oversized lane), one size aggregate, one equi-join. The shift
    multiplier (×5 per probe level) is the price of indel
    completeness — this is why er2 (substitution-exact, no shifts)
    remains the default and er3 the completeness lane. Probe rows
    whose key matches no index lane are dropped by the size join
    before the candidate join."""
    names = df.select(*block_cols, name_col).distinct()
    name = F.col(name_col)
    ln = F.length(name)
    sstart = F.greatest(F.lit(1), ln - 8)  # suffix abs start (1-based)
    s = F.substring(name, sstart, F.lit(9))

    def abs_sub(offset: int, width: int):
        # substring of NAME at suffix-coord `offset` (1-based within
        # the 9-char suffix window); shifted windows clamp at 1
        return F.substring(
            name, F.greatest(F.lit(1), sstart + offset - 1), F.lit(width)
        )

    def key(*parts):
        return F.concat_ws(
            _SEP,
            *[F.col(b).cast("string") for b in block_cols],
            *[F.lit(p) if isinstance(p, str) else p for p in parts],
        )

    # complement parts per t: (s-coord start, width); seam-free by
    # construction (t=1 splits per region)
    parts_of = {
        0: [(4, 2), (6, 2), (8, 2)],
        1: [(1, 2), (3, 1), (7, 2), (9, 1)],
        2: [(1, 2), (3, 2), (5, 2)],
    }
    shifts = range(-2, 3)
    # short lane: both roles, one key per block (never split)
    short = F.when(
        ln <= 14,
        F.array(F.struct(key("S").alias("k1"), F.lit(-1).alias("t"))),
    )

    def laned(lanes) -> DataFrame:
        # distinct: shifted probes often re-extract identical content
        # (e.g. inside digit runs) — identical keys add join rows, not
        # recall
        arr = F.array_distinct(
            F.concat(F.array(*lanes), F.coalesce(short, F.array()))
        )
        return names.select(
            *block_cols, name_col, F.explode(arr).alias("l")
        ).select(
            *block_cols,
            name_col,
            F.col("l.k1").alias("k1"),
            F.col("l.t").alias("t"),
        )

    idx_lanes = [
        F.struct(
            key(str(t), F.substring(s, 3 * t + 1, 3)).alias("k1"),
            F.lit(t).alias("t"),
        )
        for t in range(3)
    ]
    prb_lanes = [
        F.struct(
            key(str(t), abs_sub(3 * t + 1 + d, 3)).alias("k1"),
            F.lit(t).alias("t"),
        )
        for t in range(3)
        for d in shifts
    ]
    idx = laned(idx_lanes)
    prb = laned(prb_lanes)
    sizes = idx.groupBy("k1").agg(F.count(F.lit(1)).alias("n"))

    def with_level2(side: DataFrame, probe: bool) -> DataFrame:
        # below-cap lanes keep k1; oversized (non-short) lanes emit
        # level-2 keys: k1 + part id + part content — probed at ±2
        # absolute displacement on the probe side.
        subkeys = []
        for t in range(3):
            for pi, (a, w) in enumerate(parts_of[t]):
                for d2 in shifts if probe else (0,):
                    content = abs_sub(a + d2, w) if probe else F.substring(s, a, w)
                    subkeys.append(
                        F.when(
                            F.col("t") == t,
                            F.concat(
                                F.col("k1"),
                                F.lit(_SEP + str(pi) + _SEP),
                                content,
                            ),
                        )
                    )
        sub_arr = F.array_distinct(F.array_compact(F.array(*subkeys)))
        return side.join(sizes.hint("merge"), "k1").select(
            *block_cols,
            name_col,
            F.explode(
                F.when((F.col("n") > cap) & (F.col("t") >= 0), sub_arr)
                .otherwise(F.array(F.col("k1")))
            ).alias("fk"),
        )

    a = with_level2(idx, probe=False).select(
        *block_cols, F.col(name_col).alias("name_a"), "fk"
    )
    b = with_level2(prb, probe=True).select(
        F.col(name_col).alias("name_b"), "fk"
    )
    return (
        a.hint("merge")
        .join(b, ["fk"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select(*block_cols, "name_a", "name_b")
        .distinct()
    )


def pigeonhole_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    cap: int = 32,
    max_dist: int = 2,
) -> DataFrame:
    """Verified matches (id_a, id_b, name_a, name_b, dist) with
    levenshtein ≤ ``max_dist``, verified at NAME level before the
    output-bound expansion — on a duplicate-heavy corpus the banded
    levenshtein runs once per distinct name pair, not once per record
    pair, and identical-name pairs skip it entirely (dist 0)."""
    recs = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    verified = _candidate_name_pairs(recs, "_nm", block_cols, cap).withColumn(
        "dist", F.levenshtein("name_a", "name_b", max_dist)
    ).filter(F.col("dist").between(0, max_dist))
    expanded = _expand_to_ids(recs, "_id", "_nm", block_cols, verified)
    same = _same_name_pairs(recs, "_id", "_nm", block_cols).withColumn(
        "dist", F.lit(0)
    )
    return expanded.unionByName(same)


def edit_complete_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    cap: int = 32,
    max_dist: int = 2,
) -> DataFrame:
    """Like ``pigeonhole_matches`` but INDEL-COMPLETE: candidates come
    from ``_shifted_candidate_name_pairs`` (PassJoin-style shifted
    probes), so every in-block pair within levenshtein ``max_dist``
    — substitutions AND insert/deletes — is found. The two-phase
    collapse/expand architecture is unchanged: all shifted-probe work
    runs once per DISTINCT (block, name); the ×5-per-level shift
    multiplier is the documented price of completeness over
    ``pigeonhole_matches``. Only max_dist=2 is supported (the lane
    geometry — 3 segments, ±2 shifts — encodes the budget)."""
    if max_dist != 2:
        raise ValueError("edit_complete_matches encodes max_dist=2 lanes")
    recs = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    verified = _shifted_candidate_name_pairs(
        recs, "_nm", block_cols, cap
    ).withColumn(
        "dist", F.levenshtein("name_a", "name_b", max_dist)
    ).filter(F.col("dist").between(0, max_dist))
    expanded = _expand_to_ids(recs, "_id", "_nm", block_cols, verified)
    same = _same_name_pairs(recs, "_id", "_nm", block_cols).withColumn(
        "dist", F.lit(0)
    )
    return expanded.unionByName(same)
