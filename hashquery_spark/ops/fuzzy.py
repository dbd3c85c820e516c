"""Fuzzy (similarity) join between two tables — entity-resolution style
matching of short strings via character-shingle MinHash LSH with exact
Jaccard verification (net-new; the reference joins only on exact
predicates, src/model/source/join_one.py:8).

Scale design — the classic block-then-verify shape:

1. normalize + char-k-gram shingle each side (narrow codegen'd passes);
2. KM min-signatures + LSH band buckets (shared machinery with
   ops/dedup — one groupBy per side, shuffling (id, 16 longs) only);
3. candidate pairs = equi-join on (band, key): O(matching pairs), never
   the O(|L|·|R|) cross product;
4. exact verification recomputes gram sets ONLY for ids that appear in
   some candidate pair (explicit semi-join first), then checks true
   Jaccard ≥ threshold.

Strings never shuffle in the blocking phase; the verify phase shuffles
gram sets for candidate ids only. Caveat (inherent to char-gram
similarity, not this implementation): strings that share long common
prefixes/padding (e.g. zero-padded ids) compress the Jaccard range —
pick ``threshold`` against your data, or pre-strip boilerplate affixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    band_buckets,
    ensure_parallelism,
    km_signature,
    normalize_text,
    repartition_for_projection,
)


def _char_shingle_expr(norm_col: str, k: int) -> str:
    """Char k-grams of an already-materialized normalized column (the
    normalization regex must NOT sit inside the lambda — an outer
    expression referenced per element re-evaluates per element)."""
    n = f"`{norm_col}`"
    return (
        f"CASE WHEN length({n}) >= {k} THEN "
        f"transform(sequence(1, length({n}) - {k - 1}), i -> substring({n}, i, {k})) "
        "ELSE array() END"
    )


def _char_shingle_code_expr(norm_col: str, k: int) -> str:
    """Char k-grams of a ``normalize_text``-normalized column encoded as
    LONGs (r10, guide §2.3 — shuffle narrower types): the normalized
    alphabet is exactly ``[a-z0-9 ]`` (every char code < 128), so the
    fixed-width base-128 value ``Σ ascii(c_j)·128^(k-1-j)`` is an
    INJECTIVE encoding of the k-gram for k ≤ 9 (max value 128^9 − 1 =
    LONG_MAX) — gram-set sizes and intersection sizes are therefore
    bit-identical to the string form, and the code order equals the
    byte-lexicographic gram order for equal-length ASCII strings, so any
    (df, gram)-ordered prefix selection picks the SAME grams. 8-byte
    array elements replace ~13-byte string elements in every verify
    shuffle/intersect, and ``array_intersect`` hashes longs instead of
    UTF8Strings (measured: containment_join sf1 ~39 s → ~28 s min
    same-window interleaved; stable across external-load bursts where
    the string form swung 39-64 s). Callers must fall back to
    :func:`_char_shingle_expr` when k > 9."""
    n = f"`{norm_col}`"
    term = " + ".join(
        f"(ascii(substring({n}, i + {j}, 1)) * {128 ** (k - 1 - j)}L)"
        for j in range(k)
    )
    return (
        f"CASE WHEN length({n}) >= {k} THEN "
        f"transform(sequence(1, length({n}) - {k - 1}), i -> {term}) "
        "ELSE CAST(array() AS array<bigint>) END"
    )


def _verify_shingle_expr(norm_col: str, k: int) -> str:
    """Shingle expression for the VERIFY phase (exact Jaccard /
    containment over full gram sets): the long encoding whenever it is
    injective, strings otherwise. Safe wherever only set SIZES and
    intersection sizes feed the output — never where gram VALUES are
    hashed or emitted (MinHash signatures must keep hashing the gram
    strings: the oracle mirrors those md5 buckets)."""
    if k <= 9:
        return _char_shingle_code_expr(norm_col, k)
    return _char_shingle_expr(norm_col, k)


# Candidate-id/size frames are broadcast only below this many candidate
# PAIRS (a pair bounds each side's distinct ids): ~4M longs is a <50 MB
# hash relation — safe everywhere we run — while max_bucket_size=None or
# pathological band collisions can make the candidate set unbounded, and
# a forced broadcast there OOMs where a shuffle join only got slow (r9
# ADVICE). The count is read off the already-materialized checkpoint.
_BROADCAST_MAX_PAIRS = 4_000_000


def _gated_bcast(cands: DataFrame):
    """Return a ``bcast`` wrapper that applies ``F.broadcast`` only when
    the MATERIALIZED candidate-pair count is under
    :data:`_BROADCAST_MAX_PAIRS` (r9 ADVICE: never force a broadcast of
    an unbounded candidate set — with max_bucket_size=None or
    pathological band collisions a forced broadcast OOMs where a shuffle
    join only got slow). ``cands`` must already be an eager
    localCheckpoint, so the count is a cached-read job.

    NEGATIVE RESULT (r10, measured — do not re-add): a pre-verify SIZE
    SCREEN on the candidate pairs (J ≤ min/max of distinct shingle
    counts, containment ≤ min/|A|) was implemented here and REVERTED.
    LSH/prefix blocking already biases candidates toward similar-sized
    pairs, so the screen cut only ~10% of containment pairs at sf0.1
    (185k→167k) and near-nothing for jaccard, while its sizes pass
    re-ran the full shingle HOF over every candidate text per side plus
    an extra checkpoint barrier: containment_join 34→89 s,
    dedup_against_fuzzy 8.9→11.9 s, leakage_report 10.1→13.9 s at sf1
    (same-day windows). Same class as the r9 token-count-barrier
    reversal: a screen only pays when it cuts a lot more than it costs
    to evaluate."""
    n_pairs = cands.count()

    def bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_pairs <= _BROADCAST_MAX_PAIRS else df

    return bcast


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """(id_l, id_r, sim) — pairs whose normalized char-``k``-gram Jaccard
    similarity is ≥ ``threshold`` (rounded to 4 decimals pre-compare, so
    results are engine-exact). LSH recall caveat: a true pair is found
    only if some signature band collides — near-threshold pairs can be
    missed; raise ``bands`` (more, narrower bands) for higher recall.
    ``max_bucket_size`` (default 500, r4 verdict — ``None`` opts out)
    drops degenerate hot buckets per side before the pair join; the
    DuckDB oracle mirrors the cap."""
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")

    def prep(df: DataFrame, text: str, idc: str, out_id: str):
        normed = (
            df.where(F.col(text).isNotNull())
            .select(
                F.col(idc).alias(out_id), normalize_text(F.col(text)).alias("__norm__")
            )
            .where(F.length("__norm__") >= k)
        )
        ex = ensure_parallelism(normed).select(
            out_id, F.expr(f"explode({_char_shingle_expr('__norm__', k)})").alias("__s__")
        )
        sigs = km_signature(ex, out_id, "__s__", num_perm)
        return normed, band_buckets(sigs, out_id, num_perm, bands)

    ln, lb = prep(left, left_on, left_id, "id_l")
    rn, rb = prep(right, right_on, right_id, "id_r")
    if max_bucket_size is not None:
        # cap each side's hot buckets before the pair join (degenerate
        # keys from boilerplate strings otherwise pair quadratically)
        from .dedup import cap_bucket_size

        lb = cap_bucket_size(lb, max_bucket_size)
        rb = cap_bucket_size(rb, max_bucket_size)
    # consumed three times with different column pruning (id_l set, id_r
    # set, both) — the three blocking subtrees are structurally different,
    # ReusedExchange never fires, and the LSH pipeline would execute 3x
    # (profiled in snapshot.dedup_against_fuzzy). O(candidate pairs) small
    # -> materialize once.
    cands = (
        lb.join(rb, on=["band", "key"])
        .select("id_l", "id_r")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # no pre-verify size screen — measured net loss (see _gated_bcast)
    pruned, bcast = cands, _gated_bcast(cands)

    def gram_sets(normed: DataFrame, out_id: str, alias: str):
        # broadcast the candidate-id filter (the dedup_against_fuzzy
        # precedent; gated on the materialized pair count, r9 ADVICE):
        # the checkpointed pair frame is a LogicalRDD with no size
        # estimate, so the plain semi-join planned as a SortMergeJoin
        # that SHUFFLED the whole normalized corpus by id before
        # re-shingling — the ids are bounded by the (already
        # materialized, bounded-by-design) candidate pair frame.
        # Then repartition by the id BEFORE the shingle projection: the
        # broadcast join streams the corpus scan, so its output is NOT
        # hash-partitioned by the id and the downstream verify
        # SortMergeJoin would insert an Exchange ABOVE the projection —
        # shipping the full k-gram ARRAYS (~k x the text bytes; measured
        # 2x containment_join at sf1). Repartitioning first ships only
        # the candidate TEXTS and the arrays are built post-shuffle,
        # already positioned for the verify join.
        only = repartition_for_projection(
            normed.join(bcast(pruned.select(out_id).distinct()), on=out_id),
            out_id,
        )
        return only.selectExpr(
            out_id,
            # verify-only long gram codes (r10): exact Jaccard needs set
            # SIZES, not gram values — the injective base-128 encoding
            # gives identical results with 8-byte array elements. The
            # BLOCKING above must keep STRING grams (MinHash hashes
            # them; the oracle mirrors those md5 buckets).
            f"array_distinct({_verify_shingle_expr('__norm__', k)}) AS {alias}",
        )

    verified = (
        pruned.join(gram_sets(ln, "id_l", "__gl__"), on="id_l")
        .join(gram_sets(rn, "id_r", "__gr__"), on="id_r")
        .selectExpr(
            "id_l",
            "id_r",
            # tie-proof 4-dp half-up (ops.dedup.round4_ratio rationale):
            # round() diverges cross-engine on exact decimal ties
            "floor((CAST(100000 AS DOUBLE) * size(array_intersect(__gl__, __gr__))"
            " + CAST(5 AS DOUBLE) * size(array_union(__gl__, __gr__)))"
            " / (CAST(10 AS DOUBLE) * size(array_union(__gl__, __gr__))))"
            " / CAST(10000 AS DOUBLE) AS sim",
        )
    )
    return verified.where(F.col("sim") >= threshold)


def containment_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_l, id_r, containment) — pairs where at least ``threshold`` of
    the LEFT row's normalized char-``k``-gram set appears in the RIGHT
    row's: asymmetric near-dup detection (a snippet contained in a
    longer document, quote/boilerplate provenance, benchmark-prompt
    containment) where Jaccard — and therefore MinHash LSH — goes blind
    as the size ratio grows.

    Scale design — PREFIX FILTERING (Chaudhuri et al. 2006 / PPJoin,
    Xiao et al. 2008), a COUNTING recall guarantee, not an LSH S-curve:
    if containment(A in B) ≥ t then B misses at most ⌊(1−t)·|A|⌋ of A's
    grams, so among any ⌊(1−t)·|A|⌋+1 distinct grams of A at least one
    is in B. Each left row therefore emits only that PREFIX of its gram
    set — ordered rarest-first by the right side's gram document
    frequency (order is free for recall; rarest-first minimizes the
    candidate join) — and candidates come from an equi-join of prefix
    grams against the right side's inverted gram index. Exact
    verification (array_intersect over candidate ids only, the
    fuzzy_join shape) computes true containment on the tie-proof 4-dp
    grid. Rare-gram blocking keys make the join naturally skew-free;
    strings never shuffle during blocking.
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")

    # long gram codes THROUGHOUT for k <= 9 (r10): containment's
    # blocking is pure counting — df counts group by gram, and the
    # rarest-first prefix ranks by (df ASC, gram ASC), where the base-128
    # code order equals the byte-lexicographic gram order for equal-k
    # ASCII strings — so the selected prefixes, the candidate pairs, and
    # the verified sizes are all IDENTICAL to the string form (unlike
    # fuzzy_join, nothing here md5-hashes gram values). Longs group,
    # join, and intersect cheaper than UTF8Strings at every step.
    shingle = _verify_shingle_expr

    def prep(df: DataFrame, text: str, idc: str, out_id: str):
        normed = (
            df.where(F.col(text).isNotNull())
            .select(
                F.col(idc).alias(out_id),
                normalize_text(F.col(text)).alias("__norm__"),
            )
            .where(F.length("__norm__") >= k)
        )
        ex = ensure_parallelism(normed).selectExpr(
            out_id,
            f"explode(array_distinct({shingle('__norm__', k)}))"
            " AS __s__",
        )
        return normed, ex

    ln, lex = prep(left, left_on, left_id, "id_l")
    rn, rex = prep(right, right_on, right_id, "id_r")
    rdf = rex.groupBy("__s__").agg(F.count(F.lit(1)).alias("__df__"))
    from pyspark.sql import Window

    w_doc = Window.partitionBy("id_l").orderBy(
        F.asc_nulls_first("__df__"), F.asc("__s__")
    )
    w_cnt = Window.partitionBy("id_l")
    ranked = (
        lex.join(rdf, on="__s__", how="left")
        .select(
            "id_l",
            "__s__",
            F.row_number().over(w_doc).alias("__rn__"),
            F.count(F.lit(1)).over(w_cnt).alias("__m__"),
        )
    )
    # prefix length ⌊(1−t)·m⌋ + 1 in EXACT integer arithmetic: never
    # floor a float product both engines could round differently —
    # with t on the 1e-4 grid, ⌊(1−t)·m⌋ = (10000−t·10⁴)·m DIV 10000
    t4 = int(round(threshold * 10000))
    prefix = (
        ranked.where(
            F.col("__rn__") <= F.expr(f"({10000 - t4}L * __m__) DIV 10000L") + 1
        )
        .select("id_l", "__s__")
        .localCheckpoint(eager=True)
    )
    # candidates = inverted-index probe with the PREFIX side as the
    # broadcast build (r10, guide §3.1/§5.1): the prefix frame is the
    # provably bounded side (≤ ⌊(1−t)·m⌋+1 grams per LEFT row — the
    # snippet/query side of the asymmetric containment), while the
    # right side is the full corpus gram explode. Catalyst's estimate
    # under a Generate undercounts explode fan-out, so the unhinted
    # join BROADCAST THE CORPUS EXPLODE at sf0.1 (driver collects every
    # gram occurrence — an OOM at real scale) and fell to a SortMergeJoin
    # at sf1 that shuffled+sorted the whole explode (~15 s of the 27 s
    # query). Broadcasting the checkpointed prefix (gated on its
    # materialized row count, the _gated_bcast contract) streams the
    # corpus explode map-side: no shuffle, no sort, no driver collect.
    cands = (
        rex.join(_gated_bcast(prefix)(prefix), on="__s__")
        .select("id_l", "id_r")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # no pre-verify size screen — measured net loss, and for containment
    # the min/|A| bound almost never cuts when snippets are contained in
    # longer documents (see _gated_bcast)
    pruned, bcast = cands, _gated_bcast(cands)

    def gram_sets(normed: DataFrame, out_id: str, alias: str):
        # broadcast the candidate-id filter (the dedup_against_fuzzy
        # precedent; gated on the materialized pair count, r9 ADVICE):
        # the checkpointed pair frame is a LogicalRDD with no size
        # estimate, so the plain semi-join planned as a SortMergeJoin
        # that SHUFFLED the whole normalized corpus by id before
        # re-shingling — the ids are bounded by the (already
        # materialized, bounded-by-design) candidate pair frame.
        # Then repartition by the id BEFORE the shingle projection: the
        # broadcast join streams the corpus scan, so its output is NOT
        # hash-partitioned by the id and the downstream verify
        # SortMergeJoin would insert an Exchange ABOVE the projection —
        # shipping the full k-gram ARRAYS (~k x the text bytes; measured
        # 2x containment_join at sf1). Repartitioning first ships only
        # the candidate TEXTS and the arrays are built post-shuffle,
        # already positioned for the verify join.
        only = repartition_for_projection(
            normed.join(bcast(pruned.select(out_id).distinct()), on=out_id),
            out_id,
        )
        return only.selectExpr(
            out_id,
            f"array_distinct({shingle('__norm__', k)}) AS {alias}",
        )

    verified = (
        pruned.join(gram_sets(ln, "id_l", "__gl__"), on="id_l")
        .join(gram_sets(rn, "id_r", "__gr__"), on="id_r")
        .selectExpr(
            "id_l",
            "id_r",
            "floor((CAST(100000 AS DOUBLE)"
            " * size(array_intersect(__gl__, __gr__))"
            " + CAST(5 AS DOUBLE) * size(__gl__))"
            " / (CAST(10 AS DOUBLE) * size(__gl__)))"
            " / CAST(10000 AS DOUBLE) AS containment",
        )
    )
    return verified.where(F.col("containment") >= threshold)


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_dist: int = 2,
    max_len: int = 1000,
) -> DataFrame:
    """(id_l, id_r, edit_distance) — pairs whose Levenshtein distance is
    ≤ ``max_dist``: the record-linkage join for typo-class matching
    (names, titles, SKUs) where gram-Jaccard (:func:`fuzzy_join`) is the
    wrong metric because ORDER and single-character errors matter.

    Scale design — PassJoin segment blocking (Li, Deng, Feng 2011), a
    COUNTING recall guarantee like containment_join's prefix filter, not
    an LSH S-curve: split every left string into ``max_dist + 1``
    contiguous segments (even-split rule); if lev(a, b) ≤ d then some
    segment of ``a`` survives untouched and appears in ``b`` as an EXACT
    substring whose start shifts by at most d (≤ d indels shift any
    position by ≤ d). The right side therefore emits, for each candidate
    left length la ∈ [lb−d, lb+d] and each segment of la's partition
    scheme, only the substrings inside that ±d position window —
    (2d+1)·(d+1)·(2d+1) ≈ 45 short keys per row at d=2, joined equi on
    (la, segment_index, segment_text). Exact ``levenshtein`` verifies
    every distinct candidate (both engines compute it identically —
    integer-exact, no rounding site anywhere).

    Strings longer than ``max_len`` are EXCLUDED (documented contract:
    this is a short-string linkage join; the O(len²) verify and the
    segment scheme both assume bounded keys — route documents through
    fuzzy_join/containment_join instead). NULL strings drop.

    Short-string fallback (ADVICE r5): the segment pigeonhole needs all
    ``d+1`` segments NON-EMPTY — a left string of length ≤ d has empty
    segments, so every non-empty one can be touched by an edit and the
    pair emits no candidate ('ab' vs 'xy' at d=2). Left strings with
    ``len ≤ d`` (including '' — lev('', b) = len(b)) instead join on a
    LENGTH key against right strings of length ≤ 2d (lev ≥ |la−lb|
    bounds the window) — the true candidate space there, trivially
    bounded, and still hash-joinable.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = int(max_dist)
    nseg = d + 1

    def norm(df: DataFrame, text: str, idc: str, out_id: str, out_s: str):
        s = F.col(text)
        return df.where(
            s.isNotNull() & (F.length(s) <= max_len)
        ).select(F.col(idc).alias(out_id), s.alias(out_s))

    ln = norm(left, left_on, left_id, "id_l", "__a__")
    rn = norm(right, right_on, right_id, "id_r", "__b__")
    # left keys: one per segment — (la, i, seg). Even-split rule:
    # len_i = la DIV nseg + (i < la % nseg), p_i = 1-based start.
    # Strings of length ≤ d route through the short-string fallback
    # (empty segments void the pigeonhole there).
    lkeys = ensure_parallelism(
        ln.where(F.length("__a__") > d)
    ).selectExpr(
        "id_l",
        "__a__",
        f"explode(sequence(0, {d})) AS __i__",
    ).selectExpr(
        "id_l",
        "length(__a__) AS __la__",
        "__i__",
        f"substring(__a__, 1 + __i__ * (length(__a__) DIV {nseg})"
        f" + least(__i__, length(__a__) % {nseg}),"
        f" (length(__a__) DIV {nseg})"
        f" + (CASE WHEN __i__ < length(__a__) % {nseg} THEN 1 ELSE 0 END))"
        " AS __seg__",
    ).where(F.col("__seg__") != "")
    # right keys: for each la in [lb-d, lb+d] x segment i x start offset
    # within the ±d window of la's segment-i position
    rkeys = ensure_parallelism(
        rn.where(F.length("__b__") >= 1)
    ).selectExpr(
        "id_r",
        "__b__",
        "length(__b__) AS __lb__",
        # la ≤ d is the short path's job; starting below d+1 would also
        # make the sequence() DESCEND for tiny lb (start > stop) and
        # emit junk keys
        f"explode(sequence(greatest({d + 1}, length(__b__) - {d}),"
        f" length(__b__) + {d})) AS __la__",
    ).selectExpr(
        "id_r",
        "__b__",
        "__lb__",
        "__la__",
        f"explode(sequence(0, {d})) AS __i__",
    ).selectExpr(
        "id_r",
        "__b__",
        "__lb__",
        "__la__",
        "__i__",
        f"(__la__ DIV {nseg})"
        f" + (CASE WHEN __i__ < __la__ % {nseg} THEN 1 ELSE 0 END) AS __len__",
        f"1 + __i__ * (__la__ DIV {nseg}) + least(__i__, __la__ % {nseg})"
        " AS __p__",
    ).where(F.col("__len__") > 0).selectExpr(
        "id_r",
        "__b__",
        "__la__",
        "__i__",
        "__len__",
        f"explode(sequence(greatest(1, __p__ - {d}),"
        f" least(__lb__ - __len__ + 1, __p__ + {d}))) AS __s__",
    ).selectExpr(
        "id_r",
        "__la__",
        "__i__",
        "substring(__b__, __s__, __len__) AS __seg__",
    )
    # short-string fallback: left len ≤ d joins on an exploded LENGTH
    # key (≤ 2d+1 keys/row) against right len ≤ 2d — bounded by
    # construction, and the only sound candidate set when the segment
    # pigeonhole is void
    skeys = ln.where(F.length("__a__") <= d).selectExpr(
        "id_l",
        f"explode(sequence(greatest(0, length(__a__) - {d}),"
        f" length(__a__) + {d})) AS __lb__",
    )
    short_cands = skeys.join(
        rn.select("id_r", F.length("__b__").alias("__lb__")).where(
            F.col("__lb__") <= 2 * d
        ),
        on="__lb__",
    ).select("id_l", "id_r")
    cands = (
        lkeys.join(rkeys, on=["__la__", "__i__", "__seg__"])
        .select("id_l", "id_r")
        .unionAll(short_cands)
        .distinct()
    )
    verified = (
        cands.join(ln, on="id_l")
        .join(rn, on="id_r")
        .select(
            "id_l",
            "id_r",
            F.levenshtein(F.col("__a__"), F.col("__b__")).alias(
                "edit_distance"
            ),
        )
    )
    return verified.where(F.col("edit_distance") <= d)
