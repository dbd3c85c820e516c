"""Similarity search over embedding columns (array<float>).

Net-new beyond the reference. Two paths:

* :func:`ann_brute_force` — exact top-k cosine, the correctness baseline.
  Probes broadcast against the corpus; one narrow pass + a per-probe
  top-k window. Fine up to ~10⁶ corpus × small probe sets.
* :func:`lsh_ann` — the scale path: random-hyperplane LSH buckets both
  sides, the join is on the bucket key, and top-k runs within buckets.
  At 100 TB the bucket join replaces the probes×corpus cross product.

Determinism: hyperplanes derive from md5 (``random_hyperplanes``), so a
DuckDB oracle reproduces bucket assignments exactly; cosine similarities
are rounded to 4 decimals before ranking so cross-engine float noise
cannot reorder the top-k, with vec_id as the total-order tiebreak.
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import fround


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _norm_sql(vec: str) -> str:
    """SQL-string twin of :func:`_norm` — the identical fold op sequence
    (acc starts 0.0, one acc+x² per element left-to-right), so values
    are bit-equal to the Column form and DuckDB's sequential sum."""
    return (
        f"sqrt(aggregate({vec}, 0.0D, (acc, x) -> "
        "acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


# Per-probe candidate count below which the stripe phase is pure tax —
# measured both ways (BENCH_sf10 r9 A/B, ann_topk_salted vs _single):
# at 20k candidates/probe the single window edges the stripes (1.89 vs
# 1.98 s), at 200k the stripes win decisively (17.6 vs 27.2 s — the
# single form leaves one straggler sort task per probe). 64k is the
# geometric midpoint of the measured bracket; the extra exchange +
# 64-stripe window also cost ivf_pq_search +0.6 s at toy scale (the
# r8→r9 regression this gate erases).
_SINGLE_WINDOW_MAX_CANDIDATES = 65_536


def _two_phase_topk(
    scored: DataFrame,
    order_by,
    top: int,
    n_salts: int = 64,
    candidates=None,
) -> DataFrame:
    """Distributed per-probe top-k WITHOUT a one-task-per-probe full
    sort (the r7-verdict scale-killer in the brute ANN paths): phase 1
    ranks within (probe_id, salt) stripes — salt = xxhash64(neighbor_id)
    mod ``n_salts``, deterministic and partitioning-independent — and
    keeps ≤ ``top`` rows per stripe (the order is TOTAL, so every global
    top-k member is inside its own stripe's top-k: a counting recall
    guarantee, not a heuristic); phase 2 re-ranks the ≤ top·n_salts
    survivors per probe in a bounded window. Results are identical to
    the single-window form; the added exchange ships only survivors.

    ``candidates`` (r8-verdict #1, the funnel ``salt_partials="auto"``
    pattern): an upper bound on one probe's candidate rows, known by the
    caller from a bounded count (corpus rows, n_probe × max cell). When
    it proves the per-probe sort bounded (≤
    ``_SINGLE_WINDOW_MAX_CANDIDATES``) the stripe phase is skipped — the
    single partitioned window returns the IDENTICAL result without the
    extra exchange. ``None`` keeps the stripes (the safe default when no
    bound is known). Output: the scored columns + dense int ``rank``
    1..top per probe."""
    w2 = Window.partitionBy("probe_id").orderBy(*order_by)
    if candidates is not None and candidates <= _SINGLE_WINDOW_MAX_CANDIDATES:
        return (
            scored.withColumn("rank", F.row_number().over(w2).cast("int"))
            .where(F.col("rank") <= top)
        )
    w1 = Window.partitionBy("probe_id", "__salt__").orderBy(*order_by)
    return (
        scored.withColumn(
            "__salt__",
            F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(n_salts)),
        )
        .withColumn("__r1__", F.row_number().over(w1))
        .where(F.col("__r1__") <= top)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= top)
        .drop("__salt__", "__r1__")
    )


def _resolve_topk_candidates(two_phase, estimate) -> "int | None":
    """Map a ``two_phase`` caller knob to the ``candidates`` bound:
    ``True`` forces the stripes (None bound), ``False`` forces the single
    window (0 bound), ``"auto"`` calls ``estimate()`` — a bounded count
    the caller pays once (and memoizes where an index object exists)."""
    if two_phase is True:
        return None
    if two_phase is False:
        return 0
    if two_phase != "auto":
        raise ValueError(f"two_phase must be True/False/'auto', got {two_phase!r}")
    return int(estimate())


def ann_brute_force(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    two_phase="auto",
    candidates: "int | None" = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    Returns (probe_id, neighbor_id, cos_sim) with cos_sim rounded to 4
    decimals; ranking is (rounded sim DESC, neighbor_id ASC) for a total
    order. The probe side is broadcast — the corpus never shuffles until
    the per-probe top-k. ``two_phase="auto"`` (one bounded corpus count,
    the funnel compile-job pattern) picks between the salted two-phase
    :func:`_two_phase_topk` — no task ever sorts a whole probe's
    candidate set; at 100× corpus scale the single window was one
    straggler task per probe — and the plain window when the whole
    corpus is a bounded sort (the stripes were a measured +0.6 s tax at
    toy scale, r8 verdict #1). ``True``/``False`` pin either path;
    results are identical by the stripe counting guarantee."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__pvec__")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec__")
    )
    joined = c.crossJoin(F.broadcast(p)).where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    sim = fround(cosine(F.col("__pvec__"), F.col("__cvec__")), 4)
    scored = joined.select("probe_id", "neighbor_id", sim.alias("cos_sim"))
    return _two_phase_topk(
        scored,
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
        candidates=_resolve_topk_candidates(
            two_phase,
            (lambda: candidates) if candidates is not None else corpus.count,
        ),
    ).select("probe_id", "neighbor_id", "cos_sim", "rank")


def rp_signs(dim: int, d_out: int) -> List[List[int]]:
    """Deterministic ±1 sign matrix for :func:`random_projection`,
    derived from md5 so any engine reproduces it exactly:
    ``s[k][j] = +1 if int(md5(f"rp:{k}:{j}")[:6], 16) % 2 == 0 else -1``
    (the random_hyperplanes recipe). Achlioptas (2003): ±1 entries
    satisfy the Johnson-Lindenstrauss lemma like Gaussian ones."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp:{k}:{j}".encode()).hexdigest()[:6], 16) % 2
            == 0
            else -1
            for j in range(dim)
        ]
        for k in range(d_out)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str,
    dim: int,
    d_out: int = 8,
    keep=None,
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection of an embedding
    column to ``d_out`` dimensions: ``rp_k = (Σ_j s_kj·v_j)/√d_out``
    with the deterministic ±1 matrix from :func:`rp_signs` — the cheap
    dimensionality-reduction front end for ANN prefiltering and drift
    monitors when the raw dimension is large (distances are preserved
    within (1±ε) at d_out = O(ln n/ε²); Achlioptas 2003 ±1 variant).
    Output: ``keep`` columns (default: everything except ``vec_col``)
    + flat ``rp_0..rp_{d_out−1}`` DOUBLE columns, each snapped to the
    1e-6 grid.

    Scale: one narrow codegen'd projection — d_out·dim multiply-free
    adds/subtracts per row (signs are ±1: pure add/sub chains), no
    shuffle, no UDF. Exactness: fixed left-to-right sums of the raw
    doubles, one divide by the correctly-rounded √d_out, tie-proof
    fround — the oracle replays the identical chain."""
    import math

    signs = rp_signs(dim, d_out)
    keep = (
        [c for c in df.columns if c != vec_col]
        if keep is None
        else ([keep] if isinstance(keep, str) else list(keep))
    )
    root = repr(math.sqrt(float(d_out)))
    items = []
    for k, row in enumerate(signs):
        terms = " + ".join(
            (
                f"{'' if s > 0 else '-'}"
                f"CAST(try_element_at(`{vec_col}`, {j + 1}) AS DOUBLE)"
            )
            for j, s in enumerate(row)
        ).replace("+ -", "- ")
        items.append(
            f"floor((({terms}) / {root}D) * 1e6 + 5e-1) / 1e6 AS rp_{k}"
        )
    return df.selectExpr(*[f"`{c}`" for c in keep], *items)


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    k: int = 5,
    two_phase="auto",
    candidates: "int | None" = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-``k`` most-similar corpus items with a DIFFERENT
    label — the highest-loss negatives (the "hard" in hard-negative
    sampling; random negatives are :func:`~hashquery_spark.ops.sampling.
    negative_sample`). Output: ``(probe_id, neighbor_id, cos_sim,
    rank)``, ranked (4-dp sim DESC, neighbor id ASC) — the
    ann_brute_force contract plus the label exclusion.

    Scale: identical to :func:`ann_brute_force` (broadcast anchors,
    corpus never shuffles, adaptive two-phase top-k); the label filter
    prunes candidates BEFORE the rank stage."""
    p = anchors.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__pvec__"),
        F.col(label_col).alias("__plab__"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec__"),
        F.col(label_col).alias("__clab__"),
    )
    joined = c.crossJoin(F.broadcast(p)).where(
        (F.col("neighbor_id") != F.col("probe_id"))
        & (
            ~F.col("__clab__").eqNullSafe(F.col("__plab__"))
        )
    )
    sim = fround(cosine(F.col("__pvec__"), F.col("__cvec__")), 4)
    scored = joined.select("probe_id", "neighbor_id", sim.alias("cos_sim"))
    return _two_phase_topk(
        scored,
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
        candidates=_resolve_topk_candidates(two_phase, corpus.count),
    ).select("probe_id", "neighbor_id", "cos_sim", "rank")


def random_hyperplanes(dim: int, n_planes: int) -> List[List[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 so any
    engine (Spark, DuckDB, numpy) reproduces them exactly:
    plane[p][d] = int(md5(f"{p}:{d}")[:6], 16) / 0xFFFFFF - 0.5."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:6]
            row.append(int(h, 16) / 0xFFFFFF - 0.5)
        planes.append(row)
    return planes


def hyperplane_bucket(vec: Column, planes: List[List[float]]) -> Column:
    """LSH bucket id: bit p set iff dot(vec, plane_p) > 0.

    Plane vectors inline as SINGLE array literals (F.lit(list)) — one
    Literal node each instead of dim separate ones, keeping the analyzed
    expression tree small."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = F.lit([float(v) for v in plane])
        bit = F.when(_dot(vec, plane_col) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("long")


class IvfIndex:
    """A built IVF index: driver-held centroids + the cell-assigned corpus.

    Build once with :func:`ivf_index`, search many probe batches with
    :func:`ivf_search` — the centroid collect and the corpus assignment
    pass are paid once (and the assignment can be persisted), which is how
    IVF is actually operated: index build is offline, searches are cheap."""

    def __init__(self, cents, cent_norms, assigned: DataFrame, id_col: str, vec_col: str):
        self.cents = cents
        self.cent_norms = cent_norms
        self.assigned = assigned
        self.id_col = id_col
        self.vec_col = vec_col
        self._flat = None
        self._pq: dict = {}
        self._cell_stats = None

    @property
    def dim(self) -> int:
        return len(self.cents[0][1]) if self.cents else 0

    def flat_cols_sql(self, vec: str, prefix: str) -> list:
        """SQL select items extracting the vector into scalar DOUBLE
        columns ``{prefix}{i}`` — the codegen trick: every similarity
        below then runs as flat multiply-adds inside whole-stage codegen
        instead of interpreted aggregate()/zip_with() folds (measured
        ~19 µs/pair interpreted vs ns flat on the semantic_dedup pair
        loop)."""
        return [
            f"CAST(try_element_at(`{vec}`, {i + 1}) AS DOUBLE) AS `{prefix}{i}`"
            for i in range(self.dim)
        ]

    def norm_sql(self, prefix: str) -> str:
        """|v| from the flat columns — same left-to-right sum order as the
        HOF fold and DuckDB's list_dot_product, so values are bit-equal."""
        terms = " + ".join(
            f"`{prefix}{i}` * `{prefix}{i}`" for i in range(self.dim)
        )
        return f"sqrt({terms or '0.0D'})"

    def sim_structs_sql(self, vec: str, vnorm: str) -> str:
        # (-rounded_sim, cid) structs: natural struct ordering makes min =
        # argmax-sim with lowest-cid tiebreak. Each dot appears exactly
        # ONCE in the expression tree — a greatest()+CASE formulation
        # duplicates every cosine ~n_centroids times (measured 5× slower).
        # Rendered as ONE SQL string parsed by a single F.expr call: the
        # Column-by-Column build paid one py4j round-trip per literal float
        # (n_centroids × dim × 2 sides ≈ thousands) — ~1 s of driver time
        # per call, measured. The parsed tree is identical.
        #
        # Deliberately HOF (interpreted) rather than flat columns: the
        # argmax runs ONCE per row, and a flat formulation inlined through
        # CollapseProject grows the generated method past Janino's 64 KB
        # limit at n_centroids >= ~16 (measured: codegen abort + OOM from
        # repeated giant compiles). Flat multiply-adds are reserved for
        # the per-PAIR dot products behind a materialization barrier
        # (semantic_dedup / ivf_search candidate scoring).
        structs = []
        for cid, cvec in self.cents:
            arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
            dot = (
                f"aggregate(zip_with(`{vec}`, {arr}, (x, y) -> "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
            )
            structs.append(
                f"named_struct('neg', -(floor(({dot} / (`{vnorm}` * "
                f"{self.cent_norms[cid]!r}D)) * 1e4 + 5e-1) / 1e4), "
                f"'cid', CAST({cid} AS BIGINT))"
            )
        return "array(" + ",".join(structs) + ")"

    def flat_assigned(self) -> DataFrame:
        """The corpus assignment FLATTENED to scalar vector columns — the
        form every search consumes. Built once per index and persisted
        when the assignment is (serving caches the search-ready layout,
        not the array form): without this, repeat probe batches re-ran
        the flatten projection per call."""
        if self._flat is None:
            flat = self.assigned.selectExpr(
                "__cell__",
                "neighbor_id",
                "__vnorm__",
                *self.flat_cols_sql("__cvec__", "__ca"),
            )
            if self.assigned.is_cached:
                flat = flat.persist()
            self._flat = flat
        return self._flat

    def build_pq(self, m: int = 4, k: int = 16, kmeans_iters: int = 0):
        """The PQ payload over the assigned corpus, memoized per
        ``(m, k, kmeans_iters)``: ``(books, dim, dsub, coded)`` where
        ``coded`` is the (neighbor_id, __cell__, code_0..code_{m-1})
        frame every IVF-ADC search scans. The codebook collect (and
        optional Lloyd's training) is paid ONCE per key — repeat
        :func:`ivf_pq_search` calls against the same index launch zero
        further build jobs (the ann_ivf memoization contract), and
        :meth:`write` persists the payload so later sessions skip the
        build entirely."""
        key = (int(m), int(k), int(kmeans_iters))
        if key not in self._pq:
            src = self.assigned.where(F.col("__cvec__").isNotNull())
            view = src.select(
                F.col("neighbor_id").alias("__pqid__"),
                F.col("__cvec__").alias("__pqv__"),
            )
            books, dim, dsub = (
                _pq_codebooks_trained(
                    view, "__pqv__", "__pqid__", m, k, kmeans_iters
                )
                if kmeans_iters
                else _pq_codebooks(view, "__pqv__", "__pqid__", m, k)
            )
            self._pq[key] = (books, dim, dsub, _pq_code_frame(src, books, dsub))
        return self._pq[key]

    def cell_stats(self):
        """``(n_rows, max_cell_rows)`` over the assignment — ONE bounded
        agg job (≤ n_centroids output rows), memoized so repeat searches
        against the same index launch zero further driver work (the
        ann_ivf memoization contract). Feeds the adaptive top-k gate:
        one probe's candidate bound is ``n_probe × max_cell_rows``."""
        if self._cell_stats is None:
            rows = (
                self.assigned.groupBy("__cell__").count().collect()
            )
            counts = [int(r["count"]) for r in rows]
            self._cell_stats = (sum(counts), max(counts, default=0))
        return self._cell_stats

    def unpersist(self):
        if self._flat is not None and self._flat.is_cached:
            self._flat.unpersist()
        self.assigned.unpersist()

    def write(self, path: str) -> None:
        """Persist the index so later SESSIONS amortize the build (the
        r1 soft spot: the centroid collect + assignment pass were paid
        per fresh index; the in-session memoization only amortized within
        one session). Layout:

        * ``{path}/assigned`` — the cell-assigned corpus, parquet
          PARTITIONED BY ``__cell__`` (per-cell files: a static cell
          filter prunes partitions, and per-cell row groups keep the
          search equi-join's input co-located).
        * ``{path}/centroids`` — n_centroids rows (cid, cvec) plus the
          id/vec column names as constant metadata columns. Tiny by
          construction — loading it is the ONLY driver job a
          :func:`load_ivf_index` pays.
        """
        spark = self.assigned.sparkSession
        self.assigned.write.mode("overwrite").partitionBy("__cell__").parquet(
            path + "/assigned"
        )
        cent_rows = [
            (int(cid), [float(x) for x in vec], self.id_col, self.vec_col)
            for cid, vec in self.cents
        ]
        spark.createDataFrame(
            cent_rows,
            "cid long, cvec array<double>, id_col string, vec_col string",
        ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
        # PQ payloads (r7 verdict #4): one flat books table (bounded —
        # Σ m·k rows per built config) + per-config code frames, so
        # ivf_pq_search over a loaded index pays zero retrain/re-encode
        # jobs. Codes partition by __cell__ exactly like the assignment.
        if self._pq:
            book_rows = []
            for (m, k, it), (books, _dim, _dsub, _coded) in self._pq.items():
                for s in range(m):
                    for code, cv in books[s]:
                        book_rows.append(
                            (m, k, it, s, int(code), [float(x) for x in cv])
                        )
            spark.createDataFrame(
                book_rows,
                "m int, k int, iters int, s int, code int, cv array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(path + "/pq_books")
            for (m, k, it), (_b, _d, _ds, coded) in self._pq.items():
                coded.write.mode("overwrite").partitionBy("__cell__").parquet(
                    f"{path}/pq_codes_m{m}k{k}i{it}"
                )


def load_ivf_index(spark, path: str) -> "IvfIndex":
    """Load an :meth:`IvfIndex.write` directory. The centroid file read
    (bounded: n_centroids rows) is the only driver job; the assigned
    corpus is a lazy parquet scan — searches against the loaded index
    launch no further driver work beyond their own execution."""
    import math

    cent_rows = spark.read.parquet(path + "/centroids").collect()
    if not cent_rows:
        raise ValueError(f"no centroids found under {path}/centroids")
    cents = sorted(
        (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows
    )
    id_col, vec_col = cent_rows[0]["id_col"], cent_rows[0]["vec_col"]
    cent_norms = {
        cid: math.sqrt(sum(x * x for x in vec)) for cid, vec in cents
    }
    assigned = spark.read.parquet(path + "/assigned").withColumn(
        # partition-directory inference types __cell__ as INT; the
        # in-memory build keeps it BIGINT — normalize so plans match
        "__cell__",
        F.col("__cell__").cast("long"),
    )
    index = IvfIndex(cents, cent_norms, assigned, id_col, vec_col)
    # PQ payloads, if the index was written with any built: the books
    # read is one more bounded driver job; the code frames are lazy
    # parquet scans — ivf_pq_search against the loaded index launches
    # no retrain/re-encode work. Only a genuinely ABSENT payload means
    # "no PQ built" (r8 ADVICE: a bare except here silently loaded a
    # PQ-less index on corrupt/permission-failed payloads, defeating
    # the zero-build serving contract — real read failures now raise).
    from pyspark.errors import AnalysisException

    try:
        book_rows = spark.read.parquet(path + "/pq_books").collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        book_rows = []
    cfgs: dict = {}
    for r in book_rows:
        cfgs.setdefault((r["m"], r["k"], r["iters"]), {}).setdefault(
            r["s"], []
        ).append((int(r["code"]), [float(x) for x in r["cv"]]))
    for (m, k, it), by_s in cfgs.items():
        books = [sorted(by_s[s]) for s in range(m)]
        dsub = len(books[0][0][1])
        coded = spark.read.parquet(
            f"{path}/pq_codes_m{m}k{k}i{it}"
        ).withColumn("__cell__", F.col("__cell__").cast("long"))
        index._pq[(m, k, it)] = (books, m * dsub, dsub, coded)
    return index


def auto_cluster_count(
    corpus: DataFrame, k_min: int = 8, k_max: int = 512
) -> int:
    """k = clamp(ceil(sqrt(n)), k_min, k_max) from ONE bounded count job
    (the bradley_terry guard contract) — the SemDeDup/FAISS k ∝ √n
    recipe. √n balances the two cost terms of cluster blocking:
    centroid assignment is Θ(k·n) and in-cell pair work is Θ(n²/k), so
    k = √n makes the total Θ(n^1.5) — a FIXED k leaves the pair term
    quadratic (the r5 BENCH_sf1 measured semantic_dedup superlinear at
    fixed k=16). ``k_max`` bounds the driver-held centroid literals and
    the codegen'd argmin width (flat assignment measured healthy through
    k=512 / dim=64); past n = k_max² the paper's regime (100k clusters
    over 5B embeddings) needs hierarchical assignment, out of scope
    here."""
    import math

    n = corpus.count()
    return max(k_min, min(k_max, int(math.ceil(math.sqrt(max(n, 1))))))


def ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids=None,
    cache: bool = False,
    kmeans_iters: int = 0,
) -> IvfIndex:
    """Build the IVF index: pick centroids, assign every corpus vector to
    its nearest cell.

    ``n_centroids=None`` auto-scales k with the corpus via
    :func:`auto_cluster_count` (k = clamp(⌈√n⌉, 8, 512) — one bounded
    count job); a FIXED k keeps per-cell population growing linearly
    with the corpus, which turns every in-cell consumer quadratic (the
    r5 BENCH_sf1 semantic_dedup finding). Explicit k stays available for
    oracle-deterministic entries.

    Centroids default to the deterministic first ``n_centroids`` corpus
    vectors; ``kmeans_iters > 0`` instead trains them with distributed
    Lloyd's k-means (ops/clustering.kmeans_fit) — ``kmeans_iters`` extra
    scans at build time buy better-balanced cells, i.e. fewer vectors
    touched per probe at the same recall (the FAISS IVF recipe). The centroid set is collected to the driver
    (bounded: n_centroids × dim floats, same role as a broadcast) and
    inlined as literals, so cell assignment is a narrow codegen'd pass
    with NO join. ``cache=True`` persists the assigned corpus for repeated
    searches.

    Assignment is the INTERPRETED HOF-fold argmin (one
    array_min-over-struct pass per row), deliberately: at auto-k scale
    every flat codegen formulation blows Janino's 64 KB method limit and
    Spark silently falls back to interpreted for the whole stage anyway
    (measured r6 at k=142). The real throughput levers are
    ensure_parallelism before the fold (a one-file corpus otherwise runs
    it on ~2 partitions) and the lazy localCheckpoint of the assigned
    frame (search plans must not carry the argmin lineage — Catalyst
    optimizer blow-up at any k). Sum order is the same left-to-right
    chain as DuckDB's list_dot_product, so assignments stay
    bit-identical.

    Determinism: centroid similarities round to 4 decimals with
    lowest-centroid-id tiebreak, so a DuckDB oracle reproduces cell
    assignments exactly."""
    import math

    if n_centroids is None:
        n_centroids = auto_cluster_count(corpus)
    if kmeans_iters > 0:
        from .clustering import kmeans_fit

        cents, _ = kmeans_fit(
            corpus, vec_col, id_col, k=n_centroids, iters=kmeans_iters
        )
        cents = sorted(cents)
    else:
        cents = sorted(
            (r[0], [float(x) for x in r[1]])
            for r in corpus.where(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
    # centroid norms precomputed in Python: Spark's higher-order folds are
    # interpreted (not codegen'd), so recomputing |c| and |v| inside every
    # centroid cosine tripled the per-row fold count (measured 2.5× slower)
    cent_norms = {cid: math.sqrt(sum(x * x for x in cvec)) for cid, cvec in cents}
    index = IvfIndex(cents, cent_norms, None, id_col, vec_col)
    from .dedup import ensure_parallelism

    # HOF (interpreted) argmin, deliberately: at auto-k scale any flat
    # codegen formulation — single k-wide array_min OR ≤16-centroid
    # chunks split by Generate barriers — exceeds Janino's 64 KB method
    # limit (the whole-stage consume() cannot split one projection's
    # k×dim multiply-adds) and Spark SILENTLY falls back to interpreted
    # for the WHOLE stage anyway, after seconds of failed compiles per
    # run (measured r6 at k=142). The fold costs ~12.5 µs/centroid/row
    # interpreted and runs once per row — bounded, never-compiling,
    # and the real fixes are (a) ensure_parallelism below (a one-file
    # parquet corpus ran the fold on TWO partitions: 26 s instead of
    # ~1.5 s) and (b) the lazy checkpoint (search plans must not carry
    # the argmin lineage — Catalyst optimizer OOM, any k).
    assigned = (
        ensure_parallelism(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("__cvec__"),
                _norm(F.col(vec_col)).alias("__vnorm__"),
            )
        )
        .select(
            "neighbor_id",
            "__cvec__",
            "__vnorm__",
            F.expr(
                f"array_min({index.sim_structs_sql('__cvec__', '__vnorm__')}).cid"
            ).alias("__cell__"),
        )
        # LAZY lineage truncation: an index is a BUILT artifact — search
        # plans must not carry the k×dim argmin tree (a window+join
        # stack above the flat argmin lineage sent Catalyst into an
        # optimizer blow-up/OOM at ANY k, measured r6; the checkpoint
        # also stops per-consumer re-derivation, the semantic_dedup
        # lesson). eager=False: no job at build time — materializes on
        # the first search, exactly when the old form would have
        # computed it anyway.
        .localCheckpoint(eager=False)
    )
    if cache:
        assigned = assigned.persist()
    index.assigned = assigned
    return index


def ivf_search(
    index: IvfIndex,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Search an :class:`IvfIndex`: each probe visits only its ``n_probe``
    nearest cells — the probe→corpus match is an equi-join on the cell id,
    so at 100 TB each probe touches n_probe/n_centroids of the data
    instead of all of it."""
    dim = index.dim
    p = (
        probes.select(
            F.col(index.id_col).alias("probe_id"),
            F.col(index.vec_col).alias("__pvec__"),
            _norm(F.col(index.vec_col)).alias("__pn__"),
        )
        .select(
            "probe_id",
            "__pvec__",
            "__pn__",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort("
                    f"{index.sim_structs_sql('__pvec__', '__pn__')}), 1, {n_probe}), "
                    "s -> s.cid)"
                )
            ).alias("__cell__"),
        )
        # probe flats derived ABOVE the Generate (explode) — the Generate
        # is a CollapseProject barrier, so the cell-selection structs
        # never inline into these and the generated method stays bounded
        .selectExpr(
            "probe_id",
            "__pn__",
            "__cell__",
            *index.flat_cols_sql("__pvec__", "__pb"),
        )
    )
    # corpus side flattened above the assignment projection; the per-pair
    # dot below is then flat multiply-adds in codegen (the measured ~15x
    # over an aggregate() fold per candidate)
    c = index.flat_assigned()
    joined = c.join(F.broadcast(p), on="__cell__").where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    dot_sql = " + ".join(f"__ca{i} * __pb{i}" for i in range(dim)) or "0.0D"
    sim = F.expr(f"floor((({dot_sql}) / (__vnorm__ * __pn__)) * 1e4 + 5e-1) / 1e4")
    scored = joined.select("probe_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_ann(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids=None,
    n_probe: int = 2,
) -> DataFrame:
    """One-shot IVF ANN: :func:`ivf_index` + :func:`ivf_search`. For
    repeated probe batches build the index once with ``cache=True``.
    ``n_centroids=None`` auto-scales (⌈√n⌉, the FAISS nlist recipe)."""
    return ivf_search(
        ivf_index(corpus, vec_col, id_col, n_centroids), probes, k, n_probe
    )


def _pq_code_frame(assigned_nn: DataFrame, books, dsub: int) -> DataFrame:
    """PQ codes in one pass over a (NULL-filtered) cell assignment: the
    m argmins evaluate once inside a struct behind the Generate barrier
    (the pq_encode contract). NULL corpus vectors must already be
    filtered — NULL codes would give NULL adc_dist, and an ascending
    rank is NULLS FIRST."""
    m = len(books)
    payload = []
    for s in range(m):
        sub = f"slice(__v__, {s * dsub + 1}, {dsub})"
        payload.append(f"'m{s}', {_pq_sub_argmin_sql(sub, books[s])}")
    barrier = "named_struct(" + ", ".join(payload) + ")"
    return (
        assigned_nn.selectExpr(
            "neighbor_id",
            "__cell__",
            "transform(__cvec__, x -> CAST(x AS DOUBLE)) AS __v__",
        )
        .select(
            "neighbor_id",
            "__cell__",
            F.explode(F.array(F.expr(barrier))).alias("__pq__"),
        )
        .selectExpr(
            "neighbor_id",
            "__cell__",
            *[f"__pq__.m{s}.code AS code_{s}" for s in range(m)],
        )
    )


def ivf_pq_search(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k: int = 16,
    top: int = 10,
    index: "IvfIndex" = None,
    kmeans_iters: int = 0,
    two_phase="auto",
) -> DataFrame:
    """IVF-ADC — the full FAISS ``IVFx,PQy`` search shape and the design
    that actually fits 100 TB of embeddings: IVF cells prune the
    candidate set to ``n_probe/n_centroids`` of the corpus (equi-join on
    the cell id), and every surviving candidate is scored from its
    ``m``-byte PQ code with ``m`` array lookups against the probe's
    precomputed LUT — the scan touches CODES (bytes/vector), never the
    raw float vectors. Output: ``(probe_id, neighbor_id, adc_dist,
    rank)``, rank 1..top per probe by ascending approximate squared L2
    (ties to the lowest neighbor id).

    Composition, all established pieces: :func:`ivf_index` cell
    assignment (4-dp cosine argmax, lowest-cid tiebreak), PQ codes
    computed in one barrier pass ON the index's checkpointed assignment
    (no join back), :func:`_pq_lut_exprs` probe LUTs built after the
    cell explode (n_probe rows per probe — bounded re-evaluation). The
    oracle reproduces cells, codes, LUT distances, and ranks
    bit-for-bit.

    Recall knobs: ``n_probe`` trades scan fraction for cell recall;
    ``m``/``k`` trade code size for quantization error;
    ``kmeans_iters`` trains the per-subspace codebooks
    (:func:`_pq_codebooks_trained`). The exact re-rank of the ADC top
    candidates against raw vectors (the standard two-stage serving
    refinement) is :func:`ann_brute_force` on the returned id set.

    Serving: pass ``index=`` (a built/loaded :class:`IvfIndex`) to skip
    the build — the PQ payload is memoized per (m, k, kmeans_iters) on
    the index (:meth:`IvfIndex.build_pq`) and persists with
    :meth:`IvfIndex.write`, so repeat searches (and searches in later
    sessions against :func:`load_ivf_index`) pay zero retrain/re-encode
    jobs."""
    if index is None:
        index = ivf_index(corpus, vec_col, id_col, n_centroids=n_centroids)
    books, dim, dsub, coded = index.build_pq(m, k, kmeans_iters)

    # probe side: n_probe nearest cells (the ivf_search slice), then the
    # ADC LUTs derived above the Generate — bounded n_probe-fold
    # re-evaluation on a tiny frame
    p = (
        probes.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("__pvec__"),
            _norm(F.col(vec_col)).alias("__pn__"),
        )
        .select(
            "probe_id",
            "__pvec__",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort("
                    f"{index.sim_structs_sql('__pvec__', '__pn__')}), 1, {n_probe}), "
                    "s -> s.cid)"
                )
            ).alias("__cell__"),
        )
        .selectExpr(
            "probe_id",
            "__cell__",
            *_pq_lut_exprs("__pvec__", books, dsub),
        )
    )

    joined = coded.join(F.broadcast(p), on="__cell__").where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    adc = " + ".join(
        f"try_element_at(__lut{s}__, code_{s} + 1)" for s in range(m)
    )
    scored = joined.selectExpr("probe_id", "neighbor_id", f"{adc} AS adc_dist")
    # adaptive top-k (r8 verdict #1): at 100× corpus scale a probed cell
    # is still corpus/n_centroids rows → salted stripes; at bounded cell
    # sizes (n_probe × max_cell from the memoized index stats — first
    # search pays ONE bounded agg, repeats zero) the plain window wins
    return _two_phase_topk(
        scored,
        [F.col("adc_dist").asc(), F.col("neighbor_id").asc()],
        top,
        candidates=_resolve_topk_candidates(
            two_phase, lambda: n_probe * index.cell_stats()[1]
        ),
    ).select("probe_id", "neighbor_id", "adc_dist", "rank")


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters=None,
    threshold: float = 0.7,
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then drop any vector whose cell contains a
    LOWER-id vector within ``threshold`` cosine. Returns the KEPT rows as
    ``(id, cell)``.

    Scale design: clustering bounds the candidate comparison to
    within-cell pairs — O(Σ|cell|²) instead of O(n²); the paper's recipe
    is k ∝ √n so cells stay small (their 100k clusters over 5B
    embeddings). ``n_clusters=None`` (default) APPLIES that recipe:
    k = clamp(⌈√n⌉, 8, 512) from one bounded count
    (:func:`auto_cluster_count`) — a fixed k left the pair term
    quadratic (measured superlinear in the r5 BENCH_sf1). Cell
    assignment is a narrow codegen'd pass against centroid literals (no
    join, see :func:`ivf_index`); the in-cell self-join shuffles on the
    cell key only.

    Determinism / oracle: ``kmeans_iters=0`` (default) uses the first-k
    centroids so a DuckDB oracle can reproduce assignments exactly
    (4-dp-rounded similarities, lowest-centroid-id tiebreak); the
    drop rule (any similar lower-id predecessor in the cell) is a plain
    NOT EXISTS. ``kmeans_iters>0`` trains Lloyd's centroids for better-
    balanced cells (rows-only checkable)."""
    index = ivf_index(
        corpus, vec_col, id_col, n_centroids=n_clusters, kmeans_iters=kmeans_iters
    )
    # norms come from the assignment pass (computed once per vector) —
    # the pair loop below must never re-fold |v| per candidate
    a = index.assigned.select(
        F.col("neighbor_id").alias("__id__"),
        F.col("__cvec__"),
        F.col("__cell__"),
        F.col("__vnorm__").alias("__nrm__"),
    )
    # three consumers (left, right, keeper anti-join) with different
    # column pruning = three structurally different subtrees — the
    # centroid assignment would run 3x (no ReusedExchange; the
    # dedup_against_fuzzy lesson). Materialize it once.
    a = a.localCheckpoint(eager=False)
    # The in-cell pair loop is the hot path: an aggregate()-HOF dot
    # product is INTERPRETED (~19 µs/pair measured) — flatten the vector
    # into scalar columns once per side so the 64-term multiply-add runs
    # inside whole-stage codegen. Same left-to-right sum order as the HOF
    # fold and DuckDB's list_dot_product, so values are bit-identical.
    dim = len(index.cents[0][1]) if index.cents else 0
    left = a.selectExpr(
        "__cell__",
        "__id__ AS id_a",
        "__nrm__ AS __na__",
        *[
            f"CAST(try_element_at(__cvec__, {i + 1}) AS DOUBLE) AS __a{i}__"
            for i in range(dim)
        ],
    )
    right = a.selectExpr(
        "__cell__",
        "__id__ AS id_b",
        "__nrm__ AS __nb__",
        *[
            f"CAST(try_element_at(__cvec__, {i + 1}) AS DOUBLE) AS __b{i}__"
            for i in range(dim)
        ],
    )
    dot_sql = " + ".join(f"__a{i}__ * __b{i}__" for i in range(dim)) or "0.0D"
    sim = F.expr(f"floor((({dot_sql}) / (__na__ * __nb__)) * 1e4 + 5e-1) / 1e4")
    dropped = (
        left.join(right, on="__cell__")
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim >= threshold)
        .select(F.col("id_b").alias("__drop__"))
        .distinct()
    )
    kept = a.join(
        dropped, a["__id__"] == dropped["__drop__"], "left_anti"
    )
    return kept.select(
        F.col("__id__").alias(id_col), F.col("__cell__").alias("cell")
    )


def auto_plane_count(
    n: int, target_bucket: int = 256, p_min: int = 4, p_max: int = 24
) -> int:
    """planes = clamp(⌈log2(n / target_bucket)⌉, 4, 24): hold the
    EXPECTED bucket population constant as the corpus grows, so the
    within-bucket pair work stays Θ(n · target_bucket) — linear — where
    a FIXED plane count leaves it quadratic (the r5 fixed-k hazard,
    sign-LSH edition). The cost is recall: each extra plane multiplies
    per-pair recall by P[same sign] (≈0.9 at cosine 0.95), the
    documented sign-LSH trade — verify-after-block keeps precision
    exact regardless."""
    import math

    return max(p_min, min(p_max, int(math.ceil(math.log2(max(n, 1) / target_bucket))) if n > target_bucket else p_min))


def embedding_near_dup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes=None,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim >= t).

    Scale path: self-join restricted to hyperplane-LSH buckets — near-dups
    (cosine ~1) almost surely share all hyperplane signs, so the bucket
    equi-join replaces the O(n²) cross product; cosine verifies exactly
    within buckets (bucket-then-verify, like MinHash→Jaccard).

    ``n_planes=None`` (default) auto-scales the plane count with the
    corpus (:func:`auto_plane_count` — one bounded count job) so bucket
    population, and with it the quadratic in-bucket term, stays flat;
    pass an explicit count for oracle-deterministic plans."""
    if n_planes is None:
        n_planes = auto_plane_count(corpus.count())
    planes = random_hyperplanes(dim, n_planes)
    b = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__v__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
    )
    left = b.select(
        F.col("__bucket__"), F.col(id_col).alias("id_a"), F.col("__v__").alias("__va__")
    )
    right = b.select(
        F.col("__bucket__"), F.col(id_col).alias("id_b"), F.col("__v__").alias("__vb__")
    )
    joined = left.join(right, on="__bucket__").where(F.col("id_a") < F.col("id_b"))
    sim = fround(cosine(F.col("__va__"), F.col("__vb__")), 4)
    return (
        joined.select("id_a", "id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_ann(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes=None,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k cosine: candidates restricted to the probe's
    hyperplane-LSH bucket, then exact cosine within the bucket.

    Scale: the probes×corpus cross join becomes an equi-join on the
    bucket key; 2^n_planes buckets shard the corpus. Recall is tunable by
    n_planes (fewer planes → bigger buckets → higher recall, more work).
    ``n_planes=None`` auto-scales with the corpus count
    (:func:`auto_plane_count` — flat bucket population)."""
    if n_planes is None:
        n_planes = auto_plane_count(corpus.count())
    planes = random_hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__pvec__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
    )
    joined = c.join(F.broadcast(p), on="__bucket__").where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    sim = fround(cosine(F.col("__pvec__"), F.col("__cvec__")), 4)
    scored = joined.select("probe_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes=None,
    dim: int = 64,
) -> DataFrame:
    """(id_l, id_r, cos_sim) — cross-corpus embedding-cosine matches
    (cos_sim >= threshold): semantic record linkage / cross-snapshot
    semantic dedup, the embedding twin of :func:`fuzzy.fuzzy_join`.

    Scale path mirrors :func:`embedding_near_dup`, but ACROSS two
    corpora: both sides bucket by the same hyperplane-LSH signs (seeded
    planes — identical on both sides and in the oracle), the pair join is
    the bucket equi-join (never the |L|x|R| cross product), and exact
    cosine verifies within buckets. Recall caveat inherited from the
    sign-LSH: pairs near the threshold can land in different buckets;
    raise n_planes' recall by lowering n_planes, or verify with
    ann_brute_force on a sampled slice. ``n_planes=None`` auto-scales
    with the larger side's count (:func:`auto_plane_count` — bucket
    population flat, pair work linear; two bounded count jobs)."""
    if n_planes is None:
        n_planes = auto_plane_count(max(left.count(), right.count()))
    planes = random_hyperplanes(dim, n_planes)

    def side(df: DataFrame, idc: str, out_id: str, out_v: str) -> DataFrame:
        return df.select(
            hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(out_v),
        )

    joined = side(left, left_id, "id_l", "__vl__").join(
        side(right, right_id, "id_r", "__vr__"), on="__bucket__"
    )
    sim = fround(cosine(F.col("__vl__"), F.col("__vr__")), 4)
    return (
        joined.select("id_l", "id_r", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_quantize(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization of an embedding
    column — the storage/serving compression step (q_i =
    round(v_i·127/amax), dequant x̂ = q·scale) — plus the reconstruction
    error. Output: ``(id, n_dims, q (array<int>), scale, q_sum, q_l1,
    mse)`` where ``scale = amax/127`` and ``mse`` is the mean squared
    dequantization error.

    Cross-engine exactness: q_i is ``floor(x·127/amax + 0.5)`` — pure
    IEEE ops both engines perform bit-identically; per-element squared
    errors land on an integer picounit grid (``floor(e²·1e12 + 0.5)``)
    and sum as BIGINTs, so ``mse = m_sum/(dim·1e12)`` is an exact
    rational with no rounding site. Assumes |v| ≲ 1e3 (picounit grid
    headroom); zero vectors quantize to all-zero with scale 0.

    Scale/codegen: one scan, zero shuffles — amax is hoisted to its own
    projection (evaluated once), all three integer accumulators come out
    of ONE aggregate() fold computed behind a Generate barrier (explode
    of a 1-element array), so CollapseProject cannot inline the fold
    once per extracted field (the measured semantic_dedup lesson).
    """
    qd = (
        "greatest(CAST(-127.0 AS DOUBLE), least(CAST(127.0 AS DOUBLE), "
        "floor((CAST({x} AS DOUBLE) * CAST(127.0 AS DOUBLE)) / __amax__ "
        "+ CAST(0.5 AS DOUBLE))))"
    )
    e = (
        "(CAST({x} AS DOUBLE) - (" + qd + " * __amax__) / CAST(127.0 AS DOUBLE))"
    )
    qi64 = f"CAST({qd} AS BIGINT)"
    m_i = (
        "CAST(floor(" + e + " * " + e + " * 1e12 + 5e-1) AS BIGINT)"
    )
    fold = (
        "aggregate(__v__, named_struct('s', 0L, 'l1', 0L, 'm', 0L), "
        "(acc, x) -> IF(__amax__ = CAST(0.0 AS DOUBLE), acc, named_struct("
        f"'s', acc.s + {qi64.format(x='x')}, "
        f"'l1', acc.l1 + abs({qi64.format(x='x')}), "
        f"'m', acc.m + {m_i.format(x='x')})))"
    )
    q_arr = (
        "transform(__v__, x -> IF(__amax__ = CAST(0.0 AS DOUBLE), 0, "
        f"CAST({qd.format(x='x')} AS INT)))"
    )
    p1 = df.selectExpr(
        f"`{id_col}`",
        f"`{vec_col}` AS __v__",
        f"array_max(transform(`{vec_col}`, x -> abs(CAST(x AS DOUBLE)))) "
        "AS __amax__",
    )
    p2 = p1.select(
        F.col(id_col),
        F.col("__v__"),
        F.col("__amax__"),
        F.explode(F.array(F.expr(fold))).alias("__acc__"),
    )
    return p2.selectExpr(
        f"`{id_col}`",
        "size(__v__) AS n_dims",
        f"{q_arr} AS q",
        "__amax__ / CAST(127.0 AS DOUBLE) AS scale",
        "__acc__.s AS q_sum",
        "__acc__.l1 AS q_l1",
        "CAST(__acc__.m AS DOUBLE) / (CAST(size(__v__) AS DOUBLE) * 1e12) AS mse",
    )


def _pq_codebooks(corpus: DataFrame, vec_col: str, id_col: str, m: int, k: int):
    """Deterministic PQ codebooks: the ``k`` vectors with the smallest
    ids (the kmeans_fit init contract — a DuckDB oracle re-derives the
    identical set via row_number() ORDER BY id LIMIT k), each sliced
    into ``m`` equal subvectors. Returns (books, dim, dsub) where
    ``books[s]`` is ``[(code, subvector)]`` with code = 0..k-1 in id
    order. Bounded collect: k × dim floats (the broadcast-sized
    centroid contract)."""
    rows = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"corpus has only {len(rows)} vectors, need k={k}")
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = []
    for s in range(m):
        books.append(
            [
                (code, [float(x) for x in r[1]][s * dsub:(s + 1) * dsub])
                for code, r in enumerate(rows)
            ]
        )
    return books, dim, dsub


def _pq_codebooks_trained(
    corpus: DataFrame, vec_col: str, id_col: str, m: int, k: int, iters: int
):
    """Per-subspace Lloyd's-trained PQ codebooks (the FAISS training
    step; first-k-by-id codebooks give materially worse quantization
    error on real embeddings — r7 verdict #3). Init = the first-k-by-id
    books (:func:`_pq_codebooks`); each iteration assigns every
    subvector to its nearest code and recomputes centroids from EXACT
    integer micro-unit sums (the kmeans_fit update contract — python's
    ``s / (n * 1e6)`` is the identical IEEE division DuckDB performs, so
    an unrolled-CTE oracle re-derives every trained centroid
    bit-for-bit; empty codes keep their previous centroid).

    Scale: ONE fused job per iteration for ALL m subspaces — the corpus
    stacks to (subspace, subvector) rows via one explode, the argmin is
    a per-subspace CASE over bounded literal books (each row evaluates
    only its own branch), and the update aggregate is map-side combined
    down to m·k·dsub cells before the bounded collect. No per-iteration
    lineage growth: books are python literals, so every iteration's plan
    reads the corpus directly."""
    from .clustering import _SCALE_SQL

    books, dim, dsub = _pq_codebooks(corpus, vec_col, id_col, m, k)
    subs = ", ".join(
        f"named_struct('s', {s}, 'sub', slice(__v__, {s * dsub + 1}, {dsub}))"
        for s in range(m)
    )
    stacked = (
        corpus.where(F.col(vec_col).isNotNull())
        .selectExpr(f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS __v__")
        .selectExpr(f"explode(array({subs})) AS __sub__")
        .selectExpr("__sub__.s AS __s__", "__sub__.sub AS __sv__")
    )
    for _ in range(iters):
        case = (
            "CASE "
            + " ".join(
                f"WHEN __s__ = {s} THEN "
                f"({_pq_sub_argmin_sql('__sv__', books[s])}).code"
                for s in range(m)
            )
            + " END"
        )
        cells = (
            stacked.selectExpr("__s__", "__sv__", f"{case} AS __code__")
            .select(
                "__s__",
                "__code__",
                F.posexplode(F.col("__sv__")).alias("pos", "v"),
            )
            .selectExpr(
                "__s__", "__code__", "pos", _SCALE_SQL.format(v="v") + " AS sv"
            )
            .groupBy("__s__", "__code__", "pos")
            .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: m * k * dsub rows
        )
        upd: dict = {}
        for r in cells:
            upd.setdefault((r["__s__"], r["__code__"]), {})[r["pos"]] = r[
                "s"
            ] / (r["n"] * 1000000.0)
        books = [
            [
                (
                    code,
                    [vals[p] for p in sorted(vals)]
                    if (vals := upd.get((s, code)))
                    else old,
                )
                for code, old in books[s]
            ]
            for s in range(m)
        ]
    return books, dim, dsub


def _pq_sub_argmin_sql(sub_expr: str, book) -> str:
    """array_min over k named_structs ('d' = |c|² − 2·(sub·c), 'code') —
    the kmeans _argmin_cluster_sql form on a SUBVECTOR expression. The
    |sub|² term is omitted (constant within the argmin); ties break to
    the lowest code via struct ordering. One SQL string (bulk-expr
    rule)."""
    structs = []
    for code, cvec in book:
        arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
        dot = (
            f"aggregate(zip_with({sub_expr}, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
        )
        csq = sum(v * v for v in cvec)
        structs.append(
            f"named_struct('d', {csq!r}D - 2.0D * {dot}, "
            f"'code', CAST({code} AS INT))"
        )
    return "array_min(array(" + ",".join(structs) + "))"


def _pq_lut_exprs(vec_name: str, books, dsub: int) -> list:
    """Per-subspace ADC lookup tables as SQL select items
    ``__lut{s}__``: element j = |sub|² + (|c_j|² − 2·sub·c_j) — the
    pq_encode distance chain plus the probe norm, fixed
    parenthesization (mirrored in the oracles). One LUT build costs
    m·k bounded folds per probe row; every candidate afterwards is m
    array lookups."""
    m = len(books)
    out = []
    for s in range(m):
        sub = f"slice({vec_name}, {s * dsub + 1}, {dsub})"
        pvv = (
            f"aggregate({sub}, 0.0D, (acc, x) -> "
            "acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
        cells = []
        for code, cvec in books[s]:
            arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
            dot = (
                f"aggregate(zip_with({sub}, {arr}, (x, y) -> "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
                "(acc, x) -> acc + x)"
            )
            csq = sum(v * v for v in cvec)
            cells.append(f"({pvv} + ({csq!r}D - 2.0D * {dot}))")
        out.append(f"array({','.join(cells)}) AS __lut{s}__")
    return out


def pq_encode(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    codebooks=None,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011) — encode each vector as
    ``m`` sub-space codes of ``log2(k)`` bits: the memory step that makes
    100 TB of embeddings searchable (a 64-dim float32 vector is 256
    bytes; its m=4/k=16 PQ code is 4 bytes — the corpus of codes fits in
    RAM where the raw vectors never will, and :func:`pq_search` scans
    codes with table lookups instead of float dot products).
    Output: ``(id, code_0..code_{m-1} (int), recon_sq_err (double))``
    where recon_sq_err = Σ_s |sub_s − codebook_s[code_s]|².

    ``codebooks=None`` derives deterministic codebooks from the first
    ``k`` vectors by id (:func:`_pq_codebooks`); ``kmeans_iters=N``
    trains them with N per-subspace Lloyd's iterations first
    (:func:`_pq_codebooks_trained` — the FAISS training step, exactly
    as ``ivf_index(kmeans_iters=)`` trains cell centroids). Pass the
    structure returned by either helper to encode against prebuilt
    codebooks.

    Cross-engine exactness: per-subspace distances are the kmeans
    ``|c|² − 2·(sub·c)`` chain (python-literal |c|² = the same
    left-to-right float sum as DuckDB's list_dot_product; the fold
    mirrors it), argmin ties break to the lowest code, and the
    reconstruction error re-adds the hoisted |sub|² in a fixed
    parenthesization — every double is bit-identical in the oracle.

    Scale/codegen: one scan, zero shuffles, zero joins — codebooks are
    inlined literals (bounded m·k·dsub floats, the centroid-broadcast
    contract). All m argmins + m |sub|² folds evaluate ONCE inside a
    single struct behind a Generate barrier (explode of a 1-element
    array), so field extraction cannot re-inline the argmin trees
    through CollapseProject (the expression-referenced-twice trap).
    """
    if codebooks is None:
        books, dim, dsub = (
            _pq_codebooks_trained(corpus, vec_col, id_col, m, k, kmeans_iters)
            if kmeans_iters
            else _pq_codebooks(corpus, vec_col, id_col, m, k)
        )
    else:
        books, dim, dsub = codebooks
        m, k = len(books), len(books[0])

    payload = []
    for s in range(m):
        sub = f"slice(__v__, {s * dsub + 1}, {dsub})"
        vv = (
            f"aggregate({sub}, 0.0D, (acc, x) -> "
            "acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
        payload.append(f"'m{s}', {_pq_sub_argmin_sql(sub, books[s])}")
        payload.append(f"'vv{s}', {vv}")
    barrier = "named_struct(" + ", ".join(payload) + ")"

    p1 = corpus.where(F.col(vec_col).isNotNull()).selectExpr(
        f"`{id_col}`",
        f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS __v__",
    )
    p2 = p1.select(
        F.col(id_col),
        F.explode(F.array(F.expr(barrier))).alias("__pq__"),
    )
    # recon = ((e_0 + e_1) + ...) with e_s = (vv_s + d_s): fixed
    # parenthesization, mirrored verbatim in the oracle SQL
    recon = " + ".join(f"(__pq__.vv{s} + __pq__.m{s}.d)" for s in range(m))
    return p2.selectExpr(
        f"`{id_col}`",
        *[f"__pq__.m{s}.code AS code_{s}" for s in range(m)],
        f"{recon} AS recon_sq_err",
    )


def pq_search(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    top: int = 10,
    kmeans_iters: int = 0,
    two_phase="auto",
    codebooks=None,
    candidates: "int | None" = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) search over PQ codes: each probe
    precomputes an ``m × k`` lookup table of subspace distances ONCE
    (m·k bounded folds per probe row), then every corpus candidate costs
    ``m`` array lookups + adds — no per-pair float dot products. Output:
    ``(probe_id, neighbor_id, adc_dist, rank)`` — rank 1..top per probe
    by ascending approximate squared L2 (ties to the lowest neighbor
    id).

    This is the scan PQ was built for: at 100 TB the code table is
    ~64× smaller than the raw vectors and the per-candidate work is
    integer indexing. Compose with :func:`ivf_index` cells to prune
    candidates first (IVF-ADC); the brute-code scan here is the recall
    baseline. The probe side is deliberately tiny and broadcast (the
    ann_brute_force exemption).

    Exactness: LUT entries are ``|p_sub|² + (|c|² − 2·p_sub·c)`` — the
    pq_encode chain plus the probe norm, fixed parenthesization — and
    the ADC sum adds the m looked-up doubles left-to-right; ranks
    break ties by neighbor id, so the oracle reproduces the full
    result bit-for-bit.
    """
    # ``codebooks``/``candidates`` (r10, r9 verdict #8): serving callers
    # pass the memoized build so repeat searches launch zero codebook-
    # collect / corpus-count jobs (the pq_encode/ann_ivf contract)
    books, dim, dsub = codebooks if codebooks is not None else (
        _pq_codebooks_trained(corpus, vec_col, id_col, m, k, kmeans_iters)
        if kmeans_iters
        else _pq_codebooks(corpus, vec_col, id_col, m, k)
    )
    codes = pq_encode(corpus, vec_col, id_col, codebooks=(books, dim, dsub))

    p = probes.where(F.col(vec_col).isNotNull()).selectExpr(
        f"`{id_col}` AS probe_id",
        f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS __pv__",
    ).selectExpr("probe_id", *_pq_lut_exprs("__pv__", books, dsub))

    adc = " + ".join(
        f"try_element_at(__lut{s}__, code_{s} + 1)" for s in range(m)
    )
    joined = codes.withColumnRenamed(id_col, "neighbor_id").crossJoin(
        F.broadcast(p)
    )
    scored = joined.where(
        F.col("neighbor_id") != F.col("probe_id")
    ).selectExpr("probe_id", "neighbor_id", f"{adc} AS adc_dist")
    # adaptive top-k (r8 verdict #1): the brute code scan is
    # corpus-sized per probe → stripes above the bounded-sort threshold,
    # one plain window below it (one bounded corpus count in auto mode)
    return _two_phase_topk(
        scored,
        [F.col("adc_dist").asc(), F.col("neighbor_id").asc()],
        top,
        candidates=_resolve_topk_candidates(
            two_phase,
            (lambda: candidates) if candidates is not None else corpus.count,
        ),
    ).select("probe_id", "neighbor_id", "adc_dist", "rank")


def mmr_select(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """(rank, {id_col}, score_scaled) — Maximal Marginal Relevance selection
    (Carbonell & Goldstein 1998): greedily pick ``k`` items maximizing
    ``lam*rel - (1-lam)*max_sim_to_selected`` — the
    relevance-AND-diversity selector for eval-set / few-shot-pool
    construction where plain top-k returns near-duplicates.

    Determinism: every cosine snaps to the 1e-6 floor grid; ``lam``
    snaps to percents so the greedy score is an exact integer
    (lam100*rel_m - (100-lam100)*maxsim_m); argmax ties break to the
    smallest id. The DuckDB oracle unrolls the k steps into
    MATERIALIZED CTEs computing the identical integers.

    Scale: the relevance pass is one codegen'd projection
    (localCheckpointed — k consumers); each greedy step joins the
    bounded selected set (≤ k rows, broadcast) onto the candidates and
    collects ONE row — k driver round-trips of one row each (the
    kmeans/bradley_terry bounded-collect contract), never the
    candidate set.
    """
    import math

    lam100 = int(round(lam * 100))
    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    arr = "array(" + ",".join(f"{v!r}D" for v in q) + ")"
    vdot = (
        f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    vsq = (
        f"aggregate(zip_with(`{vec_col}`, `{vec_col}`, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    cand = (
        df.where(F.col(vec_col).isNotNull())
        .selectExpr(
            id_col,
            f"`{vec_col}` AS __v__",
            f"CAST(floor({vdot} / (sqrt({vsq}) * {qn!r}D) * 1000000.0 + 0.5) "
            "AS BIGINT) AS __rel__",
            f"sqrt({vsq}) AS __norm__",
        )
        .localCheckpoint(eager=True)
    )
    selected = []  # (id, vec, norm)
    out_rows = []
    remaining = cand
    for step in range(1, k + 1):
        if not selected:
            score = F.lit(lam100) * F.col("__rel__")
        else:
            sims = []
            for sid, svec, snorm in selected:
                sarr = "array(" + ",".join(f"{v!r}D" for v in svec) + ")"
                sdot = (
                    f"aggregate(zip_with(__v__, {sarr}, (x, y) -> "
                    "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
                    "(acc, x) -> acc + x)"
                )
                sims.append(
                    f"CAST(floor({sdot} / (__norm__ * {snorm!r}D) * 1000000.0"
                    " + 0.5) AS BIGINT)"
                )
            maxsim = (
                f"greatest({', '.join(sims)})" if len(sims) > 1 else sims[0]
            )
            score = F.lit(lam100) * F.col("__rel__") - F.lit(
                100 - lam100
            ) * F.expr(maxsim)
        pick = (
            remaining.select(
                id_col, "__v__", "__norm__", score.alias("__s__")
            )
            .orderBy(F.col("__s__").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not pick:
            break
        row = pick[0]
        selected.append(
            (row[id_col], [float(x) for x in row["__v__"]], float(row["__norm__"]))
        )
        out_rows.append((step, row[id_col], int(row["__s__"])))
        remaining = remaining.where(F.col(id_col) != row[id_col])
    spark = df.sparkSession
    # derive the id field's type from the input schema — hardcoding
    # `long` crashed createDataFrame for string/int id columns (r4 advice)
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("score_scaled", LongType(), True),
        ]
    )
    return spark.createDataFrame(out_rows, out_schema)


def matryoshka_eval(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 8,
    k: int = 10,
) -> DataFrame:
    """(probe_id, k, dim, n_hits, recall) — retrieval recall@k of
    TRUNCATED embeddings (first ``dim`` components, the
    Matryoshka/MRL deployment question: "how much ANN quality do I
    keep at a quarter of the dimensions?") against full-dimension
    exact top-k. recall is the tie-proof integer ratio |∩|/k.

    Scale: two :func:`ann_brute_force` passes (broadcast probes, one
    per-probe top-k window each) + one bounded (probes·k) join — the
    corpus scans twice, shuffles never.
    """
    full = ann_brute_force(corpus, probes, vec_col, id_col, k=k).select(
        "probe_id", "neighbor_id"
    )
    tcorpus = corpus.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dim).alias(vec_col)
    )
    tprobes = probes.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dim).alias(vec_col)
    )
    trunc = ann_brute_force(tcorpus, tprobes, vec_col, id_col, k=k).select(
        "probe_id", F.col("neighbor_id").alias("__tn__")
    )
    hits = full.join(
        F.broadcast(trunc),
        on=(full["probe_id"] == trunc["probe_id"])
        & (full["neighbor_id"] == trunc["__tn__"]),
        how="left",
    ).select(full["probe_id"].alias("probe_id"), trunc["__tn__"].alias("__hit__"))
    from .dedup import round4_ratio

    return (
        hits.groupBy("probe_id")
        .agg(F.count(F.when(F.col("__hit__").isNotNull(), 1)).alias("n_hits"))
        .select(
            "probe_id",
            F.lit(k).alias("k"),
            F.lit(dim).alias("dim"),
            F.col("n_hits").cast("long").alias("n_hits"),
            round4_ratio(F.col("n_hits"), F.lit(k)).alias("recall"),
        )
    )


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus snapshots (model
    retrained? upstream encoder changed? distribution moved?) — the
    production monitor for vector pipelines. Output (one row):
    ``n_a, n_b, dim, mean_shift_l2`` (L2 distance between the two mean
    vectors) and ``mean_cosine`` (cosine between them).

    Exactness: per-dimension means come from exact integer micro-unit
    sums (the embedding_centroids convention); each micro-scale mean is
    ONE correctly-rounded division of exact integers, pairwise product
    terms snap to the integer grid BEFORE the dim-cell sum
    (aggregation-order-proof), and the final sqrt/divide chain is a
    fixed op sequence mirrored in the oracle; outputs fround to 6 dp.

    Scale: ONE union + posexplode + (pos)-keyed aggregate (map-side
    combined to 2·dim cells) plus a per-row norm aggregate — two
    bounded passes, no joins, no windows."""
    from .dedup import fround

    def tagged(df, sa, sb):
        return df.where(F.col(vec_col).isNotNull()).select(
            F.col(vec_col).alias("__v__"),
            F.lit(sa).alias("__sa__"),
            F.lit(sb).alias("__sb__"),
        )

    u = tagged(df_a, 1, 0).unionAll(tagged(df_b, 0, 1))
    ex = u.select(
        "__sa__", "__sb__", F.posexplode(F.col("__v__")).alias("pos", "x")
    ).selectExpr(
        "__sa__",
        "__sb__",
        "pos",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS sv",
    )
    cells = ex.groupBy("pos").agg(
        F.sum(F.when(F.col("__sa__") == 1, F.col("sv"))).alias("__ma__"),
        F.sum(F.when(F.col("__sb__") == 1, F.col("sv"))).alias("__mb__"),
        F.count(F.when(F.col("__sa__") == 1, 1)).alias("__na__"),
        F.count(F.when(F.col("__sb__") == 1, 1)).alias("__nb__"),
    )
    # Per-position micro-scale mean doubles — each is ONE correctly-
    # rounded division of exact integers, identical cross-engine. The
    # pairwise product terms snap to the integer grid BEFORE the
    # 64-cell sum so aggregation order cannot matter. (A cross-scaled
    # exact-integer formulation ma·nb overflows DECIMAL(38) in the A·A
    # dot past ~1e19 — row counts a 100 TB corpus actually reaches.)
    am = F.col("__ma__").cast("double") / F.col("__na__").cast("double")
    bm = F.col("__mb__").cast("double") / F.col("__nb__").cast("double")
    snap = lambda e: F.floor(e + F.lit(0.5)).cast("long")
    g = cells.agg(
        F.max("__na__").alias("n_a"),
        F.max("__nb__").alias("n_b"),
        F.count(F.lit(1)).alias("dim"),
        F.sum(snap((am - bm) * (am - bm))).alias("__d2__"),
        F.sum(snap(am * bm)).alias("__ab__"),
        F.sum(snap(am * am)).alias("__aa__"),
        F.sum(snap(bm * bm)).alias("__bb__"),
    )
    shift = F.sqrt(F.col("__d2__").cast("double")) / F.lit(1000000.0)
    cos = F.col("__ab__").cast("double") / (
        F.sqrt(F.col("__aa__").cast("double"))
        * F.sqrt(F.col("__bb__").cast("double"))
    )
    return g.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("dim").cast("int").alias("dim"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), fround(shift, 6) + F.lit(0.0)
        ).alias("mean_shift_l2"),
        F.when(
            (F.col("__aa__") > 0) & (F.col("__bb__") > 0),
            fround(cos, 6) + F.lit(0.0),
        ).alias("mean_cosine"),
    )
