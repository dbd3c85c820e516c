"""Embedding clustering: per-label centroids and distributed Lloyd's
k-means (net-new beyond the reference, which has no vector surface).

Scale notes:

* ``embedding_centroids`` explodes (label, pos, value) so the per-cell
  sums get map-side partial aggregation — the classic way to mean arrays
  without collecting whole vectors per group. Two shuffles, both on tiny
  (label, pos) / (label) keys; vector payloads never shuffle whole.
* ``kmeans_fit`` is Lloyd's with the centroid set held on the driver
  (k × dim floats — the same bounded role as a broadcast variable) and
  inlined as literals, so assignment is one narrow codegen'd pass with NO
  join (the pattern proven by :class:`similarity.IvfIndex`). Each
  iteration costs one corpus scan + one (cluster, pos)-keyed shuffle of
  scalar partial sums. The argmin drops the shared |v|^2 term —
  ``argmin_j |v - c_j|^2 == argmin_j (|c_j|^2 - 2 v.c_j)`` — so each
  centroid contributes exactly ONE dot product to the expression tree
  (a greatest()/CASE formulation duplicates every dot ~k times; see the
  measured note in similarity.IvfIndex.sim_structs_sql).

Determinism: assignment compares per-row IEEE doubles (no cross-row
reduction), and centroid updates sum integer-scaled micro-units — exact
under any partitioning/aggregation order. Sums stay exact while
``n_rows_per_cell * 1e6 * max|v| < 2^63`` (~9e12 rows at |v|<=1, far past
100 TB of embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fround

# micro-unit scaling: floor(v*1e6 + 0.5) = round-half-up, exact in both
# Spark and DuckDB (floor over IEEE doubles), negative-safe.
_SCALE_SQL = "CAST(floor(CAST({v} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"


def embedding_centroids(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """(label, dim, centroid) — element-wise mean embedding per label,
    rounded to 6 decimals. ``dim`` is the number of vector positions seen
    for the label (equals the embedding dimension when all vectors agree).
    """
    ex = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .selectExpr(
            label_col,
            "CAST(pos AS BIGINT) AS pos",
            _SCALE_SQL.format(v="v") + " AS sv",
        )
    )
    cell = ex.groupBy(label_col, "pos").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return cell.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("dim"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        fround(F.col("s") / (F.col("n") * 1000000.0), 6).alias("c"),
                    )
                )
            ),
            lambda x: x["c"],
        ).alias("centroid"),
    )


def _argmin_cluster_sql(vec_col: str, cents) -> str:
    """Flat argmin-by-squared-L2 over literal centroids, rendered as ONE
    SQL string (a per-Column build pays one py4j round-trip per literal
    float). Ties break to the lowest cluster id via struct ordering."""
    structs = []
    for cid, cvec in cents:
        arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
        )
        csq = sum(v * v for v in cvec)
        structs.append(
            f"named_struct('d', {csq!r}D - 2.0D * {dot}, "
            f"'cluster', CAST({cid} AS BIGINT))"
        )
    return "array_min(array(" + ",".join(structs) + ")).cluster"


def kmeans_assign(df: DataFrame, vec_col: str, id_col: str, cents) -> DataFrame:
    """(id, cluster) — nearest centroid per vector; ``cents`` is a list of
    ``(cluster_id, [floats])``. One narrow codegen'd pass, no join."""
    return df.where(F.col(vec_col).isNotNull()).selectExpr(
        id_col,
        f"`{vec_col}`",
        _argmin_cluster_sql(vec_col, cents) + " AS cluster",
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
):
    """Lloyd's k-means. Returns ``(centroids, assigned)`` where
    ``centroids`` is ``[(cluster_id, [floats])]`` and ``assigned`` is the
    (id, vec, cluster) DataFrame under the final centroids.

    Deterministic: init = the ``k`` vectors with the smallest ids;
    updates use exact integer-scaled sums; empty clusters keep their
    previous centroid. Fixed iteration counts unroll into chained-CTE SQL
    (see oracle_queries._kmeans_sql) — the replica is bit-identical."""
    init = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents = [(cid, [float(x) for x in r[vec_col]]) for cid, r in enumerate(init)]
    for _ in range(iters):
        # eager checkpoint per iteration (the iterative-loop rule): the
        # live argmin lineage under the posexplode re-evaluates the
        # k-fold per consumer pass — measured 7-9 s per iteration on
        # 200k×64 vectors vs 1.5 s checkpointed
        assigned = kmeans_assign(df, vec_col, id_col, cents).localCheckpoint(
            eager=True
        )
        cell = (
            assigned.select(F.col("cluster"), F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .selectExpr("cluster", "pos", _SCALE_SQL.format(v="v") + " AS sv")
            .groupBy("cluster", "pos")
            .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k * dim rows
        )
        by_cluster: dict = {}
        for r in cell:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"] / (
                r["n"] * 1000000.0
            )
        cents = [
            (cid, [vals[p] for p in sorted(vals)] if vals else old)
            for cid, old in cents
            for vals in (by_cluster.get(cid),)
        ]
    return cents, kmeans_assign(df, vec_col, id_col, cents)


def embedding_pca(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 2,
    whiten: bool = False,
):
    """(projected DataFrame, components, eigenvalues) — principal-
    component projection of an embedding column: the standard
    dimensionality reduction / whitening step before embedding dedup or
    visualization (SemDeDup-style pipelines).

    Returns a 3-tuple: the projected frame ``(id, pca array<double>)``
    with ``k`` components, the ``k×d`` component matrix (python lists,
    rows sign-fixed so the max-|coeff| element is positive), and the
    eigenvalue list.

    Scale design: mean and covariance reduce distributively — vectors
    are snapped to a 1e-6 integer grid (the embedding_centroids
    convention), the d² second-moment sums come from ONE
    posexplode×posexplode pair expansion with map-side combine (shuffle
    bounded at d² keys, linear streaming cost — d=64 ⇒ 4096 cells), and
    the d×d eigendecomposition runs driver-side in numpy on the EXACT
    integer moment matrix (bounded, deterministic, partitioning-
    independent — the classifier_fit precedent). The projection is one
    broadcast-literal matmul per component, flat-codegen'd.

    Iterative/eig driver step ⇒ rows-only (the bpe_merges precedent);
    pinned by a numpy python-reference parity test instead.
    """
    import numpy as np

    base = df.where(F.col(vec_col).isNotNull())
    ex = base.select(
        F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).selectExpr("pos", _SCALE_SQL.format(v="v") + " AS sv")
    mom1 = (
        ex.groupBy("pos")
        .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n"))
        .orderBy("pos")
        .collect()
    )
    if not mom1:
        return base.select(F.col(id_col)), [], []
    d = len(mom1)
    n = mom1[0]["n"]
    mean_units = np.array([r["s"] for r in mom1], dtype=np.float64) / n
    # second moments: pair expansion, exact integer products (1e-12 grid)
    pairs = (
        base.select(F.posexplode(F.col(vec_col)).alias("i", "vi"), F.col(vec_col).alias("__v__"))
        .select("i", "vi", F.posexplode(F.col("__v__")).alias("j", "vj"))
        .where(F.col("j") >= F.col("i"))
        .selectExpr(
            "i",
            "j",
            "CAST("
            + _SCALE_SQL.format(v="vi")
            + " AS DECIMAL(38,0)) * "
            + _SCALE_SQL.format(v="vj")
            + " AS p",
        )
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"))
        .collect()
    )
    m2 = np.zeros((d, d))
    for r in pairs:
        v = float(r["sp"])
        m2[r["i"], r["j"]] = v
        m2[r["j"], r["i"]] = v
    cov = m2 / n - np.outer(mean_units, mean_units)  # 1e-12 units²
    evals, evecs = np.linalg.eigh(cov / 1e12)
    order = np.argsort(evals)[::-1][:k]
    comps, lams = [], []
    for idx in order:
        vec = evecs[:, idx]
        top = np.argmax(np.abs(vec))
        if vec[top] < 0:
            vec = -vec
        lam = float(evals[idx])
        if whiten and lam > 0:
            vec = vec / np.sqrt(lam)
        comps.append([float(x) for x in vec])
        lams.append(lam)
    mean = [float(x) for x in mean_units / 1e6]
    # flat per-component dot products against literal components
    proj_cols = []
    for ci, comp in enumerate(comps):
        terms = " + ".join(
            f"(CAST({vec_col}[{i}] AS DOUBLE) - ({mean[i]!r})) * ({w!r})"
            for i, w in enumerate(comp)
        )
        proj_cols.append(f"CAST(({terms}) AS DOUBLE)")
    projected = base.selectExpr(
        id_col, f"array({', '.join(proj_cols)}) AS pca"
    )
    return projected, comps, lams


def embedding_outliers(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    q: float = 0.95,
) -> DataFrame:
    """(id, cluster, dist2, is_outlier) — flag embeddings whose squared
    L2 distance to their own k-means centroid exceeds the cluster's
    ``q``-quantile (the SemDeDup-companion *prototypicality* gate:
    far-from-every-centroid vectors are mislabeled/garbled/off-domain
    candidates, the embedding-space analogue of a perplexity tail cut).

    Scale: k-means via :func:`kmeans_fit` (bounded k·dim driver state);
    assignment + distance in ONE codegen'd argmin pass — the
    ``array_min(struct)`` form carries (dist-without-|v|², cluster) so
    |v|² (a HOF fold) is evaluated ONCE outside, never per-centroid
    through a CASE (the measured expression-in-CASE trap). Thresholds
    come from :func:`~hashquery_spark.ops.profile.grid_percentiles`
    (exact, bounded memory) per cluster and broadcast back.

    Determinism: distances are the same sequential double chains DuckDB
    list_dot_product performs (the kmeans_clusters contract);
    thresholds are exact interpolated percentiles; the emitted dist2 is
    fround(6) but the outlier comparison uses the RAW doubles on both
    engines.
    """
    from .profile import grid_percentiles

    cents, _ = kmeans_fit(df, vec_col, id_col, k=k, iters=iters)
    structs = []
    for cid, cvec in cents:
        arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
        )
        csq = sum(v * v for v in cvec)
        structs.append(
            f"named_struct('d', {csq!r}D - 2.0D * {dot}, "
            f"'cluster', CAST({cid} AS BIGINT))"
        )
    pick = "array_min(array(" + ",".join(structs) + "))"
    vsq = (
        f"aggregate(zip_with(`{vec_col}`, `{vec_col}`, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    scored = (
        df.where(F.col(vec_col).isNotNull())
        .selectExpr(id_col, f"`{vec_col}`", pick + " AS __pick__", vsq + " AS __vsq__")
        .select(
            id_col,
            F.col("__pick__.cluster").alias("cluster"),
            (F.col("__vsq__") + F.col("__pick__.d")).alias("__d2__"),
        )
        # eager checkpoint: the narrow (id, cluster, d2) frame feeds
        # grid_percentiles (several differently-pruned consumers) AND
        # the final join-back — consumed live, each pass re-evaluates
        # the interpreted k-fold argmin lineage (measured 49 s for the
        # percentile pass alone on 200k rows at sf10, ~1.5 s from the
        # checkpoint; a Generate barrier did NOT stop the re-evaluation)
        .localCheckpoint(eager=True)
    )
    th = grid_percentiles(scored, "__d2__", {"__t__": float(q)}, by="cluster")
    return (
        scored.join(F.broadcast(th), on="cluster")
        .select(
            id_col,
            "cluster",
            fround(F.col("__d2__"), 6).alias("dist2"),
            (F.col("__d2__") > F.col("__t__")).alias("is_outlier"),
        )
    )


def silhouette_score(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """(id, cluster, silhouette) — SIMPLIFIED silhouette (centroid
    form: a = distance to own centroid, b = distance to the nearest
    OTHER centroid, s = (b-a)/max(a,b)) over the fitted k-means — the
    clustering-quality readout for :func:`kmeans_fit` /
    :func:`embedding_outliers` (full silhouette is all-pairs; the
    centroid form is the standard O(n·k) surrogate). NULL when k < 2.

    Determinism: distances are the sequential double chains of the
    kmeans contract; the two smallest centroid distances come from ONE
    array_sort of the per-centroid struct array (|v|² added once
    outside — the expression-in-CASE trap); s is a fixed IEEE chain,
    fround(6).

    Scale: one codegen'd pass; k structs per row, no joins.
    """
    if k < 2:
        raise ValueError("silhouette_score needs k >= 2")
    cents, _ = kmeans_fit(df, vec_col, id_col, k=k, iters=iters)
    structs = []
    for cid, cvec in cents:
        arr = "array(" + ",".join(f"{v!r}D" for v in cvec) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
        )
        csq = sum(v * v for v in cvec)
        structs.append(
            f"named_struct('d', {csq!r}D - 2.0D * {dot}, "
            f"'cluster', CAST({cid} AS BIGINT))"
        )
    sorted_arr = "array_sort(array(" + ",".join(structs) + "))"
    vsq = (
        f"aggregate(zip_with(`{vec_col}`, `{vec_col}`, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    base = df.where(F.col(vec_col).isNotNull()).selectExpr(
        id_col,
        sorted_arr + " AS __ds__",
        vsq + " AS __vsq__",
    ).select(
        id_col,
        F.col("__ds__")[0]["cluster"].alias("cluster"),
        F.sqrt(F.col("__vsq__") + F.col("__ds__")[0]["d"]).alias("__a__"),
        F.sqrt(F.col("__vsq__") + F.col("__ds__")[1]["d"]).alias("__b__"),
    )
    from .dedup import fround

    s = (F.col("__b__") - F.col("__a__")) / F.greatest(
        F.col("__a__"), F.col("__b__")
    )
    return base.select(
        id_col,
        "cluster",
        F.when(
            (F.lit(k) >= 2) & (F.greatest(F.col("__a__"), F.col("__b__")) > 0),
            fround(s, 6),
        ).alias("silhouette"),
    )
