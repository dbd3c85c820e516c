"""Pairwise-preference rating: Bradley-Terry strengths via the MM
algorithm (Hunter 2004, "MM algorithms for generalized Bradley-Terry
models") — the standard aggregation for RLHF preference pairs and
arena-style model comparisons (Elo-over-pairs without the
order-dependence of online Elo updates).

Scale design: the corpus of match rows is reduced by ONE distributed
groupBy((winner, loser)) to a pair-count table bounded by #players², and
players (model variants, policies) are inherently few — the MM fixed
point then runs on the DRIVER over that bounded table in EXACT integer
arithmetic (Python bigints, nano-unit ratings, floor division), the
classifier_fit / bpe_train precedent, so the fit is bitwise independent
of partitioning. The DuckDB oracle replicates the same iterations as an
unrolled CTE chain in HUGEINT with `//` — bit-identical (the pagerank
nano-unit pattern).

Reference surface parity: net-new beyond hashquery (its aggregate engine
stops at SQL aggregates; cf. reference model.py aggregate()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UNIT = 10**9  # nano-unit ratings


def _mm_iterate(players, wins, games, iters):
    """Exact-integer MM iterations. ``wins[i]`` = total (smoothed) wins,
    ``games[(i, j)]`` = (smoothed) games between i and j (symmetric).
    Ratings start uniform at UNIT // k and renormalize to sum UNIT each
    step. All divisions are floor — replicated by DuckDB DIV."""
    k = len(players)
    s = {p: _UNIT // k for p in players}
    for _ in range(iters):
        t = {}
        for i in players:
            denom = 0
            for j in players:
                if j == i:
                    continue
                n_ij = games.get((i, j), 0)
                if n_ij:
                    denom += (n_ij * 10**18) // (s[i] + s[j])
            t[i] = (wins[i] * 10**18) // denom if denom else 0
        total = sum(t.values()) or 1
        s = {p: (t[p] * _UNIT) // total for p in players}
    return s


def bradley_terry(
    matches: DataFrame,
    winner_col: str,
    loser_col: str,
    *,
    iters: int = 20,
    smoothing: int = 1,
    max_players: int = 1000,
) -> DataFrame:
    """(player, wins, games, rating) — Bradley-Terry strengths from
    (winner, loser) match rows after ``iters`` MM iterations, ratings
    normalized to sum 1 (descending). ``smoothing`` adds that many
    virtual wins per ordered player pair (so every player beats and
    loses to every other ``smoothing`` times) — the standard
    regularization that keeps the MLE finite when a player never wins
    and the comparison graph is disconnected.

    Rows with NULL or self-matches are dropped. Output doubles are
    nano-unit integers divided by 1e9 — exact in both engines.

    Scale guard (round-4 verdict item): the MM loop collects the
    aggregated pair counts to the driver and iterates O(k²·iters) over
    dense smoothed pairs — intended for ranking tens-to-hundreds of
    models/annotators, silently pathological for a high-cardinality
    player key (k = 1e6 user ids → 1e12 smoothed pairs). The op counts
    distinct players FIRST and raises above ``max_players`` (default
    1000 ≈ 1e6 smoothed pairs per iteration, comfortably driver-sized)
    — pick your comparison entity deliberately rather than inheriting a
    runaway key; for genuinely huge player sets use a distributed
    iterative formulation (the integer-unit pagerank pattern,
    ops/graph.py).
    """
    spark = matches.sparkSession
    filtered = matches.where(
        F.col(winner_col).isNotNull()
        & F.col(loser_col).isNotNull()
        & (F.col(winner_col) != F.col(loser_col))
    )
    n_players = (
        filtered.select(F.col(winner_col).cast("string").alias("p"))
        .union(filtered.select(F.col(loser_col).cast("string").alias("p")))
        .agg(F.countDistinct("p").alias("k"))
        .collect()[0]["k"]
    )
    if n_players > max_players:
        raise ValueError(
            f"bradley_terry: {n_players} distinct players exceeds "
            f"max_players={max_players}; the driver-side MM loop is "
            "O(k^2 * iters) over dense smoothed pairs. Rank a bounded "
            "entity (model, annotator) or aggregate players first; for "
            "huge k use a distributed iterative formulation "
            "(integer-unit pagerank pattern, ops/graph.py)."
        )
    pair_counts = (
        filtered.groupBy(
            F.col(winner_col).cast("string").alias("w"),
            F.col(loser_col).cast("string").alias("l"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    raw_wins, raw_games = {}, {}
    players = sorted(
        {r["w"] for r in pair_counts} | {r["l"] for r in pair_counts}
    )
    for r in pair_counts:
        raw_wins[r["w"]] = raw_wins.get(r["w"], 0) + r["n"]
        key = (r["w"], r["l"])
        raw_games[key] = raw_games.get(key, 0) + r["n"]
        raw_games[(r["l"], r["w"])] = raw_games.get((r["l"], r["w"]), 0) + r["n"]
    schema = "player string, wins long, games long, rating double"
    if not players:
        return spark.createDataFrame([], schema)
    wins = {
        p: raw_wins.get(p, 0) + smoothing * (len(players) - 1) for p in players
    }
    games = dict(raw_games)
    for i in players:
        for j in players:
            if i != j:
                games[(i, j)] = games.get((i, j), 0) + 2 * smoothing
    s = _mm_iterate(players, wins, games, iters)
    rows = [
        (
            p,
            raw_wins.get(p, 0),
            sum(raw_games.get((p, j), 0) for j in players),
            s[p] / 1e9,
        )
        for p in players
    ]
    out = spark.createDataFrame(rows, schema)
    return out.orderBy(F.desc("rating"), "player")


def bradley_terry_oracle_sql(
    matches_sql: str,
    winner_expr: str,
    loser_expr: str,
    *,
    iters: int = 20,
    smoothing: int = 1,
) -> str:
    """DuckDB twin of :func:`bradley_terry`: the same pair-count
    reduction and the same integer MM iterations unrolled into chained
    CTEs (pagerank pattern), every CTE MATERIALIZED — each iteration
    references its predecessor twice (the si/sj self-pair join), and
    DuckDB's default inline-by-copy expansion is EXPONENTIAL in the
    iteration count without it — all accumulators HUGEINT so the
    ``n·10^18`` products can't overflow, all divisions ``//``."""
    head = f"""
WITH m AS MATERIALIZED (
  SELECT CAST({winner_expr} AS VARCHAR) AS w, CAST({loser_expr} AS VARCHAR) AS l
  FROM ({matches_sql})
  WHERE {winner_expr} IS NOT NULL AND {loser_expr} IS NOT NULL
    AND CAST({winner_expr} AS VARCHAR) <> CAST({loser_expr} AS VARCHAR)
),
pc AS MATERIALIZED (SELECT w, l, count(*) AS n FROM m GROUP BY 1, 2),
players AS MATERIALIZED (SELECT DISTINCT p FROM (SELECT w AS p FROM pc UNION SELECT l FROM pc)),
k AS MATERIALIZED (SELECT count(*) AS k FROM players),
games AS MATERIALIZED (
  SELECT i, j,
         CAST(sum(n) + {2 * smoothing} AS HUGEINT) AS n_ij
  FROM (
    SELECT a.p AS i, b.p AS j, coalesce(pc.n, 0) AS n
    FROM players a JOIN players b ON a.p <> b.p
    LEFT JOIN (
      SELECT w AS i, l AS j, n FROM pc
      UNION ALL SELECT l, w, n FROM pc
    ) pc ON pc.i = a.p AND pc.j = b.p
  ) GROUP BY 1, 2
),
wins AS MATERIALIZED (
  SELECT p.p AS i,
         CAST(coalesce(w.nw, 0) + {smoothing} * ((SELECT k FROM k) - 1) AS HUGEINT) AS w
  FROM players p
  LEFT JOIN (SELECT w AS i, sum(n) AS nw FROM pc GROUP BY 1) w ON w.i = p.p
),
s0 AS MATERIALIZED (
  SELECT i, CAST(1000000000 // (SELECT k FROM k) AS HUGEINT) AS s FROM wins
)"""
    steps = []
    for it in range(iters):
        prev, t, cur = f"s{it}", f"t{it + 1}", f"s{it + 1}"
        steps.append(
            f"""
{t} AS MATERIALIZED (
  SELECT w.i,
         CASE WHEN coalesce(d.denom, 0) > 0
              THEN (w.w * CAST(1000000000000000000 AS HUGEINT)) // d.denom
              ELSE CAST(0 AS HUGEINT) END AS t
  FROM wins w
  LEFT JOIN (
    SELECT g.i,
           sum((g.n_ij * CAST(1000000000000000000 AS HUGEINT))
               // (si.s + sj.s)) AS denom
    FROM games g
    JOIN {prev} si ON si.i = g.i
    JOIN {prev} sj ON sj.i = g.j
    GROUP BY 1
  ) d ON d.i = w.i
),
{cur} AS MATERIALIZED (
  SELECT i, (t * CAST(1000000000 AS HUGEINT))
            // greatest(CAST(1 AS HUGEINT), (SELECT sum(t) FROM {t})) AS s
  FROM {t}
)"""
        )
    tail = f"""
SELECT p.p AS player,
       CAST(coalesce(rw.nw, 0) AS BIGINT) AS wins,
       CAST(coalesce(g.ng, 0) AS BIGINT) AS games,
       CAST(s.s AS DOUBLE) / 1e9 AS rating
FROM players p
LEFT JOIN (SELECT w AS i, sum(n) AS nw FROM pc GROUP BY 1) rw ON rw.i = p.p
LEFT JOIN (
  SELECT i, sum(n) AS ng FROM (
    SELECT w AS i, n FROM pc UNION ALL SELECT l, n FROM pc
  ) GROUP BY 1
) g ON g.i = p.p
JOIN s{iters} s ON s.i = p.p
ORDER BY rating DESC, player
"""
    return head + "," + ",".join(steps) + tail


def dpo_pair_build(
    df: DataFrame,
    prompt_col: str,
    completion_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """Build preference pairs for DPO/RLHF reward modeling from scored
    completions: per prompt, chosen = highest-scored completion,
    rejected = lowest-scored (ties break to the LOWEST completion id on
    both sides — a total order, so the pair set is deterministic under
    any partitioning), emitted only when ``margin = chosen_score −
    rejected_score`` is ``> min_margin`` and the prompt has ≥ 2
    completions. Output: ``prompt, chosen, rejected, chosen_score,
    rejected_score, margin, n_completions``.

    This is the standard pairing step of preference-data prep (e.g.
    best-vs-worst sampling from an n-best list scored by a reward
    model); compose upstream with :func:`~hashquery_spark.ops`
    classifier/quality scores and downstream with
    :func:`bradley_terry` / :func:`win_rate` over the emitted pairs.

    Scale: ONE groupBy(prompt) with two struct-ordered min/max
    aggregates — no window, no join, map-side combined. Exactness:
    argmin/argmax via natural struct ordering on (±score, id); margin
    is one IEEE subtraction of the selected raw doubles, identical in
    the oracle."""
    p = F.col(prompt_col)
    c = F.col(completion_col)
    s = F.col(score_col).cast("double")
    base = df.where(p.isNotNull() & c.isNotNull() & s.isNotNull())
    # (-score, id) min = highest score, lowest id tiebreak;
    # (score, id) min = lowest score, lowest id tiebreak
    g = base.groupBy(p.alias("prompt")).agg(
        F.min(F.struct((-s).alias("ns"), c.alias("id"), s.alias("s"))).alias(
            "__ch__"
        ),
        F.min(F.struct(s.alias("s"), c.alias("id"))).alias("__rj__"),
        F.count(F.lit(1)).cast("long").alias("n_completions"),
    )
    margin = F.col("__ch__.s") - F.col("__rj__.s")
    return (
        g.where(
            (F.col("n_completions") >= 2) & (margin > F.lit(float(min_margin)))
        )
        .select(
            "prompt",
            F.col("__ch__.id").alias("chosen"),
            F.col("__rj__.id").alias("rejected"),
            F.col("__ch__.s").alias("chosen_score"),
            F.col("__rj__.s").alias("rejected_score"),
            margin.alias("margin"),
            "n_completions",
        )
    )


def win_rate(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-player win/loss census over pairwise match results:
    ``(player, n_wins, n_losses, n_games, win_rate, wilson_lo,
    wilson_hi)`` — the model-eval leaderboard readout (arena-style
    pairwise preference data), with the Wilson score interval so a
    3-0 newcomer doesn't outrank a 300-80 veteran. The closed-form
    companion to :func:`bradley_terry` (which fits latent strengths;
    this reports raw rates with uncertainty).

    Scale: one tagged union -> one groupBy(player) with map-side
    combine; no joins, no windows.

    Determinism: win_rate is the tie-proof integer ratio; the Wilson
    bounds are fixed-order IEEE chains over exact counts (sqrt is
    correctly rounded), snapped with fround(6).
    """
    from .dedup import fround, round4_ratio

    base = df.where(
        F.col(winner_col).isNotNull() & F.col(loser_col).isNotNull()
    )
    w = base.select(
        F.col(winner_col).cast("string").alias("player"),
        F.lit(1).alias("__w__"),
    )
    l = base.select(
        F.col(loser_col).cast("string").alias("player"),
        F.lit(0).alias("__w__"),
    )
    g = (
        w.unionAll(l)
        .groupBy("player")
        .agg(
            F.count(F.when(F.col("__w__") == 1, 1)).alias("n_wins"),
            F.count(F.when(F.col("__w__") == 0, 1)).alias("n_losses"),
        )
    )
    n = (F.col("n_wins") + F.col("n_losses")).cast("double")
    p = F.col("n_wins").cast("double") / n
    zz = F.lit(float(z) * float(z))
    center = p + zz / (F.lit(2.0) * n)
    margin = F.lit(float(z)) * F.sqrt(
        (p * (F.lit(1.0) - p)) / n + zz / (F.lit(4.0) * (n * n))
    )
    denom = F.lit(1.0) + zz / n
    return g.select(
        "player",
        "n_wins",
        "n_losses",
        (F.col("n_wins") + F.col("n_losses")).alias("n_games"),
        round4_ratio(
            F.col("n_wins"), F.greatest(F.col("n_wins") + F.col("n_losses"), F.lit(1))
        ).alias("win_rate"),
        fround((center - margin) / denom, 6).alias("wilson_lo"),
        fround((center + margin) / denom, 6).alias("wilson_hi"),
    )
