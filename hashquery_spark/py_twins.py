"""Python-reference twins for the rows-only queries — the six
``queries()`` entries whose semantics a DuckDB oracle cannot express
(iterative driver loops, zlib, quadratic DP, numpy eig). Each twin
recomputes the ENTRY query's exact output columns single-node: base data
comes from DuckDB (independently re-deriving the distributed scans), the
bounded driver cores are shared where the op itself defines them as
plain-python functions (``_merge_loop``, ``unigram_train_from_words`` —
running the IDENTICAL algorithm is the contract, like the bench
baseline).

The preaudit gate compares every twin against the Spark result with the
same order-insensitive exact canon as the DuckDB oracles — except where
an engine-level float source is documented (``quality_classifier``'s GD
loop routes a Java ``Math.exp`` sigmoid into the micro-unit residual; a
1-ulp libm divergence can drift weights by ~1e-6), where the twin
declares a float tolerance and drops derived booleans. "Rows-only" never
means "runs but unchecked" (round-4 verdict item #4).
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Dict, Tuple

# DuckDB rendering of ops.dedup.tokens(): lowercase, strip
# non-alphanumerics to spaces, trim, split on whitespace
WORD_COUNT_SQL = (
    "SELECT w, count(*) AS n FROM ("
    "  SELECT unnest(string_split_regex(trim(regexp_replace("
    "    lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS w"
    "  FROM documents WHERE text IS NOT NULL)"
    " WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 100000"
)


def _tokens(text):
    if text is None:
        return []
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).split()


def _round4_ratio(num: int, den: int):
    # ops.dedup.round4_ratio — identical IEEE double ops
    return math.floor((100000.0 * num + 5.0 * den) / (10.0 * den)) / 10000.0


def _fround(x: float, dp: int) -> float:
    s = float(10**dp)
    return math.floor(x * s + 0.5) / s


def twin_compression_ratio(con):
    import zlib

    import pandas as pd

    out = []
    for doc_id, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
        if text is None:
            out.append((doc_id, None, None, None))
            continue
        b = text.encode("utf-8")
        raw, comp = len(b), len(zlib.compress(b, 6))
        ratio = _fround(comp / raw, 4) if raw > 0 else None
        out.append((doc_id, raw, comp, ratio))
    return pd.DataFrame(
        out, columns=["doc_id", "raw_bytes", "compressed_bytes", "compression_ratio"]
    )


def twin_bpe_merges(con):
    import pandas as pd

    from .ops.tokenizer import _merge_loop

    words = con.execute(WORD_COUNT_SQL).fetchall()
    merges = _merge_loop(words, 60)
    return pd.DataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        columns=["rank", "left", "right", "merged"],
    )


def twin_unigram_tokenize(con):
    import hashlib

    import pandas as pd

    from .ops.tokenizer import _viterbi, unigram_train_from_words

    words = con.execute(WORD_COUNT_SQL).fetchall()
    pieces = unigram_train_from_words(words, vocab_size=48, em_iters=3)
    logp = dict(pieces)
    max_len = max((len(p) for p in logp), default=1)
    memo: dict = {}
    out = []
    for doc_id, text in con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall():
        toks = []
        for w in _tokens(text):
            seg = memo.get(w)
            if seg is None:
                lp = dict(logp)
                for ch in {c for c in w if c not in lp}:
                    lp[ch] = -1e9
                seg = _viterbi(w, lp, max_len)[0]
                memo[w] = seg
            toks.extend(seg)
        md5 = hashlib.md5("\x01".join(toks).encode("utf-8")).hexdigest()
        out.append((doc_id, len(toks), md5))
    return pd.DataFrame(out, columns=["doc_id", "n_tokens", "tokens_md5"])


def twin_rouge_l(con):
    import pandas as pd

    rows = con.execute(
        "SELECT a.doc_id, a.text, b.text FROM documents a "
        "JOIN documents b ON b.doc_id = a.doc_id + 1 ORDER BY a.doc_id"
    ).fetchall()
    out = []
    for did, cand, ref in rows:
        ta, tb = _tokens(cand), _tokens(ref)
        if len(ta) > len(tb):
            sa, sb = tb, ta
        else:
            sa, sb = ta, tb
        prev = [0] * (len(sa) + 1)
        for x in sb:
            cur = [0]
            for i, y in enumerate(sa):
                cur.append(prev[i] + 1 if x == y else max(prev[i + 1], cur[i]))
            prev = cur
        la, lb, lcs = len(ta), len(tb), prev[-1]
        out.append(
            (
                did,
                la,
                lb,
                lcs,
                _round4_ratio(lcs, la) if la > 0 else None,
                _round4_ratio(lcs, lb) if lb > 0 else None,
                _round4_ratio(2 * lcs, la + lb) if la + lb > 0 else None,
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "doc_id", "cand_len", "ref_len", "lcs_len",
            "rouge_l_p", "rouge_l_r", "rouge_l_f",
        ],
    )


def twin_quality_classifier(con):
    """Full python replica of q_quality_classifier (classifier_fit with
    n_features=2048, iters=3, lr=2.0 on y = raw text contains 'data',
    then score the corpus). Residuals/gradients are integer micro-units
    exactly as the op computes them; the one engine-float source is the
    sigmoid (Spark: Java Math.exp) — hence the declared tolerance."""
    import pandas as pd

    from .ops.classifier import _scale_weight, token_bucket_py

    n_features = 2048
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    feats = {}  # doc_id -> {bucket: cnt}
    ys = {}
    ntok = {}
    for doc_id, text in docs:
        toks = _tokens(text)
        ntok[doc_id] = len(toks)
        ys[doc_id] = 1.0 if (text is not None and "data" in text) else 0.0
        c: dict = {}
        for t in toks:
            b = token_bucket_py(t, n_features)
            c[b] = c.get(b, 0) + 1
        feats[doc_id] = c
    n_docs = len(docs)
    w: Dict[int, float] = {}
    bias = 0.0
    for _ in range(3):
        ws = {b: _scale_weight(x) for b, x in w.items()}
        grad: Dict[int, int] = {}
        rsum = 0
        for doc_id, c in feats.items():
            if ntok[doc_id] == 0:
                m = 0
            else:
                m = sum(ws.get(b, 0) * cnt for b, cnt in sorted(c.items()))
            p = 1.0 / (1.0 + math.exp(-(m / 1e6 + bias)))
            r = math.floor((p - ys[doc_id]) * 1e6 + 0.5)
            rsum += r
            for b, cnt in c.items():
                grad[b] = grad.get(b, 0) + r * cnt
        for b, g in grad.items():
            w[b] = w.get(b, 0.0) - 2.0 * (g / 1e6 / n_docs)
        bias -= 2.0 * (rsum / 1e6 / n_docs)
    # score (classifier_score): micro-unit weight sum + bias, /1e6
    ws = {b: _scale_weight(x) for b, x in w.items()}
    bias_s = _scale_weight(bias)
    out = []
    for doc_id, c in feats.items():
        m = sum(ws.get(b, 0) * cnt for b, cnt in c.items())
        margin = (m + bias_s) / 1e6
        out.append((doc_id, ntok[doc_id], margin, margin > 0))
    return pd.DataFrame(out, columns=["doc_id", "n_tokens", "margin", "keep"])


def twin_embedding_pca(con):
    """numpy replica of q_embedding_pca: exact integer moments from the
    1e-6-snapped grid, the op's own eigh + sign-fix + left-assoc
    projection order — same numpy, same IEEE ops, exact."""
    import numpy as np
    import pandas as pd

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    n = len(rows)
    d = len(rows[0][1])
    s = [0] * d
    m2int = [[0] * d for _ in range(d)]
    svs = []
    for _, vec in rows:
        sv = [math.floor(float(v) * 1000000.0 + 0.5) for v in vec]
        svs.append(sv)
        for i in range(d):
            s[i] += sv[i]
            for j in range(i, d):
                m2int[i][j] += sv[i] * sv[j]
    mean_units = np.array(s, dtype=np.float64) / n
    m2 = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            v = float(m2int[i][j])
            m2[i, j] = v
            m2[j, i] = v
    cov = m2 / n - np.outer(mean_units, mean_units)
    evals, evecs = np.linalg.eigh(cov / 1e12)
    order = np.argsort(evals)[::-1][:2]
    comps = []
    for idx in order:
        vec = evecs[:, idx]
        top = np.argmax(np.abs(vec))
        if vec[top] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    mean = [float(x) for x in mean_units / 1e6]
    out = []
    for (vec_id, vec), _sv in zip(rows, svs):
        pcs = []
        for comp in comps:
            acc = (float(vec[0]) - mean[0]) * comp[0]
            for i in range(1, d):
                acc = acc + (float(vec[i]) - mean[i]) * comp[i]
            pcs.append(_fround(acc, 6))
        out.append((vec_id, pcs[0], pcs[1]))
    return pd.DataFrame(out, columns=["vec_id", "pc1", "pc2"])



def twin_spearman_fast(con):
    """spearman_corr's DEFAULT (double-accumulator) path: pandas
    tie-averaged ranks ×2 (the op's doubled-rank integers) + float64
    Pearson over them. Summation order differs from Spark's partial
    aggregation, so the compare declares a 1e-5 tolerance; the exact
    DECIMAL(38) variant keeps its bit-exact DuckDB oracle (spearman)."""
    import pandas as pd

    pdf = con.execute(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem "
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL"
    ).fetch_df()
    out = []
    for flag, grp in sorted(pdf.groupby("l_returnflag")):
        rx = (grp["l_quantity"].rank(method="average") * 2).to_numpy()
        ry = (grp["l_extendedprice"].rank(method="average") * 2).to_numpy()
        n = len(grp)
        rho = None
        sx, sy = rx.sum(), ry.sum()
        num = n * (rx * ry).sum() - sx * sy
        vx = n * (rx * rx).sum() - sx * sx
        vy = n * (ry * ry).sum() - sy * sy
        if vx > 0 and vy > 0:
            rho = _fround(num / (math.sqrt(vx) * math.sqrt(vy)), 6)
        out.append((flag, n, rho))
    return pd.DataFrame(out, columns=["l_returnflag", "n", "spearman_rho"])


def twin_corr_matrix_fast(con):
    """corr_matrix's DEFAULT (double-accumulator) path: numpy float64
    per-pair moments over the identical pairwise-complete rows. Double
    summation order differs between Spark's partial aggregation and
    numpy's pairwise sum, so the compare declares a 1e-5 tolerance —
    ~7 orders above the worst observed drift, 10x under the 6-dp grid.
    The EXACT path keeps its bit-exact DuckDB oracle (corr_matrix)."""
    import pandas as pd

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pdf = con.execute(
        f"SELECT {', '.join(cols)} FROM lineitem"
    ).fetch_df()
    out = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            x, y = cols[i], cols[j]
            both = pdf[[x, y]].dropna()
            n = len(both)
            xv = both[x].astype(float).to_numpy()
            yv = both[y].astype(float).to_numpy()
            corr = None
            if n >= 2:
                sx, sy = xv.sum(), yv.sum()
                qxx = (xv * xv).sum()
                qyy = (yv * yv).sum()
                qxy = (xv * yv).sum()
                num = n * qxy - sx * sy
                vx = n * qxx - sx * sx
                vy = n * qyy - sy * sy
                if vx > 0 and vy > 0:
                    corr = _fround(num / math.sqrt(vx * vy), 6)
            out.append((x, y, n, corr))
    return pd.DataFrame(out, columns=["col_x", "col_y", "n", "corr"])


# name -> (twin fn, compare opts). float_atol=None means the exact
# repr canon (the driver gate); drop_cols are derived columns excluded
# from the tolerant compare (documented per twin).
PY_TWINS: Dict[str, Tuple[Callable[[Any], Any], Dict[str, Any]]] = {
    "compression_ratio": (twin_compression_ratio, {}),
    "bpe_merges": (twin_bpe_merges, {}),
    "unigram_tokenize": (twin_unigram_tokenize, {}),
    "rouge_l": (twin_rouge_l, {}),
    "quality_classifier": (
        twin_quality_classifier,
        # Java Math.exp vs C libm in the GD sigmoid: 1-ulp residual
        # drift → ~1e-6-scale weight drift; 'keep' (margin>0) could
        # flip only within the same drift of 0, so it is excluded
        {"float_atol": 1e-3, "drop_cols": ["keep"]},
    ),
    "embedding_pca": (twin_embedding_pca, {}),
    "corr_matrix_fast": (twin_corr_matrix_fast, {"float_atol": 1e-5}),
    "spearman_fast": (twin_spearman_fast, {"float_atol": 1e-5}),
}
