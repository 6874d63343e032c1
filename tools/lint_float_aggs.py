"""Corpus lint: no hash-unstable float aggregate may reach the driver.

The driver's correctness gate hashes exact output values; DuckDB and
Spark sum doubles in different orders, so an UNROUNDED ``sum``/``avg``
over a DOUBLE column differs in the low-order bits between engines and
flakes the hash whenever a layout change reorders additions (this broke
``bucketed_join`` in round 8). FIXTURES.md rule 2 is the spec: money /
measure aggregates are compared after rounding to a declared scale.

This lint statically walks every entry of ``oracle_sql()`` and flags any
``sum(`` / ``avg(`` / ``stddev`` / ``var_`` application whose argument
mentions a known DOUBLE fixture column (or an arithmetic expression over
one) and is not wrapped in a ``round(...)`` / cast-to-int at any
enclosing level.  Known-stable constructs (min/max, count, single-row
values) pass untouched.

Run standalone (``python tools/lint_float_aggs.py``) or via
tests/test_scale.py::test_no_unrounded_float_aggregates.
"""
from __future__ import annotations

import re
import sys

# DOUBLE columns whose values are NOT integer-valued (TESTDATA.md).
# l_quantity is integers-stored-as-double: its sums/avgs are EXACT in
# binary double (integers < 2^53 add associatively), so they are
# hash-stable without rounding and intentionally absent here.
DOUBLE_COLS = {
    "l_extendedprice", "l_discount", "l_tax",
    "o_totalprice", "c_acctbal", "s_acctbal", "p_retailprice",
    "value", "quality_score", "score", "embedding", "vec",
    # subquery aliases the TPC-H oracles give double expressions —
    # sums over these escaped the lint until r10, when the strict
    # differential caught q07/q09 failing the hash gate on last-ulp
    # summation drift (`sum(volume)` / `sum(amount)` unrounded)
    "volume", "amount", "revenue", "profit",
}

UNSTABLE_FUNCS = r"(?:sum|avg|mean|stddev(?:_pop|_samp)?|var(?:iance|_pop|_samp)?|covar(?:_pop|_samp)?|corr)"

# An aggregate is SAFE if wrapped (at any enclosing depth) in one of
# these canonicalizers before reaching the output. ``cast`` counts
# ONLY when it lands on an integer grid (checked in _is_wrapped) — a
# cast to DOUBLE/VARCHAR passes the value through hash-unstable.
SAFE_WRAPPERS = r"(?:round|floor|ceil|ceiling|trunc|sign)\s*\(|cast\s*\("
_INT_CAST = r"AS\s+(?:INT|INTEGER|BIGINT|LONG|SMALLINT|TINYINT|HUGEINT)\b"


def _find_matching_paren(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return len(s) - 1


def _mentions_double_col(arg: str) -> bool:
    toks = set(re.findall(r"[a-zA-Z_][a-zA-Z0-9_]*", arg.lower()))
    return bool(toks & DOUBLE_COLS)


def _is_wrapped(sql: str, agg_start: int) -> bool:
    """True if a safe canonicalizer opens before agg_start and closes
    after the aggregate's closing paren (i.e. the agg is inside it)."""
    # find the aggregate call's extent
    open_idx = sql.index("(", agg_start)
    close_idx = _find_matching_paren(sql, open_idx)
    for m in re.finditer(SAFE_WRAPPERS, sql[:agg_start], re.IGNORECASE):
        w_open = sql.index("(", m.start())
        w_close = _find_matching_paren(sql, w_open)
        if w_close <= close_idx:
            continue  # wrapper closes before the aggregate does
        if sql[m.start():m.start() + 4].lower() == "cast":
            # only an integer-target cast canonicalizes the value
            if not re.search(_INT_CAST, sql[w_open:w_close + 1],
                             re.IGNORECASE):
                continue
        return True
    # cast AFTER: "sum(x)::int" or the whole expr divided then rounded
    tail = sql[close_idx + 1:close_idx + 24].lstrip()
    if tail.startswith("::int") or tail.startswith("::bigint"):
        return True
    return False


def lint_sql(name: str, sql: str) -> list[str]:
    violations = []
    # strip string literals so column-like words inside them don't trip
    stripped = re.sub(r"'[^']*'", "''", sql)
    for m in re.finditer(rf"\b{UNSTABLE_FUNCS}\s*\(", stripped,
                         re.IGNORECASE):
        open_idx = stripped.index("(", m.start())
        close_idx = _find_matching_paren(stripped, open_idx)
        arg = stripped[open_idx + 1:close_idx]
        if not _mentions_double_col(arg):
            continue
        if _is_wrapped(stripped, m.start()):
            continue
        snippet = re.sub(r"\s+", " ", stripped[m.start():close_idx + 1])
        violations.append(f"{name}: unrounded `{snippet[:90]}`")
    return violations


# ``round()`` is NOT a terminal canonicalizer for values that can
# straddle zero: DuckDB's round() preserves the sign of a tiny
# negative (round(-2.45e-07, 6) = -0.0) while Spark's returns +0.0,
# and the driver's exact-hash gate sees the difference — this is how
# the r9 sweep turned stats_agg RED while this very lint blessed it.
# The required normalizer is ``+ 0.0`` right after the round (IEEE:
# -0.0 + 0.0 = +0.0; a no-op for every other value). Detectable
# straddle-zero shapes: the signed statistical aggregates,
# log/log-ratio expressions (PMI, DSIR importance), and
# division-by-sqrt forms (z-statistics, standardized scores, cosine
# similarities — `x / sqrt(v)` is signed whenever x is).
#: NOTE the lint is a heuristic, not the gate: plain signed
#: DIFFERENCES (round(avg(a - b), n) and friends) are not detectable
#: by function-name shape and rely on the strict differential
#: (differential_run.py --strict) as the backstop — which is the
#: driver-grade check anyway.
ZERO_STRADDLING = (
    r"\b(?:corr|covar_pop|covar_samp|regr_slope|regr_intercept|"
    r"skewness|kurtosis|ln|log|log2|log10)\s*\("
    r"|/\s*sqrt\s*\("
)

#: the normalizer must follow the round() immediately (whitespace
#: only, any amount — line wraps included) and must be EXACTLY +0.0:
#: a digit after would be a value-changing constant, not a normalizer
_NORMALIZER_RE = re.compile(r"\s*\+\s*0\.0(?![0-9])")


def lint_signed_zero(name: str, sql: str) -> list[str]:
    violations = []
    stripped = re.sub(r"'[^']*'", "''", sql)
    for m in re.finditer(r"\bround\s*\(", stripped, re.IGNORECASE):
        open_idx = stripped.index("(", m.start())
        close_idx = _find_matching_paren(stripped, open_idx)
        arg = stripped[open_idx + 1:close_idx]
        if not re.search(ZERO_STRADDLING, arg, re.IGNORECASE):
            continue
        if _NORMALIZER_RE.match(stripped, close_idx + 1):
            continue
        snippet = re.sub(r"\s+", " ", stripped[m.start():close_idx + 1])
        violations.append(
            f"{name}: signed-zero hazard — rounded straddle-zero value "
            f"without '+ 0.0' normalizer: `{snippet[:90]}`")
    return violations


# Operators whose oracle intentionally carries an inner unrounded
# aggregate that never reaches the output unrounded — either a CTE /
# subquery intermediate that a later SELECT rounds, or a comparison
# operand (HAVING / filter threshold) where rounding would CHANGE
# semantics near the boundary instead of stabilizing them.  Each is
# verified by hand; anything not listed fails the lint.  Keyed by
# (query_name, whitespace-normalized snippet).
ALLOWLIST: set[tuple[str, str]] = {
    # cumulative-LTV CTE intermediate; output cum_ltv_per_user rounds 4
    ("cohort_ltv", "sum(value)"),
    # daily-mean intermediate; output drift_stat rounds 6
    ("cusum_changepoint", "avg(value)"),
    # mu/sd feed the z expression, which rounds 6 before the filter
    ("events_anomaly", "avg(value)"),
    ("events_anomaly", "stddev_samp(value)"),
    # per-user x intermediate; output gini rounds 6
    ("gini_value_concentration", "sum(value)"),
    # HAVING threshold comparison (engine-internal, boundary-stable);
    # the SELECT output supp_value is rounded to 2
    ("q11", "sum(l_extendedprice * (1 - l_discount))"),
    # subquery total_revenue = max(total_revenue) equality: both sides
    # of the comparison come from the SAME engine, so it is internally
    # consistent; the outer SELECT rounds the output to 2
    ("q15", "sum(l_extendedprice * (1 - l_discount))"),
    # avg-balance filter threshold; output totacctbal rounds 2
    ("q22", "avg(c_acctbal)"),
    # seed/stream CTE intermediates; output total rounds 4
    ("stream_seeded_stats", "sum(value)"),
    # per-window CTE intermediate; output total_value rounds 4
    ("stream_sink_table", "sum(value)"),
}


# Rounded straddle-zero-LOOKING expressions verified strictly positive
# by construction — the value can never land in round()'s signed-zero
# window, so the `+ 0.0` normalizer is not required. Each entry is
# hand-verified; anything not listed fails the lint. Keyed like
# ALLOWLIST: (query_name, whitespace-normalized snippet, 90-char cap).
SIGNED_ZERO_ALLOWLIST: set[tuple[str, str]] = {
    # sum of 1/ln(deg) with deg >= 2 → every term > 0
    ("adamic_adar", "round(sum(1.0 / ln(a.deg)), 6)"),
    # HLL linear-counting estimate: m*ln(m/v) with 0 < v <= m → >= 0,
    # and v == m (estimate 0) yields exact +0.0 (ln(1.0) = +0.0)
    ("approx_distinct_hll",
     "round(1024.0::DOUBLE * ln(1024.0::DOUBLE / v), 4)"),
    ("hll_by_group",
     "round(1024.0::DOUBLE * ln(1024.0::DOUBLE / v), 4)"),
    ("hll_rolling_merge",
     "round(1024.0::DOUBLE * ln(1024.0::DOUBLE / v), 4)"),
    # BM25 term: ln(1 + x) with x > 0, times positive tf factors
    ("bm25_topk",
     "round( ln(1e0 + (s.n_docs - f.df + 0.5e0) / (f.df + 0.5e0)) * "
     "t.tf * 2.2e0 / (t.tf + 1.2e0"),
    ("ranking_agreement",
     "round(sum( round( ln(1e0 + (s.n_docs - f.df + 0.5e0) / "
     "(f.df + 0.5e0)) * t.tf * 2.2e0 / (t"),
    ("ranking_agreement",
     "round( ln(1e0 + (s.n_docs - f.df + 0.5e0) / (f.df + 0.5e0)) * "
     "t.tf * 2.2e0 / (t.tf + 1.2e0"),
    # abs() of the Laplace noise → >= 0 (released_n, which straddles,
    # carries the + 0.0 normalizer)
    ("dp_noisy_counts",
     "round(abs(-2.0 * sign((( (strpos('', substr(md5(concat_ws('', "
     "event_type, user_decile)), 1"),
    # ln of a price column whose domain is > 1
    ("numeric_funcs", "round(ln(l_extendedprice), 6)"),
    # smoothed IDF: ln((n+1)/(df+1)) with df <= n → >= 0, exact +0.0
    # at df == n; the tf factor is positive
    ("tfidf_top_terms",
     "round((CAST(tc.tc AS DOUBLE) / doc_len.doc_len) * "
     "ln((n.n_docs + 1.0) / (df.df + 1.0)), 6)"),
    # exp(...) > 0 always
    ("udaf_geomean",
     "round(exp(avg(ln(len(string_split( regexp_replace(trim(lower("
     "text)), '', '', ''), ''))))),"),
    # Gumbel key: -ln(u) with u in (0, 1) → > 0
    ("weighted_sample",
     "round(-ln((((strpos('', substr(h, 1, 1)) - 1) * 268435456 + "
     "(strpos('', substr(h, 2, 1)) -"),
    # INTERMEDIATE eigenvector canonicalization, symmetric by
    # construction: the Spark side rounds with numpy (np.round) and
    # the oracle with DuckDB round() — BOTH preserve the sign of a
    # rounded-to-zero component, so the two engines' downstream
    # projections agree bit-for-bit either way. The query OUTPUT
    # (mean_score, which does straddle zero) carries the + 0.0
    # normalizer on both sides.
    ("pca_power_iteration",
     "round((CASE WHEN w.w[1] < 0 THEN -1 ELSE 1 END) * w.w[i] / "
     "sqrt(list_aggregate( list_trans"),
}


def main() -> int:
    import os

    # repo root = parent of tools/ — works from any checkout location
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    all_violations: list[str] = []
    for name, sql in sorted(oracles.items()):
        for v in lint_sql(name, sql):
            snippet = v.split("`")[1] if "`" in v else ""
            if (name, snippet) in ALLOWLIST:
                continue
            all_violations.append(v)
        for v in lint_signed_zero(name, sql):
            snippet = v.split("`")[1] if "`" in v else ""
            if (name, snippet) in SIGNED_ZERO_ALLOWLIST:
                continue
            all_violations.append(v)
    if all_violations:
        print(f"FAIL — {len(all_violations)} float-canonicalization "
              "violation(s):")
        for v in all_violations:
            print("  " + v)
        return 1
    print(f"OK — {len(oracles)} oracle entries, no unrounded float "
          "aggregates, no signed-zero hazards")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
