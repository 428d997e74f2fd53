"""Integer-overflow headroom ledger for frozen-integer moment sums.

Many queries freeze floats to integers (``CAST(ROUND(k * x) AS BIGINT)``)
so both engines aggregate exact integers and the 4dp hash cannot diverge
on float summation order. The cost is a silent failure mode at scale:
Spark's non-ANSI BIGINT SUM **wraps** on overflow while DuckDB promotes
to HUGEINT (observed for real in q456's sum(z^2), and flagged again by
round-7 advice for q447/q443/q436). An overflow past ~2^63 would pass
every small-SF gate and corrupt results only at cluster scale.

This module is the registry-wide audit of that class:

- :func:`integer_sum_args` mechanically extracts every SUM whose summand
  is integer-typed (cast to BIGINT, or a product of BIGINT-defined
  columns) from a query's oracle SQL — the oracle and the Spark plan
  implement the same arithmetic, so the oracle text is the shared-formula
  inventory.
- :data:`LEDGER` declares, for every flagged query, the worst-case
  |summand| and the cardinality of the summed relation at the declared
  100 TB scale (1e12 corpus rows), and a disposition:

  * ``ok`` — worst-case |sum| stays under 2^62 (one safety bit below the
    int64 edge); the bound is asserted by tests/test_headroom.py.
  * ``decimal38`` — the worst-case bound exceeds 2^62 before 1e12 rows;
    the accumulator must be promoted to DECIMAL(38,0) beyond the listed
    row threshold. SCALE.md's "Integer-headroom ledger" section lists
    every such query; the test keeps code, ledger, and SCALE.md in sync.
  * ``promoted`` — the bound exceeds 2^62 AND the fix has landed: both
    engines now accumulate in DECIMAL(38,0)/HUGEINT by construction, so
    the detector no longer sees a BIGINT sum. The entry is retained as
    the audit trail (what the risk was, when it was closed); the stale
    check exempts this disposition.

tests/test_headroom.py fails if a flagged query has no ledger entry, if
an ``ok`` bound exceeds 2^62, if a ``decimal38`` entry is actually safe,
or if SCALE.md's section drifts from the ledger — so a new query with an
un-audited integer moment sum cannot land.

Reference anchor: the reference pins DECIMAL(10,2) precision contracts on
its score columns (rco_synthsys_live.py:352-361); this ledger is the same
precision-contract discipline applied to our integer freezing pattern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Declared 100 TB scale model (shared with SCALE.md):
N_CORPUS = 1e12  # rows of any fact table (lineitem/orders/events/docs/embeddings)
DAYS = 4.0e3  # calendar domain
DIMS = 64  # embedding dimensionality
INT64_HEADROOM = float(2**62)  # one safety bit under the int64 edge

# Declared data value maxima (empirical sf0.1 maxima with >~20% margin):
PRICE_O = 6.0e5  # o_totalprice
PRICE_L = 1.2e5  # l_extendedprice
QTY = 50.0  # l_quantity
VALUE = 1.0e4  # events.value (empirical max ~560; wide margin)


@dataclass(frozen=True)
class HeadroomAudit:
    query: str
    moment: str  # which sum(s) this bounds, human label
    per_term: float  # worst-case |summand|
    rows: float  # worst-case cardinality of the summed relation at 100 TB
    disposition: str  # "ok" | "decimal38"
    why: str

    @property
    def bound(self) -> float:
        return self.per_term * self.rows

    @property
    def row_threshold(self) -> float:
        """Rows at which the worst-case sum hits the 2^62 headroom line."""
        return INT64_HEADROOM / self.per_term


IDENT = r"[A-Za-z_][A-Za-z_0-9.]*"


def _sum_args(sql: str) -> list[str]:
    """Balanced-paren extraction of every SUM(...) argument."""
    out = []
    for m in re.finditer(r"\bSUM\s*\(", sql, re.I):
        i = m.end()
        depth = 1
        start = i
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append(sql[start : i - 1])
    return out


def _int_defined(sql: str, ident: str) -> bool:
    """True if ``ident`` is defined as a BIGINT cast or an integer count."""
    pats = [
        rf"BIGINT\)\s*AS\s+{re.escape(ident)}\b",
        rf"COUNT\s*\([^)]*\)\s*AS\s+{re.escape(ident)}\b",
    ]
    return any(re.search(p, sql, re.I) for p in pats)


def integer_sum_args(sql: str) -> list[str]:
    """SUM arguments that accumulate in BIGINT on Spark (the wrap class).

    Two shapes: (a) any summand containing an ``AS BIGINT`` cast, and
    (b) a bare product of identifiers each defined as BIGINT/COUNT in the
    same statement. Double-typed sums are excluded — they lose precision
    symmetrically on both engines but cannot wrap.
    """
    hits = []
    for arg in _sum_args(sql):
        a = " ".join(arg.split())
        if re.search(r"AS\s+BIGINT", a, re.I):
            hits.append(a)
            continue
        m = re.fullmatch(rf"({IDENT})\s*\*\s*({IDENT})", a)
        if m and all(_int_defined(sql, g.split(".")[-1]) for g in m.groups()):
            hits.append(a)
    return hits


def flagged_queries(registry) -> dict[str, list[str]]:
    """Every registered query whose oracle has integer-typed sums."""
    out = {}
    for name, q in registry.items():
        if q.oracle:
            hits = integer_sum_args(q.oracle)
            if hits:
                out[name] = hits
    return out


def _a(query, moment, per_term, rows, disposition, why):
    return HeadroomAudit(query, moment, per_term, rows, disposition, why)


# The audit. Worst cases use full concentration (all corpus rows in one
# group/day) — deliberately pessimistic so a pass here is a guarantee.
LEDGER: dict[str, HeadroomAudit] = {
    a.query: a
    for a in [
        # ---- ok: bound fits under 2^62 at 1e12 rows --------------------
        _a("q28_simhash", "per-doc OR-sum of distinct bits j<60", 2.0**60, 1,
           "ok", "60-bit simhash: sum of distinct (1<<j), j<=59, is the mask itself < 2^60"),
        _a("q56_simhash_near_dups", "per-doc OR-sum of distinct bits j<60", 2.0**60, 1,
           "ok", "same 60-bit mask construction as q28"),
        _a("q351_shapley_attribution", "channel bitmask sum", 2.0**30, 1,
           "ok", "mask over |channels| distinct bits; event_type domain is ~5, structural cap 62 bits"),
        _a("q376_fpgrowth_itemsets", "item bitmask sum", 2.0**30, 1,
           "ok", "same bounded-bit mask as q351"),
        _a("q257_srp_distortion", "pair dots of 1e3-quantized comps; micro-cos outer sum", 1.2e6, N_CORPUS,
           "ok", "xq<=1.2e3 so xq*xq<=1.5e6 over 64 dims per pair; outer cos_mi<=1e6 over <=1e12 pairs = 1.2e18"),
        _a("q427_int8_quant_audit", "per-vec quant moments; micro-cos/mse outer sums", 1.0e6, N_CORPUS,
           "ok", "inner sums per (vec_id,label) over 64 dims; outer micro terms <=1e6 across 1e12 vecs = 1e18"),
        _a("q444_alignment_uniformity", "pair dots (64 dims); micro alignment/uniformity terms", 4.0e6, N_CORPUS,
           "ok", "au<=1e6*dist^2<=4e6; stride/block caps keep pairs <=1e12 -> 4.0e18, inside 2^62 (13% margin; tighten strides at scale)"),
        _a("q85_quantized_topk", "int8 pair dots; micro-cos outer", 1.0e6, N_CORPUS,
           "ok", "q<=128 so q*q<=1.7e4 over 64 dims; outer micro-cos <=1e6 over 1e12 pairs = 1e18"),
        _a("q373_rank_biased_overlap", "int8 pair dots in ranking", 1.7e4, DIMS * N_CORPUS,
           "ok", "q<=128; 64 dims x <=1e12 pairs = 1.1e18"),
        _a("q297_dtw_distance", "daily cents of events.value", 100 * VALUE, N_CORPUS,
           "ok", "100*value<=1e6 per row; 1e6*1e12 = 1e18 even fully concentrated"),
        _a("q303_segment_migration", "cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q323_permutation_test", "arm cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q400_bayes_ab", "purchase cents", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q415_simpsons_guard", "cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q446_wilcoxon_signed_rank", "signed cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q450_twfe_weekend", "cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q288_linear_interp", "cents of events.value", 100 * VALUE, N_CORPUS, "ok", "1e6*1e12 = 1e18"),
        _a("q316_average_precision", "micro precision terms", 1.0e6, N_CORPUS, "ok", "term<=1e6 (p*cumpos/cumall<=1); 1e18 at 1e12 ranked rows"),
        _a("q327_trend_test", "priority x midrank products", 5 * N_CORPUS, 5,
           "ok", "s<=5, r<=N; summed over the 5-value priority domain: 2.5e13"),
        _a("q331_topk_churn", "centi-quantities", 100 * QTY, N_CORPUS, "ok", "5e3*1e12 = 5e15"),
        _a("q311_order_reconciliation", "per-order gross cents", 100 * PRICE_L * 1.2, 7,
           "ok", "grouped per orderkey (<=7 lineitems): <=1e8 per order"),
        _a("q341_ses_forecast", "decayed micro daily counts", 1.0e6 * N_CORPUS, 1,
           "ok", "sum_t 1e6*x_t*decay_t <= 1e6*sum x_t = 1e6*N = 1e18 (decay<=1)"),
        _a("q359_forecast_eval", "decayed micro daily counts", 1.0e6 * N_CORPUS, 1,
           "ok", "same telescoping bound as q341: <=1e6*N = 1e18"),
        _a("q393_brown_double_smoothing", "double-smoothed micro daily counts", 2.0e6 * N_CORPUS, 1,
           "ok", "level s1<=1e6*max daily count<=1e18; second pass <= 2*s1_max = 2e18 (tight: 43% of 2^62)"),
        _a("q397_source_jsd", "micro JSD terms", 7.0e5, N_CORPUS,
           "ok", "1e6*p*ln(2p/(p+q)) <= 1e6*ln2 per vocab row; 7e17 at 1e12 vocab rows"),
        _a("q389_markov_stationary", "micro transition-probability mass", 1.0e6, 400,
           "ok", "p<=1e6, c/r<=1; summed over the channel-pair grid, plus raw counts <=N"),
        _a("q347_textrank_keywords", "integer pagerank mass transfer", 1.0e12, 1.0e6,
           "ok", "rank mass conserved: sum r = 1e6*|vocab|; per-node in-sum <= total mass 1e12 over <=1e6 vocab nodes = 1e18"),
        _a("q428_good_turing", "count-of-counts identity", N_CORPUS, 1,
           "ok", "sum r*n_r == total tokens N = 1e12 exactly (identity bound)"),
        _a("q419_lorenz_table", "cents histogram mass", 100 * VALUE, N_CORPUS,
           "ok", "sum nu*cents <= max(cents)*sum(nu) = 1e6*1e12 = 1e18"),
        _a("q434_cochran_armitage", "centi-discount moments", (100 * 0.1) ** 2, N_CORPUS,
           "ok", "(100*discount)^2 <= 100; 1e14 at 1e12 rows"),
        _a("q442_rmst", "micro survival rectangles", 1.0e6 * DAYS, DAYS,
           "ok", "1e6*s*dur <= 1e6*4e3 per life-table row; day-grain table <=4e3 rows"),
        _a("q447_burrows_delta", "1e6-frozen relative-frequency moments", 1.0e12, 1.0e6,
           "ok", "fu<=1e6 (round-8 coarsening from 1e9) so fu^2<=1e12; <=1e6 sources -> 1e18"),
        _a("q453_sql_unpivot", "quantity units (price cents audited separately below)", QTY, N_CORPUS,
           "ok", "SUM(l_quantity) <= 50*1e12 = 5e13; see decimal38 entry q453 note in SCALE.md for the cents leg"),
        _a("q459_yuen_trimmed_t", "cents x kept-count trim sums (squared leg is HUGEINT/DECIMAL(38) by construction)", 100 * VALUE, N_CORPUS,
           "ok", "sum_v v*kept_v <= max(cents)*N = 1e6*1e12 = 1e18; trim_ss accumulates v^2*kept in HUGEINT (<=1e12*1e12=1e24 < 1e38)"),
        _a("q463_msprt", "signed cents of events.value", 100 * VALUE, N_CORPUS,
           "ok", "1e6*1e12 = 1e18 (q446's class)"),
        _a("q469_coral_drift", "micro-component products (HUGEINT/DECIMAL(38) accumulators by construction)", 2.8e11, N_CORPUS,
           "decimal38", "|x|<=5.3e5 micro so x_i*x_j<=2.8e11 -> 2^62 at ~1.6e7 vectors; both engines already accumulate in DECIMAL(38)/HUGEINT (2.8e23 at 1e12 vectors < 1e38)"),
        _a("q475_breslow_day", "1e6-frozen per-stratum MH terms a*d/n <= N/4", 1e6 * N_CORPUS / 4, 7,
           "ok", "<=7 ship-year strata x 1e6*N/4 = 1.75e18 (38% margin; lower the freeze to 1e4 beyond 1e12 lines)"),
        _a("q476_chow_test", "daily purchase cents", 100 * VALUE, N_CORPUS,
           "ok", "1e6*1e12 = 1e18 (q446's class); t/y cross moments accumulate in HUGEINT/DECIMAL(38)"),
        _a("q478_croston", "daily quantity sums + telescoping dyadic SES terms", 1.0e6 * 50, N_CORPUS / DAYS,
           "ok", "sum qty <= 50*N = 5e13; SES terms <= 1e6*max daily z ~ 1.25e16 (q341's telescoping bound)"),
        _a("q496_canonical_doc_selection", "per-doc OR-sum of distinct bits j<60", 2.0**60, 1,
           "ok", "q56's 60-bit simhash mask construction (sum of distinct (1<<j) is the mask itself)"),
        _a("q500_dedup_funnel", "per-doc OR-sum of distinct bits j<60 (stage-4 simhash tier)", 2.0**60, 1,
           "ok", "same q56 mask construction; every other funnel sum is a token/doc count <= N"),
        _a("q497_hoeffdings_d", "daily order cents (T2 rank products HUGEINT/DECIMAL(38) by construction)", 100 * PRICE_O, N_CORPUS,
           "decimal38", "cents leg: 6e7 per row -> 2^62 at ~7.7e10 orders in one day (q431's class); T2 <= days*(2*days)^4 = 1.6e19 at the 4e3-day calendar wraps int64, so both engines accumulate it wide; T1 <= 4e3*(1.6e4)^2 ~ 1e12 and T3 <= 4e3*(8e3)^2*1.6e4 ~ 4e15 stay under 2^62"),
        _a("q498_theils_u", "1e6-frozen micro-nat entropy terms", 1.0e6 * N_CORPUS * 28, 1,
           "decimal38", "1e6*m*ln(N/m) with m<=N=1e12: one language-marginal term reaches 2.8e19 > 2^62 — promote the h6 accumulators to DECIMAL(38)/HUGEINT past ~1.6e11 docs (q371's single-term class)"),
        # ---- decimal38: exceeds 2^62 before 1e12 rows ------------------
        _a("q471_ansari_bradley", "1e8-frozen block score sums (a8 <= 1e8*N^2/2; q8 <= 1e8*N^3/4)", 5e7 * N_CORPUS**2, 1,
           "promoted", "a8 passed 2^62 at ~1e6 purchase rows (round-8 advice, lowest threshold the ledger ever held); closed round 9 — a8/q8/sa and the T(x) block scores all accumulate in DECIMAL(38)/HUGEINT with exact parity-split halving; residual limit is the 1e8 freeze grid vs DECIMAL(38) (~1e11 rows for q8) — lower the grid beyond"),
        _a("q472_jonckheere_terpstra", "jt2 OUTPUT cast (internal sums HUGEINT/DECIMAL(38) since round 8)", N_CORPUS**2 / 2, 1,
           "promoted (output)", "2*JT ~ N^2/2 exceeds int64 at ~4.3e9 orders; accumulation was wide from round 8, and round 10 shipped the output leg too: jt2 is emitted as the exact DECIMAL(38,0)/HUGEINT rendered to a decimal string on BOTH engines (the only pandas-roundtrip-exact encoding — DuckDB .df() collapses HUGEINT to float64), so the column is now overflow-free to the 38-digit ceiling (~1e19 orders)"),
        _a("q484_lepage", "q471's 1e8-frozen AB score sums + doubled mid-rank sums", 5e7 * N_CORPUS**2, 1,
           "promoted", "same bound family as q471 (a8 ~ 1e8*N^2/2); closed round 9 alongside q471 — a8/q8/sa/w2 per-term wide, exact parity-split halving in T(x)"),
        _a("q491_conover_squared_ranks", "squared doubled-mid-rank score sums (HUGEINT/DECIMAL(38) by construction)", 16 * N_CORPUS**4, N_CORPUS,
           "promoted", "s4 = (2r)^2 <= 4N^2 and the D^2 leg sums c*s4^2 <= 16N^5 — wide from day one, but even DECIMAL(38) saturates past ~6e7 rows: beyond, coarsen to classical scores (s4/4) or accumulate the variance leg in double (D^2 feeds only a ratio; 4dp-safe)"),
        _a("q492_brunner_munzel", "placement-difference moments c*d^2 (HUGEINT/DECIMAL(38) by construction)", 4 * N_CORPUS**2, N_CORPUS,
           "promoted", "d = 2R_pool - 2R_within <= 2N so sum c*d^2 <= 4N^3 = 4e36 at 1e12 rows — inside DECIMAL(38), above 2^62, wide accumulators from day one"),
        _a("q494_anderson_darling_2s", "1e9-frozen per-value AD terms (HUGEINT/DECIMAL(38) by construction)", 1.0e9 * N_CORPUS, N_CORPUS,
           "promoted", "frozen term ~ 1e9*l*(q/den) with the uncentered worst case O(1e9*l*N); wide accumulators from day one, and past ~1e9 rows lower the 1e9 freeze grid (q462's knob)"),
        _a("q477_theta_forecast", "t*x daily cross moments (HUGEINT/DECIMAL(38) accumulators by construction)", DAYS * N_CORPUS, DAYS,
           "decimal38", "t*x <= 4e3*1e12 per day over 4e3 days = 1.6e19 > 2^62; both engines already accumulate in DECIMAL(38)/HUGEINT"),
        _a("q483_sql_udf", "extendedprice cents", 100 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e7 per row -> 2^62 at ~3.8e11 lineitems (q453's cents leg class)"),
        _a("q174_rolling_correlation", "daily click x purchase count products", N_CORPUS**2, 1,
           "decimal38", "products of per-day counts: overflow once a daily count passes ~2.1e9 (sqrt 2^62)"),
        _a("q220_seasonal_decompose", "1e4-frozen events.value", 1.0e8, N_CORPUS,
           "decimal38", "1e4*value<=1e8 per row -> 2^62 at ~4.6e10 rows"),
        _a("q224_neyman_sample", "squared centi-acctbal", 1.2e12, 2.5e10,
           "decimal38", "cb<=1.1e6 so cb^2<=1.2e12 -> 2^62 at ~3.8e6 customers per stratum"),
        _a("q226_embedding_drift", "squared 1e4-frozen components per dim", 1.0e8, N_CORPUS,
           "decimal38", "xi^2<=1e8 summed across vectors per dim -> 2^62 at ~4.6e10 vectors"),
        _a("q229_cuped_adjustment", "1e4-frozen events.value", 1.0e8, N_CORPUS,
           "decimal38", "1e8 per row -> 2^62 at ~4.6e10 rows (the originally-documented instance of this class)"),
        _a("q237_bootstrap_ci", "order totalprice cents", 100 * PRICE_O, N_CORPUS,
           "decimal38", "6e7 per row -> 2^62 at ~7.7e10 orders"),
        _a("q239_tokenizer_fertility", "word-count x token-count products", N_CORPUS**2, 1,
           "decimal38", "products of corpus counts: overflow once c*n_tokens passes 2^63 (~counts of 3e9 each)"),
        _a("q242_ipw_effect", "1e4-frozen events.value", 1.0e8, N_CORPUS,
           "decimal38", "1e8 per row -> 2^62 at ~4.6e10 rows"),
        _a("q248_ewma_control", "1e4-frozen events.value", 1.0e8, N_CORPUS,
           "decimal38", "1e8 per row -> 2^62 at ~4.6e10 rows"),
        _a("q280_cohens_kappa", "n_gold x n_pred count products", N_CORPUS**2, 1,
           "decimal38", "single product of two corpus counts wraps at ~3e9 docs per language side"),
        _a("q281_abc_classes", "1e4-frozen net revenue", 1.0e4 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e9 per row -> 2^62 at ~3.8e9 lineitems"),
        _a("q291_covariate_balance", "squared cents of events.value", 1.0e12, N_CORPUS,
           "decimal38", "(100*value)^2<=1e12 -> 2^62 at ~4.6e6 rows per arm at the declared value bound (empirical values are ~20x smaller; still promote)"),
        _a("q296_joinsize_estimate", "sum of squared per-key counts", N_CORPUS**2, 1,
           "decimal38", "the join-size estimate sum n_k^2 IS quadratic: overflow once one key passes ~2.1e9 rows"),
        _a("q298_exact_ols", "syy = squared rounded extendedprice", PRICE_L**2, N_CORPUS,
           "decimal38", "1.4e10 per row -> 2^62 at ~3.2e8 lineitems"),
        _a("q300_powerlaw_alpha", "count-of-count x log-frequency products", N_CORPUS * 2.8e7, 1,
           "decimal38", "m<=N and lnk<=1e6*ln(N)~2.8e7: single term wraps at m~3.3e11"),
        _a("q312_jackknife_cv_se", "squared cents of events.value", 1.0e12, N_CORPUS,
           "decimal38", "x^2<=1e12 -> 2^62 at ~4.6e6 rows per fold at declared bound"),
        _a("q334_partial_correlation", "squared per-day frozen sums", (1.0e6 * N_CORPUS / DAYS) ** 2, DAYS,
           "decimal38", "daily totals square: overflow once a daily frozen total passes ~2.1e9"),
        _a("q338_jarque_bera", "squared cents of events.value", 1.0e12, N_CORPUS,
           "decimal38", "v^2<=1e12 -> 2^62 at ~4.6e6 rows at declared bound (higher moments go through the same sums)"),
        _a("q340_durbin_watson", "squared daily-count residuals", N_CORPUS**2, 1,
           "decimal38", "e is a residual of daily counts: e^2 wraps once a daily count passes ~2.1e9"),
        _a("q353_tukey_hsd", "within-group squared cents", 1.0e12, N_CORPUS,
           "decimal38", "sxx accumulates (100*value)^2 -> 2^62 at ~4.6e6 rows per group at declared bound"),
        _a("q354_dispersion_test", "squared per-group counts", N_CORPUS**2, 1,
           "decimal38", "x is a group count: x^2 wraps once a group passes ~2.1e9 rows"),
        _a("q357_gini_stump_scan", "squared class counts", N_CORPUS**2, 1,
           "decimal38", "c^2 wraps once a (dim,side,label) cell passes ~2.1e9 rows"),
        _a("q362_anomaly_ensemble", "squared daily counts", N_CORPUS**2, 1,
           "decimal38", "x^2 wraps once a daily count passes ~2.1e9"),
        _a("q371_lm_model_selection", "micro log-likelihood terms", 1.0e6 * N_CORPUS * 28, 1,
           "decimal38", "1e6*c*|ln(c/n)| with c<=N: single term wraps near c~3e11"),
        _a("q378_hurst_exponent", "squared window counts", N_CORPUS**2, 1,
           "decimal38", "x^2 wraps once a window count passes ~2.1e9"),
        _a("q382_price_index", "extendedprice cents", 100 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e7 per row -> 2^62 at ~3.8e11 lineitems"),
        _a("q386_ipf_raking", "count x micro-weight products", N_CORPUS * 1.0e9, 1,
           "decimal38", "n*w with n<=N and raked micro-weight w up to ~1e9: wraps once n*w passes 2^63"),
        _a("q405_embedding_norms", "micro per-vector norms (outer mean)", 8.0e6, N_CORPUS,
           "decimal38", "norm_micro<=8e6 (64-dim unit comps) x 1e12 vectors = 8e18 > 2^62; threshold ~5.8e11 vectors"),
        _a("q417_binary_segmentation", "squared segment counts", N_CORPUS**2, 1,
           "decimal38", "x^2 wraps once a segment count passes ~2.1e9"),
        _a("q420_adstock", "squared daily adstock/conversion totals", N_CORPUS**2, 1,
           "decimal38", "regression moments of daily totals square: wraps once a daily total passes ~2.1e9"),
        _a("q424_supplier_hhi", "net revenue cents per supplier", 100 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e7 per row -> 2^62 at ~3.8e11 lineitems"),
        _a("q431_kendall_tau_daily", "daily totalprice cents", 100 * PRICE_O, N_CORPUS,
           "decimal38", "6e7 per row -> 2^62 at ~7.7e10 orders concentrated into one day"),
        _a("q433_holt_winters", "daily totalprice cents (recursion input)", 100 * PRICE_O, N_CORPUS,
           "decimal38", "same daily-cents base as q431; HW state itself stays at daily-total scale"),
        _a("q436_ols_influence", "syy = squared rounded extendedprice", PRICE_L**2, N_CORPUS,
           "decimal38", "1.4e10 per row -> 2^62 at ~3.2e8 lineitems (round-7 advice item)"),
        _a("q443_mediation_sobel", "squared rounded extendedprice moments", PRICE_L**2, N_CORPUS,
           "decimal38", "smm2 = sum m^2, m<=1.2e5 -> 2^62 at ~3.2e8 lineitems (round-7 advice item)"),
        _a("q445_forecast_reconciliation", "decayed micro per-segment daily cents", 1.0e6 * 100 * PRICE_O, N_CORPUS,
           "decimal38", "1e6 * xu with xu a daily cents total: wraps once a daily total passes ~4.6e12 cents"),
        _a("q448_temperature_scaling", "squared cents of events.value", 1.0e12, N_CORPUS,
           "decimal38", "c^2<=1e12 -> 2^62 at ~4.6e6 rows at declared bound (empirical ~20x smaller; still promote)"),
        _a("q452_group_by_all", "order totalprice cents", 100 * PRICE_O, N_CORPUS,
           "decimal38", "6e7 per row -> 2^62 at ~7.7e10 orders"),
        _a("q453_sql_unpivot", "extendedprice cents", 100 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e7 per row -> 2^62 at ~3.8e11 lineitems"),
        _a("q454_parameterized_sql", "net revenue cents", 100 * PRICE_L, N_CORPUS,
           "decimal38", "1.2e7 per row -> 2^62 at ~3.8e11 lineitems"),
        _a("q456_breusch_pagan", "kilo-dollar^2 residual moments", 1.0e12, N_CORPUS,
           "decimal38", "the query that exposed the class; SCALE.md documents the DECIMAL(38) switch beyond ~1e9 rows"),
        _a("q62_pca_project", "1e4-frozen component covariance sums", 1.0e8, N_CORPUS,
           "decimal38", "xi^2<=1e8 per component pair -> 2^62 at ~4.6e10 vectors"),
    ]
}

# q453 appears twice conceptually (quantity leg ok, cents leg decimal38);
# the dict keeps the decimal38 entry (last writer) — the binding one.


def decimal38_queries() -> list[HeadroomAudit]:
    return sorted(
        (a for a in LEDGER.values() if a.disposition == "decimal38"),
        key=lambda a: a.query,
    )


def promoted_queries() -> list[HeadroomAudit]:
    # "promoted" = the wide accumulators landed; "promoted (output)" =
    # additionally the OUTPUT column itself is emitted at full width
    # (q472, round 10). Both are closed risks and render together.
    return sorted(
        (a for a in LEDGER.values() if a.disposition.startswith("promoted")),
        key=lambda a: a.query,
    )


def scale_md_lines() -> list[str]:
    """The SCALE.md 'Integer-headroom ledger' bullet list, generated so
    the doc cannot drift from the ledger (tests/test_headroom.py diffs)."""
    lines = []
    for a in decimal38_queries():
        lines.append(f"- **{a.query}** — {a.moment}: {a.why}.")
    for a in promoted_queries():
        lines.append(f"- **{a.query}** [PROMOTED — wide accumulators landed] — {a.moment}: {a.why}.")
    return lines
