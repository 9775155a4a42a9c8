"""Registry-wide vacuity gate (VERDICT r9 ask #4, standing).

The r9 one-off audit found four vacuous gates in a registry that was 100%
hash-green — a query can "pass" forever while its output checks nothing
(all-NULL metric, zero rows, identically-zero flag). This gate re-runs
that audit every suite run: collect EVERY registry query at sf0.001 and
fail on any zero-row result, all-NULL column, or all-zero numeric column
that is not in the triaged allowlist below. The allowlist is
two-directional: a flag without an entry fails (new vacuous gate), and an
entry that no longer flags fails (stale triage — keep the list tight).

Every allowlist entry carries its triage: either the zero is REAL
(identity-checked estimator gaps, true minima, honest negatives on the
clean fixture — with the data-limited TRUE path pinned by a
synthetic-pathology pytest through the factored production expression),
or it is tiny-scale-only (verified non-vacuous at sf0.1 during r10
triage, noted per entry).
"""

from __future__ import annotations

import decimal

import pytest

from cl_tagger_batch_processing_spark.registry import QUERIES

# (query, kind, column) -> why it is benign AT sf0.001.
ALLOWLIST: dict[tuple[str, str, str], str] = {
    ("pipeline_score_tag", "ALL_NULL", "error"): (
        "success path: error is NULL for every record the scorer handled"
    ),
    ("privacy_generalization_sweep", "ALL_ZERO", "anonymous_frac"): (
        "no generalization level reaches k on 1.5k rows; 4/4 nonzero at sf0.1"
    ),
    ("stream_watchlist_cms", "ALL_ZERO", "overestimate"): (
        "identity-checked estimator gap (est - exact), pinned by equality tests"
    ),
    ("dedup_exact_incremental_bloom", "ALL_ZERO", "n_bloom_maybe"): (
        "no Bloom false positives on 500 docs; 4/5 nonzero at sf0.1"
    ),
    ("graph_components", "ALL_ZERO", "component_id"): (
        "single giant component labeled by min id 0 (self-similar fixture); "
        "nonzero ids at sf0.1"
    ),
    ("graph_modularity", "ALL_ZERO", "community"): (
        "single community labeled 0 at sf0.001; nonzero at sf0.1"
    ),
    ("graph_modularity", "ALL_ZERO", "contribution"): (
        "one community => Q = 0 by the formula (e_11 - a_1^2 = 0); the "
        "textbook cross-check pins the formula; nonzero at sf0.1"
    ),
    ("graph_modularity", "ALL_ZERO", "modularity_q"): (
        "same single-community Q = 0; nonzero at sf0.1"
    ),
    ("graph_lpa_communities", "ALL_ZERO", "community"): (
        "single label-0 community at sf0.001; nonzero at sf0.1"
    ),
    ("privacy_k_anonymity", "ALL_ZERO", "is_k_anonymous"): (
        "every group is under k on 1.5k rows; 1346/1375 pass at sf0.1"
    ),
    ("q7_volume_shipping", "ZERO_ROWS", ""): (
        "nation-pair x shipdate-range predicate empty at sf0.001 only; "
        "14 rows at sf0.01 (the driver compare scale), 14 at sf0.1"
    ),
    ("q8_market_share", "ALL_ZERO", "mkt_share"): (
        "target-nation share is a true 0 at sf0.001; 7/7 nonzero at sf0.1"
    ),
    ("events_json_extract", "ALL_ZERO", "min_k"): "a real minimum of 0",
    ("corpus_pack_sequences", "ALL_ZERO", "window_id"): (
        "short docs pack into chunk 0 at sf0.001; 120/140 nonzero at sf0.1"
    ),
    ("stream_sink_parquet", "ALL_ZERO", "min_user_id"): "a real minimum of 0",
    ("dq_checks_report", "ALL_ZERO", "n_violations"): (
        "honest negative: the synthetic fixture is clean by construction"
    ),
    ("text_token_count", "ALL_ZERO", "n_digit_tokens"): (
        "clean-fixture zero; TRUE path pinned by "
        "test_token_count_classes_on_synthetic_text"
    ),
    ("text_token_count", "ALL_ZERO", "n_punct_tokens"): (
        "clean-fixture zero; TRUE path pinned by "
        "test_token_count_classes_on_synthetic_text"
    ),
    ("q21_waiting_suppliers", "ZERO_ROWS", ""): (
        "multi-supplier-order + late-supplier predicate empty at sf0.001 "
        "only; 3 rows at sf0.01 (driver scale), 31 at sf0.1"
    ),
    ("text_heavy_hitters_cms", "ALL_ZERO", "overestimate"): (
        "identity-checked estimator gap (est - exact), pinned by equality tests"
    ),
    ("events_bot_detection", "ALL_ZERO", "is_bot"): (
        "honest negative: only the volume flag can fire on the organic "
        "fixture (max hourly peak 4, min type diversity 5 at every scale); "
        "TRUE path pinned by test_bot_detection_fires_on_synthetic_bot "
        "through the factored relational.bot_verdict"
    ),
    ("er_blocking_pairs", "ALL_ZERO", "lev_dist"): (
        "whole-word name edits exceed the <=2 threshold by construction; "
        "the union-find cross-check pins the closure"
    ),
    # --- ALL_FALSE triage (ADVICE r10: identically-False boolean flags) ---
    ("events_ks_test", "ALL_FALSE", "reject_equal_05"): (
        "honest negative: view and click values draw from the same "
        "generator at every scale; TRUE path pinned by "
        "test_ks_and_mw_reject_on_synthetic_shifted_distributions "
        "through the full production query"
    ),
    ("events_mann_whitney", "ALL_FALSE", "reject_equal_05"): (
        "same-generator fixture as the KS triage; TRUE path pinned by "
        "test_ks_and_mw_reject_on_synthetic_shifted_distributions"
    ),
    ("text_gopher_flags", "ALL_FALSE", "flag_too_long"): (
        "clean-fixture honest negative; TRUE path pinned by "
        "test_gopher_flags_fire_on_synthetic_pathologies through the "
        "factored _gopher_flagged"
    ),
    ("text_gopher_flags", "ALL_FALSE", "flag_word_len"): (
        "clean-fixture honest negative; same synthetic-pathology pin"
    ),
    ("text_gopher_flags", "ALL_FALSE", "flag_repetition"): (
        "clean-fixture honest negative; same synthetic-pathology pin"
    ),
    ("events_tukey_hsd", "ALL_FALSE", "reject_hsd_05"): (
        "honest negative: every event type draws values from the same "
        "generator at every scale (the KS/MW triage); TRUE path pinned by "
        "test_tukey_rejects_on_synthetic_shifted_groups through the full "
        "production query"
    ),
    ("events_tukey_hsd", "ALL_FALSE", "reject_anova_05"): (
        "same-generator fixture; same synthetic shifted-groups pin"
    ),
    ("events_granger_lite", "ALL_FALSE", "granger_reject_05"): (
        "honest negative: the organic fixture has no lead-lag structure "
        "(F ~ 0.02-1.0 across scales); TRUE path pinned by "
        "test_granger_rejects_on_synthetic_leading_series through the "
        "full production query"
    ),
    ("events_bh_fdr", "ALL_FALSE", "reject_fdr_05"): (
        "honest negative: weekend and weekday values draw from the same "
        "generator at every scale (the KS/MW triage); TRUE path pinned by "
        "test_bh_fdr_rejects_on_synthetic_weekend_shift through the full "
        "production query"
    ),
    ("events_power_analysis", "ALL_FALSE", "powered"): (
        "honest negative at sf0.001 (8/7 users per arm vs >=212 required "
        "at the widest MDE); the 10%-MDE row is powered=true at sf0.1 "
        "(750 users vs 224 required) — tiny-scale-only, the q21 triage "
        "form"
    ),
    # --- r12 addition triage -------------------------------------------
    ("events_mann_kendall", "ALL_FALSE", "trend_significant_05"): (
        "honest negative: the fixture's daily counts are stationary at "
        "every scale; TRUE path pinned by "
        "test_mann_kendall_detects_synthetic_trend through the full "
        "production query"
    ),
    ("events_mcnemar", "ALL_ZERO", "lapsed_then_conv"): (
        "honest zero at sf0.001 (1.5k events: one repeat-purchaser "
        "lapses, none convert; both sides nonzero at sf0.01/sf0.1 — "
        "b=17/c=15 at sf0.1); TRUE path pinned by "
        "test_mcnemar_counts_synthetic_discordant_users"
    ),
    ("events_mcnemar", "ALL_ZERO", "chi2_cc"): (
        "honest zero at sf0.001: the lone discordant pair (b=1, c=0) "
        "yields (|1-0|-1)^2/1 = 0 under the continuity correction — the "
        "statistic's true value; nonzero at sf0.01/sf0.1 and pinned "
        "nonzero by test_mcnemar_counts_synthetic_discordant_users"
    ),
    ("events_mcnemar", "ALL_FALSE", "reject_homogeneity_05"): (
        "honest negative: conversion is not drifting between fixture "
        "halves at any scale; TRUE path pinned by "
        "test_mcnemar_counts_synthetic_discordant_users"
    ),
    ("events_odds_ratio_ci", "ALL_FALSE", "haldane_corrected"): (
        "honest negative: all four 2x2 cells are populated at every "
        "scale; the zero-cell TRUE path is pinned by "
        "test_odds_ratio_haldane_on_synthetic_zero_cell"
    ),
    ("events_welch_anova", "ALL_ZERO", "k_dropped"): (
        "honest zero: every fixture event type has n>=2 and positive "
        "variance at every scale; the degenerate-group TRUE path is "
        "pinned by test_welch_anova_drops_synthetic_constant_group"
    ),
    ("events_brown_forsythe", "ALL_ZERO", "k_dropped"): (
        "honest zero: every fixture event type has n>=2 at every scale; "
        "the singleton-drop TRUE path is pinned by "
        "test_brown_forsythe_detects_synthetic_variance_gap"
    ),
    ("events_cochran_armitage", "ALL_FALSE", "reject_no_trend_05"): (
        "honest negative: the fixture's purchase share has no day-of-week "
        "trend by construction (z = -0.54/-0.94 at sf0.001/sf0.01); the "
        "monotone-trend TRUE path is pinned by "
        "test_cochran_armitage_detects_synthetic_trend"
    ),
    ("events_jonckheere_terpstra", "ALL_FALSE", "reject_increasing_05"): (
        "honest negative: the fixture's value distribution has no "
        "day-of-week ordering by construction (z = +0.37 at sf0.01); the "
        "ordered-shift TRUE path is pinned by "
        "test_jonckheere_detects_synthetic_ordered_shift"
    ),
    ("text_heaps_law_fit", "ALL_ZERO", "heaps_beta"): (
        "honest zero: the synthetic fixture vocabulary is CLOSED (~31-40 "
        "types, fully seen in the first checkpoint at every scale), so "
        "vocabulary growth is exactly flat; the growing-vocabulary TRUE "
        "path (beta = 1, r2 = 1) is pinned by "
        "test_heaps_fit_recovers_synthetic_growth"
    ),
    ("text_heaps_law_fit", "ALL_NULL", "r2"): (
        "honest NULL: with the closed fixture vocabulary the y-variance "
        "is exactly zero (V_k constant), so r2 is 0/0 and both engines "
        "guard it to NULL; the defined-r2 path is pinned by "
        "test_heaps_fit_recovers_synthetic_growth"
    ),
    ("embedding_isotropy_report", "ALL_ZERO", "n_zero_norm"): (
        "honest zero: every fixture embedding has a nonzero quantized "
        "norm at every scale; the zero-vector drop TRUE path is pinned "
        "by test_isotropy_cone_and_zero_norm_synthetic"
    ),
    ("embedding_intrinsic_dim", "ALL_ZERO", "n_degenerate"): (
        "honest zero: the fixture has no exact duplicate embeddings at "
        "any scale (r1 > 0 everywhere); the duplicate-drop TRUE path is "
        "pinned by test_intrinsic_dim_duplicates_synthetic"
    ),
    ("events_hurst_exponent", "ALL_ZERO", "n_blocks_skipped"): (
        "honest zero: no 4..256-day window of the fixture calendar has a "
        "perfectly constant daily count at any scale; the constant-block "
        "drop TRUE path is pinned by "
        "test_hurst_trend_and_constant_block_synthetic"
    ),
    ("events_friedman_test", "ALL_ZERO", "n_dropped"): (
        "honest zero: the fixture is dense (every user has every event "
        "type at every scale — the KM/AUC lesson); the incomplete-block "
        "TRUE path is pinned by test_friedman_drops_synthetic_incomplete_block"
    ),
    ("events_page_hinkley", "ALL_NULL", "alarm_day"): (
        "honest negative: the fixture's daily counts are stationary at "
        "every scale (max excursion 26.6/44.9 at sf0.001/sf0.01, under "
        "the lambda=50 threshold); TRUE path pinned by "
        "test_page_hinkley_alarms_on_synthetic_level_shift through the "
        "full production query"
    ),
    ("events_page_hinkley", "ALL_NULL", "excursion_at_alarm"): (
        "same stationary-fixture triage as alarm_day; same synthetic pin"
    ),
    ("events_page_hinkley", "ALL_FALSE", "drift_detected"): (
        "same stationary-fixture triage as alarm_day; same synthetic pin"
    ),
    ("events_wilcoxon_signed_rank", "ALL_ZERO", "w_plus"): (
        "honest extreme: weekends are 2 of 7 days, so EVERY user's "
        "weekend-minus-weekday spend diff is negative on the uniform "
        "fixture (W+ = 0 is the true rank sum; z is strongly negative "
        "and non-vacuous); the positive-diff TRUE path is pinned by "
        "test_wilcoxon_ranks_synthetic_weekend_spenders"
    ),
}


@pytest.mark.timeout(1500)
def test_registry_non_vacuity(spark, sf_dir):
    if not sf_dir.rstrip("/").endswith("sf0.001"):
        pytest.skip("vacuity allowlist is triaged against the sf0.001 fixture")
    flagged: set[tuple[str, str, str]] = set()
    for name, fn in QUERIES.items():
        rows = fn(spark, sf_dir).collect()
        if not rows:
            flagged.add((name, "ZERO_ROWS", ""))
            continue
        for col in rows[0].asDict():
            vals = [r[col] for r in rows]
            if all(v is None for v in vals):
                flagged.add((name, "ALL_NULL", col))
            elif all(
                isinstance(v, (int, float, decimal.Decimal))
                and not isinstance(v, bool)
                and v == 0
                for v in vals
            ):
                flagged.add((name, "ALL_ZERO", col))
            elif all(v is False for v in vals):
                # An identically-False boolean flag (reject_*, is_*,
                # *_guarantee) is the same vacuous-gate class as an
                # identically-zero integer flag (ADVICE r10).
                flagged.add((name, "ALL_FALSE", col))
    new = flagged - set(ALLOWLIST)
    stale = set(ALLOWLIST) - flagged
    assert not new, (
        f"vacuous outputs without a triaged allowlist entry: {sorted(new)} — "
        "either de-vacuize the query (the r9 AUC/ab-lift/max-drawdown/q20 "
        "precedent) or triage it here with a synthetic-pathology pin"
    )
    assert not stale, (
        f"stale allowlist entries (no longer flag at sf0.001): {sorted(stale)}"
    )
