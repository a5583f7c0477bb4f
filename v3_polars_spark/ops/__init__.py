"""L1 operator library — one documented op per SURVEY.md §2 row where Spark
lacks a literal primitive; stock DataFrame API everywhere else."""

from .asof import (
    asof_join,
    asof_join_same_source,
    asof_lookup,
    asof_lookup_scalar,
)
from .cogroup import cogrouped_asof
from .cohort import retention_matrix
from .dedup import dedup_first, dedup_last
from .diff import diff_tables
from .drift import bin_counts, psi_drift, psi_from_counts
from .ewma import ewma
from .funnel import funnel
from .fuzzy import fuzzy_join_blocked, fuzzy_match_best, skeleton_key
from .merge import merge_upsert
from .misc import (
    is_empty,
    outer_join_coalesced,
    recode_join,
    recode_map,
    segment_bounds,
)
from .profile import profile_table
from .ranges import interval_overlap_join, range_join
from .resample import duration_to_interval, resample
from .rollup import hypertable_rollup
from .scd import scd2_history
from .sessions import sessionize
from .sketches import (
    approx_distinct_by,
    heavy_hitters,
    kll_quantile_check,
    kll_rollup,
    kll_sketches,
    theta_set_estimate,
    theta_sketches,
    approx_quantile_by,
    approx_quantile_check,
    histogram,
    hll_intersect_estimate,
    hll_rollup,
    hll_sketches,
)
from .skew import salted_join
from .twa import time_weighted_avg
from .upsample import upsample
from .validate import (
    Check,
    check_accepted_values,
    check_not_null,
    check_range,
    check_referential,
    check_unique,
    run_checks,
)
from .windows import (
    cumsum,
    cumsum_scalable,
    ffill,
    first_covering,
    lead_col,
    take_ordered,
)

__all__ = [
    "heavy_hitters",
    "fuzzy_match_best",
    "Check",
    "check_accepted_values",
    "check_not_null",
    "check_range",
    "check_referential",
    "check_unique",
    "run_checks",
    "cogrouped_asof",
    "kll_quantile_check",
    "kll_rollup",
    "kll_sketches",
    "theta_set_estimate",
    "theta_sketches",
    "bin_counts",
    "psi_drift",
    "psi_from_counts",
    "fuzzy_join_blocked",
    "scd2_history",
    "skeleton_key",
    "approx_distinct_by",
    "approx_quantile_by",
    "approx_quantile_check",
    "asof_join",
    "asof_join_same_source",
    "hll_rollup",
    "hll_sketches",
    "asof_lookup",
    "asof_lookup_scalar",
    "cumsum",
    "cumsum_scalable",
    "dedup_first",
    "dedup_last",
    "diff_tables",
    "duration_to_interval",
    "ewma",
    "ffill",
    "funnel",
    "histogram",
    "hll_intersect_estimate",
    "first_covering",
    "take_ordered",
    "hypertable_rollup",
    "interval_overlap_join",
    "is_empty",
    "lead_col",
    "merge_upsert",
    "outer_join_coalesced",
    "profile_table",
    "range_join",
    "recode_join",
    "recode_map",
    "resample",
    "retention_matrix",
    "salted_join",
    "segment_bounds",
    "sessionize",
    "time_weighted_avg",
    "upsample",
]
