"""Plans layer: physical-strategy helpers that keep globally-ordered
computations parallel (two-phase rank, prefix aggregates, broadcast
scalar stats) instead of collapsing to a single partition."""

from .ranking import broadcast_stats, global_row_number, prefix_agg_over_buckets

__all__ = ["broadcast_stats", "global_row_number", "prefix_agg_over_buckets"]
