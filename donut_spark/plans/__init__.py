"""Explicit physical-plan helpers Catalyst can't derive on its own:
UDF-compute-skew balancing and per-partition lineage (SURVEY.md §4)."""
