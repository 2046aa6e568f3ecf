"""Engine operators.

- :mod:`fold` / :mod:`scan` — the reference's novel surface (sequential,
  order-dependent reductions) on Spark's execution model.
- :mod:`window` — declarative associative fast paths (pure Catalyst).
- :mod:`dedup`, :mod:`similarity`, :mod:`text`, :mod:`multimodal` —
  large-scale training-data pipeline extensions (SURVEY.md §7 M5).
"""
