"""Reusable relational operator library (the reference's recurring idioms as
first-class, scale-aware Spark functions)."""
