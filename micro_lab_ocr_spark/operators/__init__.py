"""Relational operators: declarative rewrites of the reference's
order-dependent extraction state (SURVEY §2.5) plus training-data operators
(dedup, similarity search)."""
