"""Scalar/aggregate function helpers shared by operators and queries."""
