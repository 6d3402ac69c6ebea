"""Scalar function library (parsers, coercions, expressions)."""
