"""Scalar/vectorized functions: extraction, parsing, timestamps, text stats."""
