"""Relational + pipeline operators: enrich, route, aggregate, dedup, similarity."""
