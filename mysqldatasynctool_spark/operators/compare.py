"""Placeholder — filled in as operators land."""

QUERIES = {}
ORACLES = {}
