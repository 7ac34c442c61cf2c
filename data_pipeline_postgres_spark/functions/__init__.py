"""Reusable Column-level function builders (JVM-side expressions only —
no Python UDFs in the hot path)."""
