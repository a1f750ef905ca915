"""Spark plan-shaping operators: the engine's public query surface."""
