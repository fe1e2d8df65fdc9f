"""Column-level function helpers (SURVEY §2.8 + extension primitives)."""
