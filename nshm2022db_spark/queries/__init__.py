"""Registered query/oracle pairs, grouped by family.

Importing this package populates the registry (see registry.py bottom).
"""
