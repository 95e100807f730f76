"""Reusable column expressions — all JVM-side built-ins (no Python UDFs
on hot paths; SURVEY.md §4.3)."""
