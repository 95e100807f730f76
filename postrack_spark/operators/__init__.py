"""Relational + LLM-data-pipeline operators as DataFrame compositions."""
