"""Operator library: relational core + LLM-pipeline extensions."""
