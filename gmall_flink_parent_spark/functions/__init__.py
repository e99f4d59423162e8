"""Scalar/vector function surface + LLM-data-pipeline operators."""
