"""Operators: reference-parity pipelines + LLM-data-pipeline extensions."""
