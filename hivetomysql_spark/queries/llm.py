"""LLM-pipeline tier queries (filled in W4)."""
