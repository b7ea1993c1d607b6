"""Observability + IO utilities (reference: utils/, run/evaluate.py)."""
