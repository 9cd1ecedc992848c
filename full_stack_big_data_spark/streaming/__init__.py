"""Structured Streaming programs (populated later this round)."""
