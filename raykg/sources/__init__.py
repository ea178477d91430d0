"""Readers + deterministic synthetic `pages` generation."""
