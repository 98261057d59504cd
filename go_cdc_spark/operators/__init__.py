"""Operator surface: relational (SURVEY §2.B), CDC, dedup, similarity, text."""
