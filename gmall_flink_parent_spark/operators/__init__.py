"""Relational / streaming operators (SURVEY §2.3–§2.6)."""
