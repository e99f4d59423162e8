"""Stopword constants shared by the text/quality operators.

A leaf module (no registry import) so any operator module can be
imported directly without tripping the plans-package init cycle.
"""

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)
