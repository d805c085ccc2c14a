"""Typed error for the engine's fallback discipline.

The reference dry-runs each physical node and wraps unsupported ones
in RowGuard for row fallback (reference:
extension/columnar/ColumnarGuardRule.scala:41-52,74-258). A PySpark
rebuild has no dual engine, so "fallback" becomes an explicit, typed
refusal that names the escape hatch.
"""

from __future__ import annotations


class UnsupportedOperationError(Exception):
    """Raised when an operator helper cannot honor the requested
    semantics; the message names the vanilla-Spark escape hatch."""

    def __init__(self, what: str, escape_hatch: str):
        super().__init__(f"{what} (escape hatch: {escape_hatch})")
        self.what = what
        self.escape_hatch = escape_hatch
