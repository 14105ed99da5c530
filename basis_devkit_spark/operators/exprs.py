"""Expression-level let-binding for higher-order-function pipelines.

Higher-order functions (``transform``, ``filter``, ``aggregate``) are
CodegenFallback expressions: the lambda body runs INTERPRETED, and any
non-attribute subexpression referenced inside the body is re-evaluated
on every lambda invocation. A gram builder that slices an inlined
``split()`` therefore re-runs the regex split once per gram —
O(tokens²) per row (measured 302 s → 1.6 s on d04j when bound once).

``let_(value, body)`` evaluates ``value`` exactly once per row and
passes it to ``body`` as a bound lambda variable — SQL has no native
``let``; wrapping the value in a one-element array and transforming it
gives the same effect. The same idiom is used by the EXIF parser
(``operators/multimodal.py``) for shared parse offsets.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_"]


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; ``body`` receives it as a bound
    lambda variable (cheap attribute access, never re-evaluated)."""
    return F.element_at(F.transform(F.array(value), body), 1)
