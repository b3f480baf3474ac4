"""Expression-level helpers shared by the array-HOF operators.

One idiom lives here: :func:`let_` — bind-once scoping for expensive
sub-expressions used inside higher-order-function lambdas.

Why it exists: Catalyst does not hoist loop-invariant sub-expressions
out of HOF lambda bodies (and ``CollapseProject`` inlines projected
aliases into their use sites), so an array-valued expression referenced
from inside ``F.transform``'s lambda is RE-EVALUATED per element. For a
sliding-window pass over an n-element hash array that turns O(n) md5
calls into O(n^2) (measured: minutes -> seconds on the winnowing
fingerprint operator), and a 32-permutation MinHash into 32 re-hashes
of the shingle set (measured 2.05x end-to-end).

``let_(value, body)`` wraps ``value`` in a 1-element array and
``transform``s over it: the element is evaluated exactly once per row
and passed to ``body`` as a lambda VARIABLE — the SQL equivalent of a
``let`` binding. Nest for multiple bindings.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_"]


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and pass it to ``body`` as a
    bound lambda variable (see module docstring)."""
    return F.get(F.transform(F.array(value), body), 0)
