"""Module-level memoization of UNRESOLVED expression trees.

PySpark Column construction is py4j-bound: every F.when/F.lit/operator call
is a JVM round trip, and a wide functional bank or a minhash pipeline builds
thousands of them — measured 0.6-1.1 s per query CONSTRUCTION (before any
execution) for functionals_sql and minhash+jaccard at bench scale, i.e. more
than the queries' own runtime on 100k rows. Unresolved Columns are immutable
and DataFrame-independent (they bind to input attributes at analysis time),
so a query builder's expression list is a pure function of its parameters;
this cache stores those Column lists keyed by the (frozen) parameters.

Nothing data-dependent is cached — no rows, no results, no DataFrames, only
expression trees (the program text of the query) — so every invocation still
computes from its inputs exactly as before; repeated invocations just skip
re-building an identical expression forest over py4j.
"""

from __future__ import annotations

import functools


def freeze(x):
    """Recursively convert dicts/lists/sets to hashable tuples; leave other
    values as-is (unhashable leaves make the key raise TypeError, which the
    memo treats as uncacheable and falls through to a direct call)."""
    if isinstance(x, dict):
        return tuple(sorted((k, freeze(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(freeze(v) for v in x)
    if isinstance(x, (set, frozenset)):
        return tuple(sorted(freeze(v) for v in x))
    return x


def expr_memo(fn):
    """Memoize a pure expression-builder by its (frozen) arguments.

    Use ONLY on functions whose output depends on nothing but the arguments
    and which return (structures of) unresolved Columns / plain metadata.
    Unhashable arguments disable caching for that call instead of failing.
    """
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            key = (freeze(args), freeze(tuple(sorted(kwargs.items()))))
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        if key not in cache:
            cache[key] = fn(*args, **kwargs)
        return cache[key]

    wrapper.cache = cache
    return wrapper
