"""Declared query registry — the correctness gate.

Every operator claimed in SURVEY.md §2 (plus the training-data-pipeline
extensions) is exercised here as a (Spark callable, DuckDB oracle SQL)
pair over the driver's star-schema testdata. The driver compares
row-count + schema + order-insensitive value hash at sf=0.01.

Queries with ``oracle=None`` are non-SQL-expressible (streaming state,
LSH approximations whose candidate sets are engine-internal) and get the
weaker rows-only check.
"""

from __future__ import annotations

from .base import REGISTRY, QueryPair, register  # noqa: F401

# import for registration side effects
from . import core  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import urlq  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedupq  # noqa: E402,F401
from . import simq  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import crawlq  # noqa: E402,F401
from . import multimodalq  # noqa: E402,F401
from . import sketchq  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import sqlbreadth  # noqa: E402,F401
from . import sourcesq  # noqa: E402,F401


def queries():
    return {name: pair.fn for name, pair in REGISTRY.items()}


def oracle_sql():
    return {name: pair.oracle for name, pair in REGISTRY.items() if pair.oracle is not None}
