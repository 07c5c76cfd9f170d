"""Safe higher-order-function wrappers.

PySpark names the Catalyst lambda variables of transform/aggregate/
zip_with after the *Python* lambda's argument names. When several HOF
calls inside one projection reuse the same argument name (the natural
``lambda x: ...`` everywhere), the unresolved lambda variables collide
during analysis and silently bind to the wrong enclosing HOF — producing
wrong VALUES, not an error (observed on PySpark 4.1.2: four sibling
``F.transform`` calls under one ``F.array`` each computed with another
branch's prefix).

These wrappers rewrite every callback to use globally unique argument
names, making HOF composition safe. Use them instead of raw F.transform /
F.aggregate / F.zip_with / F.filter anywhere more than one HOF can end up
in the same select.
"""

from __future__ import annotations

import itertools
from typing import Callable

import pyspark.sql.functions as F

_counter = itertools.count()


def _uniq(fn: Callable, nargs: int) -> Callable:
    n = next(_counter)
    names = [f"uhof_{n}_{j}" for j in range(nargs)]
    src = f"lambda {', '.join(names)}: fn({', '.join(names)})"
    return eval(src, {"fn": fn})  # noqa: S307 - static template, trusted input


def transform(arr, fn):
    return F.transform(arr, _uniq(fn, 1))


def filter_(arr, fn):
    return F.filter(arr, _uniq(fn, 1))


def aggregate(arr, init, merge):
    return F.aggregate(arr, init, _uniq(merge, 2))


def zip_with(a, b, fn):
    return F.zip_with(a, b, _uniq(fn, 2))
