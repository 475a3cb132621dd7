"""Named-transform registry + pipeline runner (SURVEY §2.11: C1, C2).

Reference C1: a string → transformer-class registry with dispatch that
raises on unknown names (`workflow/Transformer.py:105-123`). Idiomatic
Spark version: a dict of named ``DataFrame -> DataFrame`` callables chained
with ``DataFrame.transform`` — each step appends logical-plan nodes, and
Catalyst optimizes the *whole* composed plan (e.g. collapsing adjacent
Projects from separate steps into one).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from functools import partial, reduce

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]

#: global named-transform registry (C1 analog)
TRANSFORMS: dict[str, Callable[..., DataFrame]] = {}


def register_transform(name: str) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
    """Decorator: publish a transform under ``name`` (C1 registry entry)."""

    def deco(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
        TRANSFORMS[name] = fn
        return fn

    return deco


def get_transform(name: str, **kwargs) -> Transform:
    """Dispatch by name; raises ValueError on unknown type exactly like the
    reference registry (`workflow/Transformer.py:120-123`). ``kwargs`` are
    bound, yielding a unary ``DataFrame -> DataFrame``."""
    try:
        fn = TRANSFORMS[name]
    except KeyError:
        raise ValueError(
            f"Invalid transformer type: {name!r}; known: {sorted(TRANSFORMS)}"
        ) from None
    return partial(fn, **kwargs) if kwargs else fn


@dataclass
class Pipeline:
    """A linear chain of transforms applied via ``DataFrame.transform``.

    The reference ETL DAG (C2, `spark-main.py:12-27`) is a shared prefix with
    a 4-way fan-out; model that as one Pipeline for the prefix, ``.cache()``
    at the fan-out point (the reference recomputed the prefix 4× — SURVEY
    §7.1.7), then one Pipeline per branch.
    """

    steps: list[Transform] = field(default_factory=list)

    def then(self, step: Transform | str, **kwargs) -> "Pipeline":
        if isinstance(step, str):
            step = get_transform(step, **kwargs)
        elif kwargs:
            step = partial(step, **kwargs)
        return Pipeline(self.steps + [step])

    def run(self, df: DataFrame) -> DataFrame:
        return reduce(lambda acc, fn: acc.transform(fn), self.steps, df)


def fan_out(
    df: DataFrame,
    branches: dict[str, Transform | Pipeline],
    cache: bool = True,
) -> dict[str, DataFrame]:
    """C2 — evaluate several branches off one shared prefix.

    ``cache=True`` persists the prefix so the 4 sink jobs reuse it instead of
    re-running scan→expand→clean per sink (the reference's missed
    optimization, SURVEY §4). Caller unpersists via ``df.unpersist()``.
    """
    if cache:
        df = df.cache()
    out: dict[str, DataFrame] = {}
    for name, branch in branches.items():
        out[name] = branch.run(df) if isinstance(branch, Pipeline) else branch(df)
    return out
