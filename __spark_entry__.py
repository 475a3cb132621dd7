"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bookstore_aws_lakehouse_spark/``; this module is
the thin registry façade. See ``bookstore_aws_lakehouse_spark/golden.py``
for the relational/golden set and the extension modules for dedup /
similarity / text / streaming queries.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bookstore_aws_lakehouse_spark.registry import MODULE, load_all

GOLDEN, ORACLE = load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO = os.path.dirname(os.path.abspath(__file__))

#: verification-first ordering for queries without a driver-green row yet:
#: LLM-pipeline surfaces (dedup/similarity/text/streaming/etl/events) lead,
#: the long-verified relational basics trail.
_MODULE_PRIORITY = (
    "queries_dedup",
    "queries_similarity",
    "queries_text",
    "queries_streaming",
    "queries_etl",
    "queries_events",
    "queries_sampling",
    "queries_temporal",
    "queries_quality",
    "queries_multimodal",
    "golden",
    "queries_sql",
)


def _driver_rows() -> dict[str, tuple[bool, int]]:
    """name -> (green, round_last_checked) across all prior
    CORRECTNESS_r*.json. Non-green checked names are past failures whose
    fixes deserve the front of the queue. A query's verdict is its LATEST
    round's row (files sort by round number): a regression in round N
    must not stay 'green' on the strength of round N-1. The round number
    feeds an age tiebreaker: with few unchecked queries left, the driver
    window re-verifies the STALEST greens first, so every row re-proves
    itself every few rounds instead of coasting on a round-1 check."""
    latest: dict[str, tuple[bool, int]] = {}

    def _round_no(path: str) -> int:
        # numeric sort: lexicographic would order r100 before r11 and let
        # older rounds overwrite newer verdicts
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    for path in sorted(
        glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")), key=_round_no
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = not row.get("err") and bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            )
            latest[name] = (ok, _round_no(path))
    return latest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Top-100-Books pattern) on sf0.001."""
    return GOLDEN["topk_books"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries with no driver-green CORRECTNESS row yet come
    first (the driver checks a bounded prefix per round): past failures
    whose fixes need re-verification lead, then the never-checked by
    module priority (registration order within a module);
    already-green queries follow OLDEST driver check first (age-based
    rotation — with the unchecked backlog cleared, the window's free
    slots re-verify stale round-1 greens instead of re-running last
    round's), module/registration order breaking ties within a round.
    """
    latest = _driver_rows()
    reg_index = {name: i for i, name in enumerate(GOLDEN)}
    mod_rank = {m: i for i, m in enumerate(_MODULE_PRIORITY)}

    def key(name: str) -> tuple:
        green, rnd = latest.get(name, (False, 0))
        return (
            green,
            # non-green: fixed failures (rnd > 0) outrank never-checked;
            # green: stalest (lowest last-checked round) first
            (rnd == 0) if not green else rnd,
            mod_rank.get(MODULE.get(name, ""), len(_MODULE_PRIORITY)),
            reg_index[name],
        )

    return {name: GOLDEN[name] for name in sorted(GOLDEN, key=key)}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return dict(ORACLE)
