"""Model-based property test for the transactional table format:
a random sequence of APPEND / DELETE / MERGE / OPTIMIZE / RESTORE
commits must keep the table row-equivalent to a plain Python dict
model, every historical version must stay time-travelable and equal
its recorded model state, and vacuum must never change any retained
version's content.

Bounded for wall-clock (each operation is a Spark job): a few
deterministic seeds × ~6 operations, driven by seeded random.Random
rather than a full property engine so the Spark session fixture is
reused and runs stay reproducible."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.sources.txtable import (
    TxTable,
)


def _table_rows(t, version=None):
    return {(r["k"], r["v"]) for r in t.read(version).collect()}


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_random_commit_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    p = str(tmp_path / f"prop_{seed}")

    def mk(pairs):
        return spark.createDataFrame(
            [(int(k), int(v)) for k, v in pairs], "k long, v long"
        ).coalesce(1)

    model: dict[int, int] = {k: k for k in range(20)}
    t = TxTable.create(spark, p, mk(model.items()), stats_columns=["k"])
    states = {t.latest_version(): dict(model)}

    for _ in range(6):
        op = rng.choice(
            ["append", "delete", "update", "merge", "optimize", "restore"]
        )
        if op == "append":
            base = rng.randrange(100, 10_000)
            rows = {base + i: rng.randrange(1000) for i in range(rng.randrange(1, 8))}
            # appended keys must be fresh (the table invariant MERGE keeps)
            rows = {k: v for k, v in rows.items() if k not in model}
            if not rows:
                continue
            t.append(mk(rows.items()))
            model.update(rows)
        elif op == "delete":
            cut = rng.randrange(0, 5000)
            # all three strategies must be row-equivalent (mor masks
            # positions in a sidecar; cow rewrites; auto picks)
            t.delete(
                F.col("k") < cut,
                strategy=rng.choice(["cow", "mor", "auto"]),
            )
            model = {k: v for k, v in model.items() if not k < cut}
        elif op == "update":
            cut = rng.randrange(0, 5000)
            delta = rng.randrange(1, 100)
            t.update(
                F.col("k") < cut,
                {"v": F.col("v") + delta},
                strategy=rng.choice(["cow", "mor", "auto"]),
            )
            model = {
                k: (v + delta if k < cut else v) for k, v in model.items()
            }
        elif op == "merge":
            keys = rng.sample(sorted(model) or [0], min(5, len(model))) if model else []
            new_key = rng.randrange(20_000, 30_000)
            src_rows = [(k, rng.randrange(1000), rng.choice(["U", "D"])) for k in keys]
            src_rows.append((new_key, 1, "U"))
            src = spark.createDataFrame(src_rows, "k long, v long, op string")
            t.merge(src, "k")
            for k, v, o in src_rows:
                if o == "D":
                    model.pop(k, None)
                else:
                    model[k] = v
        elif op == "optimize":
            t.optimize(target_file_rows=50, sort_by=["k"] if rng.random() < 0.5 else None)
        elif op == "restore":
            target = rng.choice(sorted(states))
            t.restore(target)
            model = dict(states[target])
        states[t.latest_version()] = dict(model)
        assert _table_rows(t) == set(model.items()), f"after {op}"

    # every recorded version is still time-travelable and exact
    for v, st in states.items():
        assert _table_rows(t, version=v) == set(st.items()), f"version {v}"
    # vacuum removes only unreferenced files: all versions still exact
    t.vacuum(min_age_seconds=0)
    for v, st in states.items():
        assert _table_rows(t, version=v) == set(st.items()), f"post-vacuum v{v}"


@pytest.mark.parametrize("seed", [11, 43])
def test_random_commit_sequences_with_renames_match_model(spark, tmp_path, seed):
    """Model check with metadata-only RENAME COLUMN mixed into the
    history: every operation goes through the CURRENT logical name,
    every recorded version must time-travel back under the name it
    had THEN (metaData replay), and RESTORE must revive the target
    version's name+mapping along with its rows."""
    rng = random.Random(seed)
    p = str(tmp_path / f"prop_ren_{seed}")

    def mk(pairs, vname):
        return spark.createDataFrame(
            [(int(k), int(v)) for k, v in pairs], f"k long, {vname} long"
        ).coalesce(1)

    def rows_at(version, vname):
        return {
            (r["k"], r[vname]) for r in t.read(version).collect()
        }

    model: dict[int, int] = {k: k for k in range(20)}
    vname = "v"
    n_renames = 0
    t = TxTable.create(spark, p, mk(model.items(), vname), stats_columns=["k"])
    states = {t.latest_version(): (dict(model), vname)}

    for _ in range(7):
        op = rng.choice(
            ["append", "delete", "update", "rename", "rename", "restore"]
        )
        if op == "append":
            base = rng.randrange(100, 10_000)
            rows = {base + i: rng.randrange(1000) for i in range(rng.randrange(1, 6))}
            rows = {k: v for k, v in rows.items() if k not in model}
            if not rows:
                continue
            t.append(mk(rows.items(), vname))
            model.update(rows)
        elif op == "delete":
            cut = rng.randrange(0, 5000)
            t.delete(
                F.col("k") < cut,
                strategy=rng.choice(["cow", "mor", "auto"]),
            )
            model = {k: v for k, v in model.items() if not k < cut}
        elif op == "update":
            cut = rng.randrange(0, 5000)
            delta = rng.randrange(1, 100)
            t.update(F.col(vname).isNotNull() & (F.col("k") < cut),
                     {vname: F.col(vname) + delta})
            model = {
                k: (v + delta if k < cut else v) for k, v in model.items()
            }
        elif op == "rename":
            n_renames += 1
            new = f"v{n_renames}"
            t.rename_column(vname, new)
            vname = new
        elif op == "restore":
            target = rng.choice(sorted(states))
            t.restore(target)
            model, vname = dict(states[target][0]), states[target][1]
        states[t.latest_version()] = (dict(model), vname)
        assert rows_at(None, vname) == set(model.items()), f"after {op}"
        assert t.read().columns == ["k", vname], f"columns after {op}"

    for v, (st, name) in states.items():
        assert t.read(version=v).columns == ["k", name], f"v{v} name"
        assert rows_at(v, name) == set(st.items()), f"version {v}"
    t.vacuum(min_age_seconds=0)
    for v, (st, name) in states.items():
        assert rows_at(v, name) == set(st.items()), f"post-vacuum v{v}"
