"""Driver-contract guard for __spark_entry__: the three functions the
harness calls, their shapes, and the gate-window invariants the
rotation policy promises (COVERAGE.md) — so a refactor that breaks
the contract fails HERE, not in the driver's round report."""

from __future__ import annotations

import __spark_entry__ as ent


def test_entry_module_shape():
    q = ent.queries()
    o = ent.oracle_sql()
    assert callable(ent.entry)
    assert isinstance(q, dict) and isinstance(o, dict)
    assert len(q) >= 136
    # every oracle key is a registered query, every oracle is SQL text
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_gate_window_has_no_rows_only_entries():
    """The driver records roughly the first 50 queries; rows-only
    entries there burn gate slots on err:no_oracle rows (VERDICT r3
    #2). The rotation policy keeps them dead last."""
    q = list(ent.queries())
    o = ent.oracle_sql()
    assert [k for k in q[:50] if k not in o] == []
    # and the rows-only block really is terminal
    rows_only = [k for k in q if k not in o]
    assert q[-len(rows_only):] == rows_only


def test_entry_runs_smoke(spark):
    """entry() must run on the smallest fixture and return a stable
    non-empty schema (the driver's smoke check)."""
    df = ent.entry(spark)
    assert df.schema.fields
    assert df.count() >= 0


def test_gate_rotation_policy():
    """all_queries() ordering: never-gated oracled queries first, then
    ascending last-gated round (from the committed CORRECTNESS_r*.json
    artifacts), rows-only-by-design queries dead last."""
    import glob
    import json
    import re

    from __spark_entry__ import oracle_sql, queries

    q = list(queries())
    o = set(oracle_sql())
    last = {}
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        r = int(re.search(r"r(\d+)\.json$", p).group(1))
        for name in json.load(open(p)):
            last[name] = max(last.get(name, 0), r)
    # rows-only queries form a contiguous tail
    kinds = [n in o for n in q]
    first_rows_only = kinds.index(False)
    assert all(not k for k in kinds[first_rows_only:])
    # oracled prefix is sorted by last-gated round (ties keep order)
    rounds = [last.get(n, 0) for n in q[:first_rows_only]]
    assert rounds == sorted(rounds)
    # anything never gated leads the window
    never = [n for n in q[:first_rows_only] if last.get(n, 0) == 0]
    assert q[: len(never)] == never
