"""Structural contract of __ray_entry__: every oracle key has a query,
every query is a callable, and the registry survives the queries/oracles
package split (each callable resolves to a real function in the right
domain module)."""

import __ray_entry__ as e


def test_registry_integrity():
    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 234
    missing = [k for k in oracles if k not in qs]
    assert not missing, f"oracle keys without queries: {missing}"
    for name, fn in qs.items():
        assert callable(fn), name
        assert fn.__module__.startswith(
            ("raylink.queries.", "raylink.queries")
        ), f"{name} resolves outside the queries package: {fn.__module__}"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    # rows-only set is a deliberate, named exception list — additions must
    # be conscious (float-geometry ops that cannot be SQL-mirrored)
    rows_only = sorted(set(qs) - set(oracles))
    assert rows_only == [
        "ann_ivf", "ann_join", "ann_lsh", "embedding_pairs_lsh",
    ], rows_only
