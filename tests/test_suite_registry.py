"""The driver-window contract: the correctness driver evaluates only
the FIRST 50 registered queries, so slot order IS the round's
verification budget. These tests pin the window to the explicit
DRIVER_WINDOW list (a drifting registration order would silently spend
provable slots on already-green rows — the round-4 ADVICE item)."""

from arrow_zarr_spark import suite


def test_first_50_registered_queries_are_the_driver_window():
    names = list(suite.queries().keys())
    assert len(names) >= 50
    assert names[:50] == suite.DRIVER_WINDOW


def test_driver_window_is_exactly_50_unique_names():
    assert len(suite.DRIVER_WINDOW) == 50
    assert len(set(suite.DRIVER_WINDOW)) == 50


def test_every_window_query_has_an_oracle():
    """A window slot spent on a rows-only query is wasted — every
    in-window entry must carry a SQL oracle for the full
    rows+schema+hash check."""
    oracles = suite.oracle_sql()
    missing = [n for n in suite.DRIVER_WINDOW if n not in oracles]
    assert not missing, f"window queries without oracles: {missing}"


def test_rows_only_queries_register_last():
    """Engine-specific-output queries (no oracle possible) must sit at
    the very end of the registry, never displacing provable rows."""
    names = list(suite.queries().keys())
    oracles = suite.oracle_sql()
    rows_only = [n for n in names if n not in oracles]
    assert names[-len(rows_only):] == rows_only
