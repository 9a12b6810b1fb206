"""Driver-contract window integrity: _WINDOW_FIRST keys must exist (a
rename would silently shrink the 50-slot correctness window — the
_ordered_keys filter drops unknown names), and every key in the
consumed first-50 must be oracle-able (a rows-only key in the window
wastes a hash-check slot)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as e  # noqa: E402


def test_window_keys_all_exist():
    missing = [k for k in e._WINDOW_FIRST if k not in e.QUERIES]
    assert missing == [], f"window names not in QUERIES: {missing}"


def test_window_first_50_all_oracle_able():
    # _WINDOW_ROWS_ONLY_OK: rows-only keys deliberately seated for
    # their one rows-only driver row (r14 verdict task #6); anything
    # else rows-only in the window is a wasted hash-check slot.
    oracles = e.oracle_sql()
    first50 = list(e.queries())[:50]
    rows_only = [
        k for k in first50
        if k not in oracles and k not in e._WINDOW_ROWS_ONLY_OK
    ]
    assert rows_only == [], f"rows-only keys consuming window slots: {rows_only}"


def test_ordering_preserves_every_key():
    q = e.queries()
    assert sorted(q) == sorted(e.QUERIES)
