"""Arrow-level type audit of every oracle (no Spark needed — fast).

A DuckDB oracle column that reaches Arrow as decimal128 (HUGEINT from SUM of
INTEGER, or un-cast DECIMAL math) hashes differently from the Spark twin in
the driver's value-hash even when numerically equal; round-2's only
driver-red row (win_sessionize) was exactly this.  String-canonicalizing
comparison can't see it, so this pins the type layer directly.
"""

from __future__ import annotations

import pytest

from oracle_type_audit import audit_oracle

import __spark_entry__ as entry_mod

ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_forbidden_arrow_types(name, duck):
    bad = audit_oracle(duck, ORACLES[name])
    assert not bad, f"oracle emits driver-hash-unsafe Arrow types: {bad}"
