"""Static lint over every registered oracle SQL string — traps that
have bitten once must be structurally impossible to reintroduce.

Current rules:
1. No ``epoch(<raw timestamp>)`` — DuckDB's ``epoch()::BIGINT`` ROUNDS
   sub-second fractions where Spark's ``unix_seconds`` truncates
   (off-by-one on x.5+ fractions; found building ts_lttb, latent in
   ts_decay_sum). Use ``epoch_us(ts) // 1000000``. Allowed: epoch() over
   DATE columns or already-truncated bucket boundaries, where no
   fraction can exist.
2. No bare ``sum(<int col>)`` reaching output without ``::BIGINT`` is
   covered dynamically by parity.assert_fetch_dtypes — not linted here.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

#: operands for which epoch() is fraction-free and therefore safe
_SAFE_EPOCH_PREFIXES = (
    "date_trunc",
    "time_bucket",
    "o_orderdate",  # DATE column
    "ws",  # already-bucketed window starts
    "w.",
    "tb",  # time_bucket alias in stream_sliding
)


def test_no_rounding_epoch_on_raw_timestamps():
    bad: dict[str, list[str]] = {}
    for key, sql in entrymod.oracle_sql().items():
        for m in re.finditer(r"epoch\(([^)]*)", sql):
            arg = m.group(1).strip()
            if arg.startswith(_SAFE_EPOCH_PREFIXES):
                continue
            bad.setdefault(key, []).append(m.group(0))
    assert not bad, (
        f"oracles using rounding epoch() on raw timestamps: {bad}; "
        "use epoch_us(x) // 1000000 (truncating, = Spark unix_seconds)"
    )


def test_no_integer_slash_division_on_epoch_arithmetic():
    """``/`` on DuckDB integers is FLOAT division; epoch arithmetic must
    use ``//``. Flag `epoch_us(...) / 1000000` (without the second
    slash) — the one spelling that silently yields fractional seconds."""
    bad = []
    for key, sql in entrymod.oracle_sql().items():
        if re.search(r"epoch_us\([^)]*\)\s*/\s*1000000(?!\d)", sql) and not re.search(
            r"epoch_us\([^)]*\)\s*//\s*1000000", sql
        ):
            bad.append(key)
    assert not bad, f"float division on epoch_us in: {bad}"
