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

#: operands for which epoch() is fraction-free and therefore safe —
#: anchored (word boundary / exact alias-dot), NOT bare startswith, so a
#: future operand like ``tbl.ts`` or ``wsx`` can't ride a short prefix
_SAFE_EPOCH_RE = re.compile(
    r"^(?:"
    r"date_trunc\s*\(|"
    r"time_bucket\s*\(|"
    r"o_orderdate\b|"  # DATE column
    r"ws\b|"  # already-bucketed window starts
    r"w\.|"  # window-start alias
    r"tb\b|"  # time_bucket alias in stream_sliding
    r"split_d\b"  # day-truncated split boundary (ts_changepoint_binseg)
    r")"
)


def test_no_rounding_epoch_on_raw_timestamps():
    bad: dict[str, list[str]] = {}
    for key, sql in entrymod.oracle_sql().items():
        for m in re.finditer(r"epoch\(([^)]*)", sql):
            arg = m.group(1).strip()
            if _SAFE_EPOCH_RE.match(arg):
                continue
            bad.setdefault(key, []).append(m.group(0))
    assert not bad, (
        f"oracles using rounding epoch() on raw timestamps: {bad}; "
        "use epoch_us(x) // 1000000 (truncating, = Spark unix_seconds)"
    )


def test_no_integer_slash_division_on_epoch_arithmetic():
    """``/`` on DuckDB integers is FLOAT division; epoch arithmetic must
    use ``//``. Flag EVERY `epoch_us(...) / 1000000` occurrence
    individually (a correct `//` elsewhere in the same oracle must not
    suppress detection — ADVICE r6). The single-slash pattern cannot
    match a `//` spelling: the lookahead rejects a second slash, and a
    match can't start at the second slash of `//` because the required
    `epoch_us(...)` prefix would then have to end in `/`."""
    bad: dict[str, list[str]] = {}
    for key, sql in entrymod.oracle_sql().items():
        for m in re.finditer(r"epoch_us\([^)]*\)\s*/(?!/)\s*1000000(?!\d)", sql):
            bad.setdefault(key, []).append(m.group(0))
    assert not bad, f"float division on epoch_us in: {bad}"
