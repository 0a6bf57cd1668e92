"""Cross-engine rounding conventions (queries.py header) as properties.

Spark's ``round`` on doubles goes through
``BigDecimal(Double.toString(x))`` — the SHORTEST decimal string — with
HALF_UP, so an exact 7-decimal tie like 0.5153125 always rounds UP.
DuckDB rounds the BINARY double (scaled ``std::round``), so the same tie
rounds by whichever side of .5 the nearest double landed on — a coin
flip per value. These tests pin the two conventions that make the
driver's byte-level hash stable anyway:

- the integer-scale snap ``round(round(x*1e6)/1e6, 6)`` agrees between
  the engines for every double (exact .5 at integer scale is dyadic);
- oracle ``round(...) + 0`` folds DuckDB's ``-0.0`` to ``+0.0``.

The Spark side is mimicked with decimal.Decimal(repr(x)) — the same
shortest-string + HALF_UP semantics — so the property suite runs in
milliseconds without a SparkSession; the real Spark behaviour is pinned
by the 50 bit-exact driver queries.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def spark_round(x: float, scale: int = 6) -> float:
    """Spark Decimal-path round: BigDecimal(Double.toString(x)) HALF_UP."""
    if math.isnan(x) or math.isinf(x):
        return x
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def duck(con, expr: str) -> float:
    return con.sql(f"SELECT {expr}").fetchone()[0]


def test_exact_decimal_ties_disagree_without_snap(con):
    """The hazard is real: plain round(6) differs between the engines on
    an exact 7-decimal tie whose nearest double sits below .5."""
    x = 0.5153125  # nearest double is just below the decimal tie
    assert spark_round(x) == 0.515313  # shortest-string sees ".5" → up
    assert duck(con, "round(0.5153125::DOUBLE, 6)") == 0.515312  # binary → down


@settings(max_examples=300, deadline=None)
@given(
    num=st.integers(min_value=0, max_value=50_000_000),
    den=st.integers(min_value=1, max_value=10_000),
)
def test_snap_agrees_on_rationals(num, den):
    """snap6 = round(round(x*1e6)/1e6, 6) gives the identical double in
    both engines for rational inputs (the tie-capable class) — including
    denominators 2^a*5^b that produce exact decimal ties."""
    con = duckdb.connect()
    x = num / den
    got_duck = con.sql(
        f"SELECT round(round(({num}::DOUBLE / {den}) * 1e6, 0) / 1e6, 6)"
    ).fetchone()[0]
    inner = round_integer_spark(x * 1e6)
    got_spark = spark_round(inner / 1e6)
    assert got_duck == got_spark or (math.isnan(got_duck) and math.isnan(got_spark)), (
        num, den, got_duck, got_spark,
    )


def round_integer_spark(x: float) -> float:
    """Spark round(col) at scale 0 via the same Decimal path."""
    return float(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))


def test_snap_known_tie_cases(con):
    """The exact tie families hit in round 3: value/(k+1) cents ratios
    and m/rn with denominators 2^7*5^j."""
    for num, den in [(8245, 16000), (33, 640), (1, 128), (103, 200), (654321, 640)]:
        x = Fraction(num, den)
        xf = num / den
        got_duck = duck(con, f"round(round(({num}::DOUBLE / {den}) * 1e6, 0) / 1e6, 6)")
        got_spark = spark_round(round_integer_spark(xf * 1e6) / 1e6)
        assert got_duck == got_spark, (x, got_duck, got_spark)


def test_negative_zero_convention(con):
    """DuckDB round preserves -0.0; `+ 0` folds it to +0.0 (the value
    Spark's round emits), changing nothing else."""
    assert math.copysign(1, duck(con, "round(-1e-9, 6)")) == -1.0
    assert math.copysign(1, duck(con, "round(-1e-9, 6) + 0")) == 1.0
    assert duck(con, "round(1.5e-6, 6) + 0") == duck(con, "round(1.5e-6, 6)")
    assert duck(con, "round(NULL::DOUBLE, 6) + 0") is None
