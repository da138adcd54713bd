"""Decimal width correctness (VERDICT r04 weak #6): values beyond the
int64 scaled range must raise DECIMAL_OVERFLOW, never silently saturate;
values within range round-trip exactly."""
import decimal
import random

import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import DecimalOverflow


@pytest.fixture(scope="module")
def s():
    return ch.connect()


def test_verdict_example_raises(s):
    with pytest.raises(DecimalOverflow):
        s.execute("SELECT toDecimal128('12345678901234567890.123', 3)")


def test_fuzz_no_silent_saturation(s):
    rng = random.Random(5)
    lim = 2 ** 63
    for _ in range(60):
        scale = rng.choice([0, 2, 3, 6])
        digits = rng.randint(8, 24)
        num = rng.randint(10 ** (digits - 1), 10 ** digits - 1)
        if rng.random() < 0.5:
            num = -num
        d = decimal.Decimal(num).scaleb(-scale)
        scaled = num
        sql = f"SELECT toDecimal128('{d}', {scale})"
        if -lim < scaled < lim:
            got = s.execute(sql).rows()[0][0]
            assert got == d, (sql, got)
        else:
            with pytest.raises(DecimalOverflow):
                s.execute(sql)


def test_in_range_arithmetic_exact(s):
    r = s.execute("SELECT toDecimal64('99999999.999', 3) + "
                  "toDecimal64('0.001', 3)").rows()[0][0]
    assert r == decimal.Decimal("100000000.000")
