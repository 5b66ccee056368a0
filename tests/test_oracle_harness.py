"""Guards for the guard: the oracle harness's canonicalization and
multiset compare (tools/check_oracle.py) must actually DETECT the
mismatch classes the round history produced — type drift (BIGINT vs
double), value flips, duplicate-count drift — and tolerate only what
it documents (sub-1e-9 float noise, -0.0, column order).

A comparator that silently passes everything would turn every green
sweep into noise; these tests pin its sensitivity.
"""

from __future__ import annotations

import datetime
import importlib.util
import os

import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "check_oracle.py",
)


@pytest.fixture(scope="module")
def harness():
    spec = importlib.util.spec_from_file_location("check_oracle", _TOOLS)
    mod = importlib.util.module_from_spec(spec)
    # executing the module runs only imports + defs; main() is guarded
    spec.loader.exec_module(mod)
    return mod


class TestCanon:
    def test_type_strict_int_vs_float(self, harness):
        """The round-1 lesson: DuckDB HUGEINT degrades to double through
        Arrow — 5 and 5.0 must canon DIFFERENTLY or that class of
        mismatch is invisible."""
        assert harness.canon(5) != harness.canon(5.0)

    def test_bool_is_not_int(self, harness):
        assert harness.canon(True) != harness.canon(1)

    def test_null_and_nan(self, harness):
        assert harness.canon(None) == "NULL"
        assert harness.canon(float("nan")) == "NaN"

    def test_negative_zero_collapses(self, harness):
        assert harness.canon(-0.0) == harness.canon(0.0)

    def test_float_noise_tolerance_boundary(self, harness):
        """Documented tolerance: 9-dp rounding. Sub-1e-9 noise is
        equal, 1e-8 drift is a detected difference."""
        assert harness.canon(1.0 + 1e-12) == harness.canon(1.0)
        assert harness.canon(1.00000001) != harness.canon(1.0)

    def test_datetime_isoformat(self, harness):
        d = datetime.datetime(2021, 3, 4, 5, 6, 7)
        assert harness.canon(d) == "2021-03-04T05:06:07"


class TestMultisetCompare:
    def test_detects_single_value_flip(self, harness):
        a = harness.df_to_multiset(["x", "y"], [(1, "a"), (2, "b")])
        b = harness.df_to_multiset(["x", "y"], [(1, "a"), (2, "c")])
        assert a != b

    def test_detects_duplicate_count_drift(self, harness):
        """Same distinct rows, different multiplicities — a plain set
        compare would pass this; the multiset must not."""
        a = harness.df_to_multiset(["x"], [(1,), (1,), (2,)])
        b = harness.df_to_multiset(["x"], [(1,), (2,), (2,)])
        assert a != b

    def test_column_order_insensitive(self, harness):
        """The driver sorts columns by NAME before hashing — the same
        logical rows presented in a different column order are equal."""
        a = harness.df_to_multiset(["x", "y"], [(1, "a")])
        b = harness.df_to_multiset(["y", "x"], [("a", 1)])
        assert a == b

    def test_row_order_insensitive(self, harness):
        a = harness.df_to_multiset(["x"], [(1,), (2,)])
        b = harness.df_to_multiset(["x"], [(2,), (1,)])
        assert a == b

    def test_type_drift_across_whole_column(self, harness):
        """An un-CAST sum(INTEGER) oracle shows up as 5.0 vs 5 on every
        row — the exact class the r1 driver failed 9 queries on."""
        a = harness.df_to_multiset(["n"], [(5,), (7,)])
        b = harness.df_to_multiset(["n"], [(5.0,), (7.0,)])
        assert a != b


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
