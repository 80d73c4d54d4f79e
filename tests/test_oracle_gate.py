"""Unit tests for the LOCAL oracle gate (tools/verify_oracle.py) — the
pandas-level compare that mimics the driver's correctness harness.

Round-13 context: two driver reds (q_degree_assortativity,
q_embed_pca) were invisible to the local gate because (a) normalize()
width-cast integer columns through float64, erasing exactly the
long-vs-double formatting divergence the driver's value hash sees, and
(b) array cells were silently stringified while the driver's pandas
canonicalizer crashes on them. These tests pin the hardened behavior
so the gate can't drift back. No SparkSession needed — pure pandas.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from verify_oracle import compare, normalize  # noqa: E402


def test_int_vs_float_skew_is_reported():
    # the q_degree_assortativity r12 class: same value, BIGINT on one
    # side, DOUBLE on the other — the driver hash fails, so must we
    s = pd.DataFrame({"n_edges": [3745]})
    d = pd.DataFrame({"n_edges": [3745.0]})
    assert compare(s, d), "int-vs-float dtype skew must be a problem"


def test_same_type_int_columns_pass():
    s = pd.DataFrame({"n": [1, 2], "g": ["a", "b"]})
    d = pd.DataFrame({"n": [2, 1], "g": ["b", "a"]})  # order-insensitive
    assert compare(s, d) == []


def test_int_width_is_normalized_not_value():
    # int32 vs int64 is a width difference (both format as "42"), not
    # a driver-visible divergence — must still pass
    s = pd.DataFrame({"n": pd.array([42], dtype="int32")})
    d = pd.DataFrame({"n": pd.array([42], dtype="int64")})
    assert compare(s, d) == []


def test_float_columns_still_compare_as_float():
    s = pd.DataFrame({"x": [0.1 + 0.2]})
    d = pd.DataFrame({"x": [0.30000000000000004]})
    assert compare(s, d) == []


def test_nan_equals_nan_in_float_columns():
    s = pd.DataFrame({"x": [float("nan"), 1.0]})
    d = pd.DataFrame({"x": [1.0, float("nan")]})
    assert compare(s, d) == []


def test_bool_vs_int_skew_is_reported():
    # the driver formats True as "True" and 1 as "1" — a Spark-bool vs
    # DuckDB-int column must fail locally too
    s = pd.DataFrame({"kept": [True, False]})
    d = pd.DataFrame({"kept": [1, 0]})
    assert compare(s, d), "bool-vs-int dtype skew must be a problem"


def test_bool_vs_bool_passes():
    s = pd.DataFrame({"kept": [True, False]})
    d = pd.DataFrame({"kept": [False, True]})  # order-insensitive
    assert compare(s, d) == []


def test_normalize_keeps_integer_dtype():
    out = normalize(pd.DataFrame({"n": pd.array([7], dtype="int32")}))
    assert str(out["n"].dtype) == "int64"
    out = normalize(pd.DataFrame({"x": [1.5]}))
    assert str(out["x"].dtype) == "float64"


def test_unhashable_cell_detector_matches_gate():
    # the q_embed_pca r12 class: a list/ndarray cell crashes the
    # driver's sort_values canonicalizer — this imports the gate's OWN
    # detector (tools/verify_oracle.unhashable_cols), so main() and the
    # test can never drift apart (r13 ADVICE)
    import numpy as np

    from verify_oracle import unhashable_cols as bad_cols

    assert bad_cols(pd.DataFrame({"a": [[1.0, 2.0]]})) == ["a"]
    assert bad_cols(pd.DataFrame({"a": [np.array([1.0])]})) == ["a"]
    assert bad_cols(pd.DataFrame({"a": [{"k": 1}]})) == ["a"]
    assert bad_cols(pd.DataFrame({"a": ["1.0,2.0"], "b": [3]})) == []


def test_nullable_pandas_dtypes_take_numeric_paths():
    # r13 ADVICE: "Int64"/"Float64"/"boolean" (pandas nullable) fell to
    # astype(str) because the dtype sniff was case-sensitive — they must
    # width-normalize like their numpy twins
    out = normalize(pd.DataFrame({"n": pd.array([7, 8], dtype="Int64")}))
    assert str(out["n"].dtype) == "int64"
    out = normalize(pd.DataFrame({"x": pd.array([1.5], dtype="Float64")}))
    assert str(out["x"].dtype) == "float64"
    s = pd.DataFrame({"n": pd.array([42], dtype="Int64")})
    d = pd.DataFrame({"n": pd.array([42], dtype="int64")})
    assert compare(s, d) == []
    # nullable int WITH an NA cell compares on the float path (the
    # counterpart engine surfaces such columns as float64)
    s = pd.DataFrame({"n": pd.array([42, None], dtype="Int64")})
    d = pd.DataFrame({"n": [42.0, float("nan")]})
    assert compare(s, d) == []
    # and an int-vs-float VALUE skew must still be a problem
    s = pd.DataFrame({"n": pd.array([42], dtype="Int64")})
    d = pd.DataFrame({"n": [42.5]})
    assert compare(s, d), "value skew hidden by nullable-int path"
