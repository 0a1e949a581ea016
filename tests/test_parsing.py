"""parse_measurement expression-library tests (K6 locale/LOQ/sentinel
semantics, HT31xx_data_preparation.Rmd:241-317)."""

from __future__ import annotations

from pyspark.sql import functions as F

from n2khab_mhq_data_spark.functions.parsing import parse_measurement


def test_parse_measurement_cases(spark):
    rows = [
        ("1,5",), ("<0,5",), (">10",), ("ZS",), ("0-x-1",), ("9X",),
        ("10m²",), ("abc",), ("  2,25 ",), ("1.234,5",), ("-3,5",), (None,),
    ]
    df = spark.createDataFrame(rows, "raw string")
    p = parse_measurement(F.col("raw"))
    out = {
        r.raw: (r.v, r.below, r.above, r.isnum)
        for r in df.select(
            "raw",
            p["value_numeric"].alias("v"),
            p["is_below_LOQ"].alias("below"),
            p["is_above_LOQ"].alias("above"),
            p["is_numeric"].alias("isnum"),
        ).collect()
    }
    assert out["1,5"] == (1.5, False, False, True)
    assert out["<0,5"] == (0.5, True, False, True)
    assert out[">10"] == (10.0, False, True, True)
    assert out["ZS"] == (0.5, False, False, True)       # sentinel
    assert out["0-x-1"] == (0.5, False, False, True)    # sentinel
    assert out["9X"] == (100.0, False, False, True)     # sentinel
    assert out["10m²"] == (10.0, False, False, True)    # unit suffix
    assert out["abc"] == (None, False, False, False)
    assert out["  2,25 "] == (2.25, False, False, True)
    assert out["1.234,5"] == (1234.5, False, False, True)  # group dots
    assert out["-3,5"] == (-3.5, False, False, True)
    assert out[None] == (None, False, False, False)


from hypothesis import given, settings, strategies as st


@st.composite
def rendered_measurement(draw):
    """A locale-rendered numeric string + its expected parse."""
    value = draw(
        st.decimals(
            min_value=-99999, max_value=99999, places=draw(st.integers(0, 4)),
            allow_nan=False, allow_infinity=False,
        )
    )
    text = str(value).replace(".", ",")
    marker = draw(st.sampled_from(["", "<", ">"]))
    suffix = draw(st.sampled_from(["", "m²", "g", "cm"]))
    # unit suffixes only attach to positive plain numbers in the source data
    if value < 0:
        suffix = ""
    return (
        f"{marker}{text}{suffix}",
        float(value),
        marker == "<",
        marker == ">",
    )


@settings(max_examples=12, deadline=None)
@given(st.lists(rendered_measurement(), min_size=1, max_size=40))
def test_parse_measurement_roundtrip(spark, cases):
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    p = parse_measurement(F.col("raw"))
    got = df.select(
        "raw",
        p["value_numeric"].alias("v"),
        p["is_below_LOQ"].alias("below"),
        p["is_above_LOQ"].alias("above"),
    ).collect()
    expected = {c[0]: c[1:] for c in cases}
    for r in got:
        v, below, above = expected[r.raw]
        assert r.v is not None and abs(r.v - v) < 1e-9, (r.raw, r.v, v)
        assert (r.below, r.above) == (below, above), r.raw


def test_parse_measurement_never_fabricates_prefix_values(spark):
    """Digit-bearing tails (space-grouped numbers, ranges, times) must
    be NULL — not the confident numeric prefix; genuine unit suffixes
    and R-lexicon forms (exponent, +sign, trailing dot) still parse."""
    from pyspark.sql import functions as F

    cases = {
        "1 234,5": None,
        "1-2": None,
        "12:30": None,
        "10m²": 10.0,
        "5g": 5.0,
        "1,5e3": 1500.0,
        "+0,5": 0.5,
        "5.": 5.0,
        ".5": 0.5,
        "1.234,5": 1234.5,
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    parsed = parse_measurement(F.col("raw"))
    out = {
        r["raw"]: (r["value_numeric"], r["is_numeric"])
        for r in df.select(
            "raw",
            parsed["value_numeric"].alias("value_numeric"),
            parsed["is_numeric"].alias("is_numeric"),
        ).collect()
    }
    for raw, want in cases.items():
        got, flag = out[raw]
        if want is None:
            assert got is None and not flag, (raw, got)
        else:
            assert got is not None and abs(got - want) < 1e-9 and flag, (
                raw, got,
            )
