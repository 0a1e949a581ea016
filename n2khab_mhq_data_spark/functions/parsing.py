"""Locale-aware measurement parsing (kernel K6's expression library).

The reference's EAV pipelines parse messy field-measurement strings scattered
across HT31xx/HT3260_data_preparation.Rmd:241-317:

- comma decimal separators (read_csv2 locale): ``"1,5"`` -> 1.5
- limit-of-quantification markers: ``"<0,5"`` (below LOQ), ``">10"`` (above)
- sentinel class codes mapped to numbers (``"ZS"`` -> 0.5, ``"0-x-1"`` -> 0.5,
  ``"9X"`` -> 100)
- unit suffixes glued to numbers (``"g10m²"``)

SURVEY.md §7.4.4 calls for one well-tested parse_measurement library instead
of ad-hoc regexes; this is it. All pure Column expressions — JVM-side,
whole-stage-codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# default sentinel map observed in the reference (HT31xx:286-292, HT3260:242-249)
DEFAULT_SENTINELS: dict[str, float] = {"ZS": 0.5, "0-x-1": 0.5, "9X": 100.0}


def strip_loq(raw: Column) -> Column:
    """Remove leading < / > markers and surrounding whitespace."""
    return F.trim(F.regexp_replace(raw, r"^\s*[<>]", ""))


def is_below_loq(raw: Column) -> Column:
    return F.trim(raw).startswith("<")


def is_above_loq(raw: Column) -> Column:
    return F.trim(raw).startswith(">")


def parse_locale_number(raw: Column) -> Column:
    """Comma-decimal string -> double; non-numeric -> null (R as.numeric
    semantics). Strips digit-group dots ONLY when a comma decimal follows
    (``"1.234,5"``), else treats dot as decimal point. Matches R's
    accepted lexicon: optional +/- sign, ``5.`` / ``.5`` partial-decimal
    forms, and exponent notation (``1,5e3`` -> 1500.0) all parse;
    anything else (ranges, times, space-grouped digits) is NULL, never
    a fabricated prefix value."""
    s = F.trim(raw)
    # "1.234,5" -> "1234,5"
    s = F.when(
        s.rlike(r"^[+-]?\d{1,3}(\.\d{3})+,\d+$"),
        F.regexp_replace(s, r"\.", ""),
    ).otherwise(s)
    s = F.regexp_replace(s, ",", ".")
    return F.when(
        s.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"),
        s.cast("double"),
    )


def parse_measurement(
    raw: Column, sentinels: dict[str, float] | None = None
) -> dict[str, Column]:
    """Full K6 parse: returns the EAV payload columns
    ``value_numeric / is_below_LOQ / is_above_LOQ / is_numeric``.

    Order of attack (mirrors HT31xx_data_preparation.Rmd:241-317):
    sentinel decode -> LOQ flag + strip -> unit-suffix strip -> locale parse.
    """
    sentinels = DEFAULT_SENTINELS if sentinels is None else sentinels
    below, above = is_below_loq(raw), is_above_loq(raw)
    stripped = strip_loq(raw)
    # strip a trailing unit glued to the number ("10m²", "5g"): take the
    # numeric head ONLY when the remainder is digit-free — otherwise
    # "1 234,5" / "1-2" / "12:30" would silently parse as 1.0 / 1.0 /
    # 12.0 (a confident wrong value where R's as.numeric says NA). A
    # digit-bearing tail falls through to the full-string parse, which
    # NULLs it.
    unit_tailed = stripped.rlike(r"^[+-]?[\d.,]+\D*$")
    head = F.when(
        unit_tailed, F.regexp_extract(stripped, r"^([+-]?[\d.,]+)", 1)
    ).otherwise(F.lit(""))
    numeric = parse_locale_number(F.when(head != "", head).otherwise(stripped))

    sentinel_value = F.lit(None).cast("double")
    for code, val in sentinels.items():
        sentinel_value = F.when(F.trim(raw) == code, F.lit(val)).otherwise(
            sentinel_value
        )

    value_numeric = F.coalesce(sentinel_value, numeric)
    return {
        "value_numeric": value_numeric,
        "is_below_LOQ": F.coalesce(below, F.lit(False)),
        "is_above_LOQ": F.coalesce(above, F.lit(False)),
        "is_numeric": value_numeric.isNotNull(),
    }
