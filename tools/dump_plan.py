#!/usr/bin/env python
"""Dump .explain("formatted") for queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plan.py <sf_dir> <suffix> <query> [<query> ...]
Writes plans/r11/<query>_<suffix>.txt (the optimization-round evidence
files the judge checks plan claims against).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, suffix, *names = sys.argv[1:]
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(cpus=32)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
