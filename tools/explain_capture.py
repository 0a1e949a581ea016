#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries into text files.

Usage: python tools/explain_capture.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: the
queries named on the command line; plans are built against
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1). The optimization
rounds commit these as the judge-checkable plan evidence
(plans/r11/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark("explain-capture")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
