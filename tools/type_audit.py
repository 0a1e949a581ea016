#!/usr/bin/env python
"""Oracle/Spark output-TYPE audit.

The driver's value-hash is type-sensitive (round-2 red row
``pipeline_pack_sequences``: DuckDB integer ``sum()`` returns HUGEINT where
Spark returns BIGINT — identical values, different hash). ``tools/check.py``
stringifies values so it cannot catch this class. This tool runs every
oracle through DuckDB and every query through Spark at a small sf and flags
any output column whose type pairing is hash-risky:

- DuckDB HUGEINT / INT128 / DECIMAL vs anything (CAST the oracle),
- any Spark/DuckDB pairing outside a small equivalence map.

Usage: python tools/type_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check import duck_connect  # noqa: E402
from n2khab_mhq_data_spark.session import get_spark  # noqa: E402

# DuckDB type name -> the Spark dtype the driver's hash will agree with
_EQUIV = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int", "bigint"},
    "SMALLINT": {"smallint", "int", "bigint"},
    "TINYINT": {"tinyint", "smallint", "int", "bigint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float", "double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
}


def risky(duck_type: str, spark_type: str) -> bool:
    d = duck_type.upper()
    if d.startswith(("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")):
        return True
    d_is_arr = d.endswith("[]")
    s_is_arr = spark_type.startswith("array<") and spark_type.endswith(">")
    if d_is_arr != s_is_arr:
        return True  # scalar vs array can never hash-match
    if d_is_arr:
        return risky(d[:-2], spark_type[len("array<") : -1])
    return spark_type not in _EQUIV.get(d, {spark_type})


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or [n for n in qs if n in oracles]

    spark = get_spark("type_audit")
    con = duck_connect(sf_dir)
    flagged = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            stypes = dict(sdf.dtypes)
            rel = con.sql(oracles[name])
            dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            flagged.append(name)
            continue
        bad = [
            f"{c}: duck={dtypes[c]} spark={stypes.get(c, '<missing>')}"
            for c in dtypes
            if c not in stypes or risky(dtypes[c], stypes[c])
        ]
        if bad:
            print(f"FLAG  {name}: " + " | ".join(bad))
            flagged.append(name)
        else:
            print(f"ok    {name}")
    print(f"\n{len(names) - len(flagged)}/{len(names)} type-clean")
    if flagged:
        print("flagged:", " ".join(flagged))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
