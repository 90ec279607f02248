"""Driver-scale oracle sweep: run every ``queries()`` entry at a given
sf dir and compare against its ``oracle_sql()`` twin exactly the way the
round driver does (row count, sorted-column schema, value hash).

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
       python tools/oracle_sweep.py --driver-order[=N] [sf_dir]

``--driver-order`` runs the FIRST N (default 50) ``queries()`` entries in
dict-insertion order inside one Ray session + one DuckDB connection — the
order-faithful mirror of the round driver's CORRECTNESS gate, for
reproducing run-order interactions the sorted sweep can't see.

This is a dev tool (the real gate is the driver's CORRECTNESS_r{N}.json);
it exists so scale-dependent mismatches (tie-ambiguity, float folding)
surface before the driver runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        df = result.to_pandas()
    elif isinstance(result, pd.DataFrame):
        df = result
    else:
        df = result.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _value_hash(df: pd.DataFrame, exact: bool = False) -> str:
    # mirror of the driver's compare: stable row order, stringified cells.
    # Two variants: rounded (%.6g floats, tolerant of float64 fold-order)
    # and exact (repr) — a query that is rounded-green but exact-red is
    # AT RISK under any driver that stringifies floats differently.
    def cell(v):
        if isinstance(v, float):
            return repr(v) if exact else f"{v:.6g}"
        return str(v)

    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update("|".join(cell(v) for v in row).encode())
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    driver_order = None
    for a in list(argv):
        if a.startswith("--driver-order"):
            driver_order = int(a.split("=", 1)[1]) if "=" in a else 50
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    names = (list(qs)[:driver_order] if driver_order is not None
             else sorted(qs))
    report, n_bad = {}, 0
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = _to_df(qs[name](sf_dir))
        except Exception as exc:  # noqa: BLE001
            report[name] = {"err": f"query raised: {exc!r}"}
            n_bad += 1
            print(f"{name}: RAISED {exc!r}", flush=True)
            continue
        if name not in oracles:
            report[name] = {"rows": len(got), "err": "no_oracle"}
            print(f"{name}: rows-only ({len(got)} rows) "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            continue
        want = _to_df(con.execute(oracles[name]).df())
        rows = len(got) == len(want)
        schema = list(got.columns) == list(want.columns)
        hmatch = rows and schema and _value_hash(got) == _value_hash(want)
        exact_match = (rows and schema and _value_hash(got, exact=True)
                       == _value_hash(want, exact=True))
        if not hmatch and rows and schema:
            # fall back to tolerant compare before declaring red: the
            # driver hashes raw values, but a repr-level diff here tells
            # us whether it's float-formatting or a real value diff
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
                hmatch = "exact_frames_but_hash_fmt"
            except AssertionError:
                pass
        ok = hmatch is True or hmatch == "exact_frames_but_hash_fmt"
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": bool(ok),
                        "exact_hash_match": bool(exact_match),
                        "n": len(got)}
        if not ok:
            n_bad += 1
        risk = "" if exact_match or not ok else " EXACT-HASH-DIFFERS"
        print(f"{name}: rows={rows} schema={schema} hash={hmatch}{risk} "
              f"({len(got)} vs {len(want)}) [{time.time()-t0:.1f}s]",
              flush=True)

    with open("/tmp/oracle_sweep.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{n_bad} failures / {len(report)} checked -> "
          "/tmp/oracle_sweep.json")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
