"""Driver-simulation: run every queries() entry at a given sf and compare
against oracle_sql() via DuckDB (row count + sorted-column value hash),
mirroring the graft driver's CORRECTNESS check.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0 and hasattr(res, "schema"):
            # Ray quirk: 0-row Dataset → column-less frame; rebuild from schema
            sch = res.schema()
            import pandas as pd

            df = pd.DataFrame({n: pd.Series([], dtype=object) for n in sch.names})
        return df
    return res


def value_hash(df) -> str:
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object or str(s.dtype).startswith("string"):
            vals = s.fillna("\0").astype(str)
        elif "float" in str(s.dtype):
            vals = s.round(9).astype(str)
        else:
            vals = s.astype(str)
        h.update(("|".join(vals) + f"#{col}").encode())
    return h.hexdigest()[:16]


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # the transcript-fixture twins size their fixture from sf (the driver
    # gate runs at 0.01, the default); tell oracle_sql() which scale this
    # sweep runs at so the twin reads the matching fixture
    import os
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    if m:
        os.environ["RAYDEDUP_ORACLE_SF"] = m.group(1)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    inv = getattr(e, "invariant_checks", dict)()
    fails = []
    record = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = _to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:28s} RAY-ERROR {type(ex).__name__}: {ex}")
            fails.append(name)
            record[name] = {"status": "ray_error", "err": f"{type(ex).__name__}: {ex}"}
            continue
        dt = time.time() - t0
        if name not in osql:
            if name in inv:
                try:
                    viol = inv[name](res, con, sf_dir)
                except Exception as ex:
                    viol = [f"invariant check raised {type(ex).__name__}: {ex}"]
                if viol:
                    print(f"{name:28s} INVARIANT-FAIL {viol}")
                    fails.append(name)
                    record[name] = {"status": "invariant_fail", "rows": len(res),
                                    "violations": viol}
                else:
                    print(f"{name:28s} twin-checked rows={len(res):7d}  {dt:6.1f}s")
                    record[name] = {"status": "twin_checked", "rows": len(res),
                                    "sec": round(dt, 1)}
                continue
            print(f"{name:28s} rows-only rows={len(res):7d}  {dt:6.1f}s")
            record[name] = {"status": "rows_only", "rows": len(res), "sec": round(dt, 1)}
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"{name:28s} SQL-ERROR {ex}")
            fails.append(name)
            record[name] = {"status": "sql_error", "err": str(ex)}
            continue
        hr, ho = value_hash(res), value_hash(odf)
        ok = len(res) == len(odf) and hr == ho
        print(
            f"{name:28s} {'OK ' if ok else 'MISMATCH'} rows={len(res):7d}/{len(odf):7d} "
            f"hash={hr}/{ho}  {dt:6.1f}s"
        )
        record[name] = {
            "status": "hash_match" if ok else "mismatch",
            "rows": len(res),
            "oracle_rows": len(odf),
            "hash": hr,
            "sec": round(dt, 1),
        }
        if not ok:
            fails.append(name)
    ray.shutdown()
    if json_out:
        import datetime
        import json

        n_cpus = 8
        summary = {
            "sweep": f"tools/check_contract.py {sf_dir}"
            + (" (full queries() surface)" if not only else " (subset)"),
            "date": datetime.date.today().isoformat(),
            "num_cpus": n_cpus,
            "entries": len(record),
            "hash_match": sum(1 for v in record.values() if v["status"] == "hash_match"),
            "rows_only": sum(1 for v in record.values() if v["status"] == "rows_only"),
            "twin_checked": sum(1 for v in record.values() if v["status"] == "twin_checked"),
            "failures": len(fails),
            "results": record,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    if fails:
        print("FAILED:", fails)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
