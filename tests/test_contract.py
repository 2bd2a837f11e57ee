"""Full driver-contract smoke: every ``queries()`` entry runs at
sf0.001, and every entry with an ``oracle_sql()`` twin value-matches
DuckDB on the same parquet tables — the in-repo miniature of the
driver's per-round correctness gate, so a registration or semantics
break surfaces in CI before the round runs."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def contract():
    import os

    import __ray_entry__ as entry

    # the transcript-fixture twins size the oracle's fixture from this env
    # var (driver default 0.01) — this suite runs at sf0.001
    os.environ["RAYDEDUP_ORACLE_SF"] = "0.001"
    try:
        return entry.queries(), entry.oracle_sql()
    finally:
        os.environ.pop("RAYDEDUP_ORACLE_SF", None)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _frame(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0 and hasattr(res, "schema"):
            # Ray quirk (mirrored from tools/check_contract.py and the
            # driver): a 0-row Dataset converts to a column-less frame
            # even when schema() is fully typed — rebuild from schema
            sch = res.schema()
            if sch is not None:
                df = pd.DataFrame({n: pd.Series([], dtype=object)
                                   for n in sch.names})
        return df
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


def test_every_query_runs_and_matches_oracle(ray_session, contract, oracle_con):
    qs, osql = contract
    assert set(osql) <= set(qs), "oracle entries without a query"
    failures = []
    for name, fn in qs.items():
        try:
            df = _frame(fn(SF))
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            failures.append(f"{name}: raised {exc!r}")
            continue
        if name not in osql:
            # rows-only check, mirroring the driver's weaker gate
            if df.shape[1] == 0:
                failures.append(f"{name}: empty schema")
            continue
        odf = oracle_con.execute(osql[name]).fetch_df()
        if sorted(df.columns) != sorted(odf.columns):
            failures.append(
                f"{name}: columns {sorted(df.columns)} != oracle {sorted(odf.columns)}"
            )
            continue
        if len(df) != len(odf):
            failures.append(f"{name}: {len(df)} rows != oracle {len(odf)}")
            continue
        if not _canon(df).equals(_canon(odf)):
            failures.append(f"{name}: value mismatch")
    assert not failures, "\n".join(failures)


def test_invariant_twins_hold(contract, oracle_con, ray_session):
    """Every invariant twin (the certification layer for rows-only
    queries — see __ray_entry__.invariant_checks) passes at sf0.001, so
    the layer can't rot between driver sweeps."""
    import os

    import __ray_entry__ as entry

    qs, _ = contract
    inv = entry.invariant_checks()
    assert set(inv) <= set(qs), "invariant entries without a query"
    os.environ["RAYDEDUP_ORACLE_SF"] = "0.001"
    try:
        failures = []
        for name, check in inv.items():
            res = _frame(qs[name](SF))
            viol = check(res, oracle_con, SF)
            if viol:
                failures.append(f"{name}: {viol}")
        assert not failures, "\n".join(failures)
    finally:
        os.environ.pop("RAYDEDUP_ORACLE_SF", None)
