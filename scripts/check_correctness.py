"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare row-count + schema + sorted values
against oracle_sql() via DuckDB. Rows-only queries get a rows>=0 check.

Usage: python scripts/check_correctness.py [sf_dir] [--only name1,name2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def to_df(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import duckdb
    import ray

    # Point the transcript-family oracles at the fixture tier matching
    # sf_dir (the driver always compares at sf0.01/t2; this keeps the
    # local replica meaningful at other scales).
    from engine import synth

    os.environ["ENGINE_ORACLE_TRANSCRIPT_TIER"] = synth.tier_for_sf_dir(sf_dir)

    ray.init(
        address="local", num_cpus=16, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        try:
            raw = to_df(fn(sf_dir))
            got = canon(raw) if name in oracles else raw
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (rows-only check)")
            continue
        want = canon(con.sql(oracles[name]).df())
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            print(f"OK    {name}: {len(got)} rows match oracle exactly")
        except AssertionError as exc:
            failures.append(name)
            print(f"FAIL  {name}: {str(exc)[:300]}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries green")


if __name__ == "__main__":
    main()
