"""CLI entry point: run any registered pipeline by name and write its
result as parquet (or print a preview).

Usage:
    python scripts/run_query.py NAME [SF_DIR] [--out DIR] [--limit N]

``NAME`` is any key of ``__ray_entry__.queries()`` (``--list`` prints
them). This script OWNS its Ray session (init + shutdown), unlike the
library/driver surface which never does.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", help="write result parquet under this dir")
    ap.add_argument("--limit", type=int, default=10, help="preview rows")
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import __ray_entry__ as entrymod

    if args.list or not args.name:
        for name in entrymod.queries():
            marker = "sql" if name in entrymod.oracle_sql() else "row"
            print(f"{marker}  {name}")
        return 0

    qs = entrymod.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        result = qs[args.name](args.sf_dir)
        if isinstance(result, ray.data.Dataset):
            if args.out:
                result.write_parquet(args.out)
                print(f"wrote {args.out}")
            else:
                df = result.limit(args.limit).to_pandas()
                print(df.to_string())
        else:
            import pandas as pd

            df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                df.to_parquet(os.path.join(args.out, f"{args.name}.parquet"))
                print(f"wrote {args.out}/{args.name}.parquet")
            else:
                print(df.head(args.limit).to_string())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
