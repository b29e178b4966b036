"""CLI — operate the engine the way the reference is operated via Airflow:

  python -m aws_snowflake_kinesis_airflow_pipeline_spark generate --n 1000 --landing DIR
  python -m aws_snowflake_kinesis_airflow_pipeline_spark ingest --landing DIR --warehouse DIR
  python -m aws_snowflake_kinesis_airflow_pipeline_spark query q1_pricing_summary [--sf-dir DIR]
  python -m aws_snowflake_kinesis_airflow_pipeline_spark list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aws_snowflake_kinesis_airflow_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write synthetic events to a landing zone")
    g.add_argument("--n", type=int, default=1000)
    g.add_argument("--landing", default=None)

    i = sub.add_parser("ingest", help="run the ingest pipeline once (availableNow)")
    i.add_argument("--landing", default=None)
    i.add_argument("--warehouse", default=None)

    q = sub.add_parser("query", help="run a registry query and show results")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=None)
    q.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registry queries")

    args = p.parse_args(argv)

    from .plans.registry import QUERIES

    if args.cmd == "list":
        for name, query in QUERIES.items():
            kind = "oracle" if query.oracle else "rows-only"
            print(f"{name:40s} [{kind}] {query.survey_ref}")
        return 0

    from .config import load_config
    from .session import get_spark

    # cfg drives everything the CLI doesn't override: cpus sizes the
    # session, landing/warehouse default from config (previously the
    # loaded config was dead except for sf_dir — the config module
    # advertised a resolution order the only production caller ignored).
    cfg = load_config()
    spark = get_spark(cpus=cfg.cpus)

    if args.cmd == "generate":
        from .sources.json_landing import write_landing_batch
        from .sources.rate_events import event_batch

        landing = args.landing or cfg.landing_path
        write_landing_batch(event_batch(spark, args.n), landing)
        print(f"wrote {args.n} events to {landing}")
    elif args.cmd == "ingest":
        from .streaming.pipeline import IngestPipeline

        pipe = IngestPipeline(
            spark,
            args.landing or cfg.landing_path,
            args.warehouse or cfg.warehouse_path,
        )
        pipe.run_once()
        print(
            f"batches={pipe.stats.batches} seen={pipe.stats.rows_seen} "
            f"inserted={pipe.stats.rows_inserted} corrupt={pipe.stats.corrupt_rows}"
        )
    elif args.cmd == "query":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; try 'list'", file=sys.stderr)
            return 2
        df = QUERIES[args.name].fn(spark, args.sf_dir or cfg.sf_dir)
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
