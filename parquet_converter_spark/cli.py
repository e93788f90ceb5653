"""spark-submit entry point (reference analog: cli.py:19-83, which
parses argv → Config → convert/analyze dispatch).

Usage (local or spark-submit --py-files engine.zip):

    python -m parquet_converter_spark.cli synth  --out /tmp/t --convs 200
    python -m parquet_converter_spark.cli encode --input /tmp/t --out /tmp/enc
    python -m parquet_converter_spark.cli decode --out /tmp/enc --target /tmp/dec
    python -m parquet_converter_spark.cli verify --input /tmp/t --out /tmp/enc
    python -m parquet_converter_spark.cli report --out /tmp/enc

Exit code 1 on verification failure (reference analog: cli.py:198-200
exits 1 if any stats.errors).
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark


def _io(spark, out: str):
    from .tableio import open_tableio

    return open_tableio(spark, out)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="parquet_converter_spark")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="write a deterministic synthetic transcript table")
    sp.add_argument("--out", required=True)
    sp.add_argument("--convs", type=int, default=200)
    sp.add_argument("--seed", type=int, default=42)

    ep = sub.add_parser("encode", help="encode a transcript table into blocks+manifest")
    ep.add_argument("--input", required=True, help="parquet dir of transcripts")
    ep.add_argument("--out", required=True, help="engine table root")
    ep.add_argument("--codec", default="auto", choices=["auto", "plain", "dict", "rle", "forbp", "delta", "fsst"])
    ep.add_argument("--salt-rows", type=int, default=65_536)
    ep.add_argument("--run-id", default=None)
    ep.add_argument("--max-groups", type=int, default=None)
    ep.add_argument("--no-resume", action="store_true")

    dp = sub.add_parser("decode", help="decode committed blocks back to a transcript table")
    dp.add_argument("--out", required=True)
    dp.add_argument("--target", required=True)
    dp.add_argument("--columns", default=None, help="comma-separated column subset (pruned read)")
    dp.add_argument("--conv-id", default=None, help="decode one conversation (bucket-pruned point lookup)")

    vp = sub.add_parser("verify", help="bit-identical check: decode vs source")
    vp.add_argument("--input", required=True)
    vp.add_argument("--out", required=True)

    rp = sub.add_parser("report", help="manifest/metrics summary (reference: conversion_report.json)")
    rp.add_argument("--out", required=True)

    ap = sub.add_parser("analyze", help="profile parquet tables in a dir (reference --mode analyze)")
    ap.add_argument("--input", required=True, help="dir containing *.parquet tables")
    ap.add_argument("--report", default=None, help="write text report here (default stdout)")
    ap.add_argument("--json", dest="json_out", default=None, help="also write JSON report")

    args = p.parse_args(argv)
    spark = get_spark(app=f"pcs-{args.cmd}", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "synth":
        from .synth import synth_distributed

        df = synth_distributed(spark, args.convs, args.seed)
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"written": args.out, "rows": n}))
        return 0

    if args.cmd == "encode":
        from .encode_job import encode_table
        from .schema import TRANSCRIPT_SCHEMA

        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(args.input)
        summary = encode_table(
            spark,
            df,
            _io(spark, args.out),
            run_id=args.run_id,
            codec=args.codec,
            salt_rows=args.salt_rows,
            resume=not args.no_resume,
            max_groups=args.max_groups,
        )
        print(json.dumps(summary))
        return 0

    if args.cmd == "decode":
        from .decode_job import decode_conversation, decode_table

        io = _io(spark, args.out)
        if args.conv_id:
            decoded = decode_conversation(spark, io, args.conv_id)
        else:
            cols = args.columns.split(",") if args.columns else None
            decoded = decode_table(spark, io, columns=cols)
        decoded.write.mode("overwrite").parquet(args.target)
        print(json.dumps({"written": args.target, "rows": spark.read.parquet(args.target).count()}))
        return 0

    if args.cmd == "verify":
        from .decode_job import decode_table
        from .schema import TRANSCRIPT_SCHEMA
        from .verify import verify_decode

        ref = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(args.input)
        decoded = decode_table(spark, _io(spark, args.out))
        result = verify_decode(decoded, ref)
        print(json.dumps(result))
        return 0 if result["ok"] else 1

    if args.cmd == "report":
        from . import checkpoint as ckpt
        from pyspark.sql import functions as F

        io = _io(spark, args.out)
        manifest = ckpt.read_manifest(io)
        summary = manifest.agg(
            F.count("*").alias("groups"),
            F.sum("n_rows").alias("rows"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
        ).collect()[0]
        by_codec = (
            io.read(ckpt.METRICS)
            .groupBy("column", "codec")
            .agg(F.sum("encoded_bytes").alias("bytes"), F.count("*").alias("groups"))
            .orderBy("column", "codec")
            .collect()
        )
        print(
            json.dumps(
                {
                    "groups": summary["groups"],
                    "rows": summary["rows"],
                    "encoded_bytes": summary["encoded_bytes"],
                    "codecs": [
                        {
                            "column": r["column"],
                            "codec": r["codec"],
                            "bytes": r["bytes"],
                            "groups": r["groups"],
                        }
                        for r in by_codec
                    ],
                }
            )
        )
        return 0

    if args.cmd == "analyze":
        import os

        from .operators.analyzer import analyze_table, format_report, save_json_report
        from .sources.readers import discover_tables

        paths = discover_tables(spark, args.input)
        analyses = {}
        for p in paths:
            name = os.path.basename(p)
            analyses[name] = analyze_table(spark.read.parquet(p))
        text = format_report(analyses)
        if args.report:
            with open(args.report, "w") as f:
                f.write(text)
            print(json.dumps({"written": args.report, "tables": len(analyses)}))
        else:
            print(text)
        if args.json_out:
            save_json_report(analyses, args.json_out)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
