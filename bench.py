"""Benchmark harness (driver contract): headline engine + query times.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The engine bench encodes a deterministic synthetic transcript table
(size scaled to the sf) and reports turns/sec + bytes/turn vs the
reference snappy-parquet footprint. Query benches run the headline
operators over the sf tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from parquet_converter_spark.decode_job import decode_table
    from parquet_converter_spark.encode_job import encode_table
    from parquet_converter_spark.reference import write_reference_parquet
    from parquet_converter_spark.schema import TRANSCRIPT_SCHEMA
    from parquet_converter_spark.session import get_spark
    from parquet_converter_spark.synth import synth_distributed
    from parquet_converter_spark.tableio import ParquetDirTableIO
    from parquet_converter_spark.verify import verify_decode, verify_decode_digest

    spark = get_spark(app="pcs-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="pcs_bench_")
    queries: dict[str, float] = {}
    extra: dict = {}
    try:
        # ---- engine bench on synthetic transcripts (seeded, scaled)
        n_convs = max(200, int(100_000 * sf))
        src = os.path.join(tmp, "src")
        synth_distributed(spark, n_convs, seed=42).write.mode("overwrite").parquet(src)
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(src)
        n_rows = df.count()

        # best-of-2: the sandbox VM shows 2-4x noisy-neighbor swings
        # between back-to-back runs (see BENCH/BASELINE.md); the better
        # rep approximates steady-state throughput. Both reps reported.
        encode_reps = []
        for rep in range(2):
            enc_dir = os.path.join(tmp, f"enc{rep}")
            io = ParquetDirTableIO(spark, enc_dir)
            t0 = time.time()
            summary = encode_table(spark, df, io, run_id="bench", salt_rows=32_768)
            encode_reps.append(round(time.time() - t0, 3))
        t_encode = min(encode_reps)
        queries["encode"] = t_encode
        extra["encode_reps"] = encode_reps

        t0 = time.time()
        decoded = decode_table(spark, io)
        result = verify_decode(decoded, df)
        t_decode_verify = time.time() - t0
        queries["decode_verify"] = round(t_decode_verify, 3)
        if not result["ok"]:
            print(json.dumps({"metric": "FAILED_VERIFY", "value": -1, "unit": "sec", "detail": result}))
            return 1

        # scan-cost digest verify (the at-scale default since r3) —
        # benched ALONGSIDE the join mode, not instead of it, so the
        # decode_verify series stays comparable across rounds
        t0 = time.time()
        dresult = verify_decode_digest(decode_table(spark, io), df)
        queries["decode_verify_digest"] = round(time.time() - t0, 3)
        if not dresult["ok"]:
            print(json.dumps({"metric": "FAILED_DIGEST_VERIFY", "value": -1, "unit": "sec", "detail": dresult}))
            return 1

        # zone-map payoff: a 5% event-time window via block skipping vs
        # the same window as full decode + row filter
        from pyspark.sql import functions as F

        from parquet_converter_spark import checkpoint as ckpt
        from parquet_converter_spark.decode_job import decode_time_slice

        bounds = ckpt.committed_blocks(io).agg(
            F.min("ts_min").alias("lo"), F.max("ts_max").alias("hi")
        ).collect()[0]
        span = bounds["hi"] - bounds["lo"]
        w_lo = bounds["lo"] + span * 0.40
        w_hi = bounds["lo"] + span * 0.45
        t0 = time.time()
        sliced = decode_time_slice(spark, io, w_lo, w_hi).count()
        queries["decode_time_slice"] = round(time.time() - t0, 3)
        t0 = time.time()
        full_filtered = (
            decode_table(spark, io)
            .where((F.col("ts") >= F.lit(w_lo)) & (F.col("ts") <= F.lit(w_hi)))
            .count()
        )
        queries["decode_full_filter"] = round(time.time() - t0, 3)
        if sliced != full_filtered:
            print(json.dumps({"metric": "FAILED_SLICE", "value": -1, "unit": "sec",
                              "detail": {"sliced": sliced, "full": full_filtered}}))
            return 1
        extra["slice_rows"] = sliced

        ref_bytes = write_reference_parquet(df, os.path.join(tmp, "ref"))
        extra["turns"] = n_rows
        extra["turns_per_sec"] = round(n_rows / t_encode, 1)
        extra["decode_turns_per_sec"] = round(n_rows / t_decode_verify, 1)
        extra["encoded_bytes_per_turn"] = round(summary["encoded_bytes"] / n_rows, 2)
        extra["reference_bytes_per_turn"] = round(ref_bytes / n_rows, 2)
        extra["compression_vs_reference"] = round(ref_bytes / summary["encoded_bytes"], 3)

        # ---- headline operator queries over the sf tables
        q = entrymod.queries()
        for name in [
            "filter_project_agg",
            "numeric_profile",
            "value_counts_top5",
            "profile_all_columns",
            "anti_join_resume",
            "typed_cast_battery",
            "ann_topk_cosine",
            "token_count_stats",
            "minhash_dup_candidates",
            "simhash_fingerprints",
            "embedding_compression",
            "ivf_ann_topk",
        ]:
            t0 = time.time()
            rows = q[name](spark, sf_dir).collect()
            queries[name] = round(time.time() - t0, 3)
            del rows

        total = round(sum(queries.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "encode_wall_sec",
                    "value": queries["encode"],
                    "unit": "sec",
                    "queries": queries,
                    "sf": sf,
                    "total_sec": total,
                    **extra,
                }
            )
        )
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
