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

        # VM-noise discipline (VERDICT r03 what's-wrong #1: the r3
        # driver bench recorded a phantom -25% regression when BOTH of
        # its 2 reps landed in a noisy-neighbor window):
        #   1. settled pre-probe — the same numpy bandwidth kernel the
        #      perf floors use, re-probed with 2s settles, so a known-
        #      degraded box is recorded as such up front;
        #   2. an UNTIMED warmup encode (first rep of a fresh session
        #      carries Python-UDF worker boot + codec JIT);
        #   3. best-of-3 measured reps + a rep-disagreement flag: if
        #      max/min > 1.5x the record self-identifies as degraded
        #      instead of standing as an official regression.
        def _probe() -> float:
            import numpy as np

            a = np.random.default_rng(1).integers(0, 255, 8_000_000, dtype=np.uint64)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                b = (a >> np.uint64(3)) & np.uint64(7)
                np.packbits((b & np.uint64(1)).astype(np.uint8))
                best = min(best, time.perf_counter() - t0)
            return max(1.0, best / 0.028)  # unloaded-sandbox baseline

        pre_probe = _probe()
        for _ in range(3):
            if pre_probe <= 2.0:
                break
            time.sleep(2.0)
            pre_probe = _probe()
        extra["pre_probe_slowdown"] = round(pre_probe, 2)

        warm_dir = os.path.join(tmp, "enc_warm")
        encode_table(
            spark,
            df.limit(20_000),
            ParquetDirTableIO(spark, warm_dir),
            run_id="bench-warmup",
            salt_rows=32_768,
        )

        encode_reps = []
        for rep in range(3):
            enc_dir = os.path.join(tmp, f"enc{rep}")
            io = ParquetDirTableIO(spark, enc_dir)
            t0 = time.time()
            summary = encode_table(spark, df, io, run_id="bench", salt_rows=32_768)
            encode_reps.append(round(time.time() - t0, 3))
        t_encode = min(encode_reps)
        queries["encode"] = t_encode
        extra["encode_reps"] = encode_reps
        rep_spread = max(encode_reps) / min(encode_reps)
        extra["encode_rep_spread"] = round(rep_spread, 2)
        extra["degraded"] = bool(rep_spread > 1.5 or pre_probe > 2.0)

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

        # ---- time-clustered batch encode (r4, hour-granularity r5):
        # same table encoded with time_bucket=hour — the ts zone maps
        # now prune on the BATCH path (the r3 control above shows
        # hash-bucket batch encode prunes 0%). Hour windows give tight
        # slices immediately but under-filled blocks at this sf (the
        # ingest shape: hourly epochs); the paired WINDOW-PRESERVING
        # compaction below repairs fill at a planner-chosen coarser
        # window that keeps the touched fraction ≈ the slice fraction.
        def _touched(blocks_df):
            # mirrors decode_time_slice's block predicate exactly:
            # zone-map overlap, null stats kept, MINUS blocks proven
            # all-null-ts (the sentinel window — never matches a slice)
            return blocks_df.where(
                (F.col("ts_min").isNull() | (F.col("ts_min") <= F.lit(w_hi)))
                & (F.col("ts_max").isNull() | (F.col("ts_max") >= F.lit(w_lo)))
                & ~F.col("ts_nulls").eqNullSafe(F.col("n_rows"))
            ).count()

        tb_dir = os.path.join(tmp, "enc_tb")
        tb_io = ParquetDirTableIO(spark, tb_dir)
        t0 = time.time()
        tb_summary = encode_table(
            spark, df, tb_io, run_id="bench-tb", salt_rows=32_768,
            time_bucket="hour",
        )
        queries["encode_time_bucketed"] = round(time.time() - t0, 3)
        tb_blocks = ckpt.committed_blocks(tb_io)
        extra["tb_total_blocks"] = tb_blocks.count()
        extra["tb_touched_blocks"] = _touched(tb_blocks)
        extra["tb_encoded_bytes_per_turn"] = round(tb_summary["encoded_bytes"] / n_rows, 2)
        t0 = time.time()
        tb_sliced = decode_time_slice(spark, tb_io, w_lo, w_hi).count()
        queries["decode_time_slice_tb"] = round(time.time() - t0, 3)
        if tb_sliced != full_filtered:
            print(json.dumps({"metric": "FAILED_TB_SLICE", "value": -1, "unit": "sec",
                              "detail": {"tb_sliced": tb_sliced, "full": full_filtered}}))
            return 1

        # lifecycle maintenance: window-preserving compaction of the
        # hourly slivers at a planner-chosen coarser window, then
        # digest-verify the swap was invisible to readers. The touched
        # fraction on the 5% slice must stay ≈ the slice fraction
        # (≤ max_touch_frac) after blocks grow to full size.
        from parquet_converter_spark.maintenance import compact_blocks, vacuum_blocks
        from parquet_converter_spark.partitioning import plan_compact_time_bucket

        span_secs = span.total_seconds()
        compact_w = plan_compact_time_bucket(
            span_secs, n_rows, chunk_rows=65_536,
            slice_secs=(w_hi - w_lo).total_seconds(), max_touch_frac=0.10,
        )
        extra["compact_window_secs"] = compact_w
        t0 = time.time()
        cres = compact_blocks(spark, tb_io, min_fill=0.5, chunk_rows=65_536,
                              salt_rows=32_768, time_bucket=compact_w)
        queries["compact_tb"] = round(time.time() - t0, 3)
        extra["compact_blocks_before"] = cres["blocks_before"]
        extra["compact_blocks_after"] = cres["blocks_after"]
        t0 = time.time()
        vres = vacuum_blocks(spark, tb_io)
        queries["vacuum_tb"] = round(time.time() - t0, 3)
        extra["vacuum_bytes_reclaimed"] = vres["bytes_reclaimed"]
        tb_blocks2 = ckpt.committed_blocks(tb_io)
        extra["tb_blocks_after_compact"] = tb_blocks2.count()
        extra["tb_touched_after_compact"] = _touched(tb_blocks2)
        t0 = time.time()
        tb_sliced2 = decode_time_slice(spark, tb_io, w_lo, w_hi).count()
        queries["decode_time_slice_tb_compacted"] = round(time.time() - t0, 3)
        if tb_sliced2 != full_filtered:
            print(json.dumps({"metric": "FAILED_TB_SLICE_COMPACTED", "value": -1,
                              "unit": "sec",
                              "detail": {"tb_sliced": tb_sliced2, "full": full_filtered}}))
            return 1
        cver = verify_decode_digest(decode_table(spark, tb_io), df)
        if not cver["ok"]:
            print(json.dumps({"metric": "FAILED_COMPACT_VERIFY", "value": -1,
                              "unit": "sec", "detail": cver}))
            return 1

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
            "ann_topk_batch",
            "token_count_stats",
            "minhash_dup_candidates",
            "simhash_fingerprints",
            "simhash_near_dups",
            "embedding_compression",
            "ivf_ann_topk",
        ]:
            t0 = time.time()
            rows = q[name](spark, sf_dir).collect()
            queries[name] = round(time.time() - t0, 3)
            del rows

        # persisted IVF index: build once (timed), then the repeated
        # point query — the number that matters for a query-serving
        # workload is the per-query cost WITHOUT retrain/reassign
        from parquet_converter_spark.operators import similarity

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
        idx_dir = os.path.join(tmp, "ivf_idx")
        t0 = time.time()
        similarity.ivf_build_index(spark, emb, idx_dir, n_cells=16)
        queries["ivf_build_index"] = round(time.time() - t0, 3)
        similarity.ivf_query(spark, idx_dir, qvec, k=10, n_probe=4).collect()  # warm
        t0 = time.time()
        similarity.ivf_query(spark, idx_dir, qvec, k=10, n_probe=4).collect()
        queries["ivf_index_query"] = round(time.time() - t0, 3)

        # IVF-SQ8: int8-stored index (Faiss IVF-SQ8 layout) — report
        # the size win and the per-query cost with in-flight dequant
        sq8_dir = os.path.join(tmp, "ivf_idx_sq8")
        t0 = time.time()
        similarity.ivf_build_index(spark, emb, sq8_dir, n_cells=16, store_codec="fq8")
        queries["ivf_build_index_sq8"] = round(time.time() - t0, 3)

        def _dir_bytes(d):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            )

        extra["ivf_index_bytes"] = _dir_bytes(os.path.join(idx_dir, "vectors"))
        extra["ivf_sq8_index_bytes"] = _dir_bytes(os.path.join(sq8_dir, "vectors"))
        similarity.ivf_query(spark, sq8_dir, qvec, k=10, n_probe=4).collect()  # warm
        t0 = time.time()
        similarity.ivf_query(spark, sq8_dir, qvec, k=10, n_probe=4).collect()
        queries["ivf_sq8_index_query"] = round(time.time() - t0, 3)

        # ---- approximation-quality metrics (r5): latency without
        # recall is half a benchmark — every approximate path is scored
        # against its exact oracle on the same sf tables.
        # recall CURVES (mean over 3 query vectors), not single points:
        # the knob (multi_probe / n_probe) must visibly buy recall for
        # scan fraction, and probing everything must converge to exact.
        # LSH expected scan fraction at n_planes=8: Σ C(8,0..m)/256 =
        # 3.5% / 14.5% / 36% for m=1/2/3.
        dim = len(qvec)
        qids = [0, 101, 202]
        qvecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.where(F.col("vec_id").isin(qids)).collect()
        }
        exact_ids = {
            i: {r["vec_id"] for r in similarity.cosine_topk(emb, v, k=10).collect()}
            for i, v in qvecs.items()
        }

        def _mean_recall(fn) -> float:
            vals = [
                len(exact_ids[i] & {r["vec_id"] for r in fn(v).collect()}) / 10
                for i, v in qvecs.items()
            ]
            return round(sum(vals) / len(vals), 3)

        extra["recall_at_10"] = {
            "lsh_multi_probe": {
                str(m): _mean_recall(
                    lambda v, m=m: similarity.ann_topk(
                        emb, v, dim, k=10, n_planes=8, multi_probe=m
                    )
                )
                for m in (1, 2, 3)
            },
            # n_probe=16 probes every cell — must converge to exact
            # (recall 1.0): the curve's sanity endpoint
            "ivf_index_n_probe": {
                str(p): _mean_recall(
                    lambda v, p=p: similarity.ivf_query(spark, idx_dir, v, k=10, n_probe=p)
                )
                for p in (2, 4, 8, 16)
            },
            "ivf_ann_topk_n_probe_4": _mean_recall(
                lambda v: similarity.ivf_ann_topk(emb, v, k=10, n_cells=16, n_probe=4)
            ),
            # must track ivf_index_n_probe at the same probe count:
            # quantized STORAGE costs nothing extra on this corpus
            "ivf_sq8_index_n_probe_4": _mean_recall(
                lambda v: similarity.ivf_query(spark, sq8_dir, v, k=10, n_probe=4)
            ),
        }

        # quality cost of quantized STORAGE: exact cosine search over
        # the fq8/fpq roundtripped embeddings vs float32 truth — the
        # number a pipeline owner reads next to the compression ratio
        # before flipping a corpus to a lossy codec
        from parquet_converter_spark.operators import embcodec

        qstore = {}
        for codec in ("fq8", "fpq"):
            qdf = embcodec.quantize_roundtrip(emb, codec).cache()
            qdf.count()
            qstore[codec] = _mean_recall(
                lambda v, q=qdf: similarity.cosine_topk(q, v, k=10)
            )
            qdf.unpersist()
        extra["recall_at_10"]["quantized_storage_exact"] = qstore

        # pair-recall of the bucketed embedding near-dup path vs the
        # exact O(n²) closest-pairs oracle at the driver query's
        # threshold (precision is 1.0 by construction: every emitted
        # pair carries its exact cosine)
        thr = 0.35
        truth_k = 2000
        truth_rows = similarity.closest_pairs(emb, k=truth_k).collect()
        truth_pairs = {
            (r["a_id"], r["b_id"]) for r in truth_rows if r["cos_sim"] >= thr
        }
        # a full truth_k result means the top-k cap truncated the truth
        # set to the easiest (highest-cosine) pairs — recall would be
        # inflated; surface it instead of silently reporting
        extra["near_dup_truth_capped"] = bool(
            len(truth_rows) == truth_k and truth_rows[-1]["cos_sim"] >= thr
        )
        lsh_pairs = {
            (r["a_id"], r["b_id"])
            for r in similarity.lsh_near_dup_pairs(
                emb, threshold=thr, dim=dim, planes_per_band=4, bands=16
            ).collect()
        }
        extra["lsh_pair_recall"] = round(
            len(lsh_pairs & truth_pairs) / max(1, len(truth_pairs)), 3
        )
        extra["near_dup_truth_pairs"] = len(truth_pairs)

        # MinHash/LSH text near-dup pair-recall vs brute-force n-gram
        # Jaccard on a deterministic 400-doc subset. The raw documents
        # table has no pairs above the threshold in a 400-doc sample
        # (truth set would be empty → recall undefined), so SEED known
        # positives: 150 docs get a deterministic ~5% token-dropout
        # near-copy (xxhash64(word, idx, doc_id) keeps it seedless and
        # engine-reproducible), giving shingle-Jaccard ≈ 0.7-0.8 pairs
        # the truth join must find and the MinHash path must recover.
        from parquet_converter_spark.operators import dedup as dedup_ops

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        base = docs.orderBy("doc_id").limit(250).select("doc_id", "text")
        mutated = base.limit(150).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.array_join(
                F.filter(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.pmod(F.xxhash64(w, i, F.col("doc_id")), F.lit(20))
                    < F.lit(19),
                ),
                " ",
            ).alias("text"),
        )
        sub = base.unionByName(mutated).cache()
        a = sub.select(F.col("doc_id").alias("a_id"))
        b = sub.select(F.col("doc_id").alias("b_id"))
        all_pairs = a.join(b, F.col("a_id") < F.col("b_id"))
        jthr = 0.5
        truth_mh = {
            (r["a_id"], r["b_id"])
            for r in dedup_ops.ngram_jaccard(sub, all_pairs)
            .where(F.col("jaccard") >= jthr)
            .collect()
        }
        # 8 bands × 4 rows: detect prob 1-(1-J^4)^8 ≈ 0.95 at J=0.75
        sigs = dedup_ops.minhash_signatures(sub, num_hashes=32)
        cand = dedup_ops.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
        got_mh = {
            (r["a_id"], r["b_id"])
            for r in dedup_ops.ngram_jaccard(sub, cand)
            .where(F.col("jaccard") >= jthr)
            .collect()
        }
        sub.unpersist()
        extra["minhash_pair_recall"] = round(
            len(got_mh & truth_mh) / max(1, len(truth_mh)), 3
        )
        extra["minhash_truth_pairs"] = len(truth_mh)

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
