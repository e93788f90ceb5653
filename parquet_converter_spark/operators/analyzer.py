"""Analyzer mode — reference §3.3 (/root/reference/parquet_converter/
analyzer.py:284-355 per-file analysis, :358-513 report rendering).

Distributed recast: every per-file loop becomes ONE fused aggregate
per table (Catalyst computes all column stats in a single scan — the
reference's own fusion trick, converter.py:624-630, applied to the
analyzer's stats too). The report is driver-side formatting of an
already-tiny aggregate result, exactly like the reference's Rich
console render — formatting is not a distributed concern.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.ShortType)


def analyze_table(
    df: DataFrame,
    column_limit: int = 25,
    include_samples: bool = True,
    approx: bool = False,
) -> dict:
    """Fused profile of one table (reference analyzer.py:284-355).

    Returns {row_count, columns: {name: {dtype, nulls, uniques, [min,
    max, mean, median, std]}}} computed in ONE aggregate pass plus one
    small top-5 pass per low-cardinality string column. With
    ``include_samples`` (reference analyzer.py:324-346) it adds
    first/last-3 rows under first-column order and a deterministic
    random-10 sample — each a limit-N job, never a full collect.

    ``approx=True`` is the 100 TB path: exact per-column countDistinct
    expands the aggregate input once per column and exact median fully
    sorts each numeric column — at warehouse scale that dominates the
    scan many times over. HLL (approx_count_distinct, 1% rsd) and
    percentile_approx keep the profile a single streaming aggregate;
    reference semantics (exact) stay the default."""
    fields = df.schema.fields[:column_limit]  # P1 column-limit projection
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for f in fields:
        c = F.col(f.name)
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{f.name}"))
        if approx:
            aggs.append(F.approx_count_distinct(c, rsd=0.01).alias(f"uniq_{f.name}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"uniq_{f.name}"))
        if isinstance(f.dataType, _NUMERIC):
            median = (
                F.percentile_approx(c, 0.5, 10_000)
                if approx
                else F.expr(f"median({f.name})")
            )
            aggs += [
                F.min(c).alias(f"min_{f.name}"),
                F.max(c).alias(f"max_{f.name}"),
                F.avg(c).alias(f"mean_{f.name}"),
                median.alias(f"median_{f.name}"),
                F.stddev_samp(c).alias(f"std_{f.name}"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["_rows"]
    out = {"row_count": n, "columns": {}}
    for f in fields:
        col = {
            "dtype": f.dataType.simpleString(),
            "null_count": int(row[f"nulls_{f.name}"]),
            "null_pct": round(100.0 * row[f"nulls_{f.name}"] / max(n, 1), 2),
            "unique_values": int(row[f"uniq_{f.name}"]),
            "unique_pct": round(100.0 * row[f"uniq_{f.name}"] / max(n, 1), 2),
        }
        if isinstance(f.dataType, _NUMERIC):
            for k in ("min", "max", "mean", "median", "std"):
                v = row[f"{k}_{f.name}"]
                col[k] = round(float(v), 4) if v is not None else None
        # A7: top-5 values only when 0 < uniques <= 20 (analyzer.py:265)
        if 0 < col["unique_values"] <= 20:
            top = (
                df.groupBy(f.name)
                .count()
                .orderBy(F.desc("count"), F.asc(f.name))
                .limit(5)
                .collect()
            )
            col["top_values"] = [
                {"value": str(r[0]), "count": r[1], "pct": round(100.0 * r[1] / max(n, 1), 2)}
                for r in top
            ]
        out["columns"][f.name] = col
    if include_samples and fields and n:
        from .profile import head_n, sample_n, tail_n

        cols = [f.name for f in fields]
        proj = df.select(*cols)
        order = [cols[0]]
        key_expr = "concat_ws('|', " + ", ".join(f"cast({c} as string)" for c in cols) + ")"
        out["first_rows"] = [list(r) for r in head_n(proj, order, 3).collect()]
        out["last_rows"] = [list(r) for r in tail_n(proj, order, 3).collect()]
        out["sample_rows"] = [list(r) for r in sample_n(proj, key_expr, 10).collect()]
    return out


def format_report(analyses: dict[str, dict]) -> str:
    """S11 — text report (reference format_analysis_report,
    analyzer.py:358-513): plain-text render of per-table profiles."""
    lines = ["PARQUET ANALYSIS REPORT", "=" * 60]
    for name, a in analyses.items():
        lines.append(f"\nTable: {name}  rows={a['row_count']:,}")
        lines.append("-" * 60)
        for col, st in a["columns"].items():
            lines.append(
                f"  {col:24s} {st['dtype']:10s} nulls={st['null_count']}"
                f" ({st['null_pct']}%) uniq={st['unique_values']} ({st['unique_pct']}%)"
            )
            if "mean" in st:
                lines.append(
                    f"    min={st['min']} max={st['max']} mean={st['mean']}"
                    f" median={st['median']} std={st['std']}"
                )
            for tv in st.get("top_values", []):
                lines.append(
                    f"    top: {tv['value']!r} x{tv['count']} ({tv['pct']}%)"
                )
        for label, key in (("first", "first_rows"), ("last", "last_rows"), ("sample", "sample_rows")):
            rows = a.get(key)
            if rows:
                lines.append(f"  {label} rows:")
                for r in rows:
                    lines.append("    " + " | ".join(str(v) for v in r))
    return "\n".join(lines) + "\n"


def save_json_report(analyses: dict[str, dict], path: str) -> None:
    """S10 — JSON report sink (reference logging.py:172-224)."""
    with open(path, "w") as f:
        json.dump(analyses, f, indent=2, default=str)
