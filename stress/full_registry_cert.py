"""Full-registry vanilla certification harness (r11 — makes the r10
wrap's ad-hoc sweep a permanent, reproducible artifact).

Drives EVERY named query (both tiers) in a VANILLA SparkSession from
outside the repo's cwd assumptions, hash-compares each oracled query
against DuckDB at sf0.01, and — the r10 lesson turned into code —
releases per-query session state between queries via
``registry.release_query_state`` so the sweep finishes on a DEFAULT
JVM heap (a 1g vanilla session OOMed after ~80 queries of accumulated
model caches before this existed; PERF.md r10 wrap).

Usage:  python stress/full_registry_cert.py [sf_dir]
Exit code 0 iff every oracled query hash-matches and every no-oracle
query executes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from recsys_spark_spark.plans import registry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: "nan" if pd.isna(v) else "%.6f" % v)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _fresh_session() -> SparkSession:
    # VANILLA on purpose: the driver builds its own session without our
    # configs — sources/readers.py::ensure_session_confs must keep it
    # working (nanos timestamps, UTC)
    return SparkSession.builder.master("local[8]").getOrCreate()


def _session_alive(spark: SparkSession) -> bool:
    try:
        return spark.range(1).count() == 1
    except Exception:  # noqa: BLE001 — liveness probe
        return False


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = _fresh_session()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    registry._load_all()
    allq = {**registry.QUERIES, **registry.DEMOTED}
    fails, t_start = [], time.time()
    for i, name in enumerate(sorted(allq), 1):
        spec = allq[name]
        t0 = time.time()
        # a dead driver JVM (host OOM-kill under co-tenant pressure —
        # observed once in r11: every query from #84 on failed in
        # 0.1 s with opaque Py4J errors) must fail ONE query, not the
        # rest of the sweep: retry each failure once on a fresh session
        for attempt in (1, 2):
            try:
                sdf = spec.fn(spark, sf).toPandas()
                if spec.oracle is None:
                    tag = f"rows-only {len(sdf)}"
                    ok = True
                else:
                    odf = con.sql(spec.oracle).df()
                    a, b = canon(sdf), canon(odf)
                    ok = (
                        list(a.columns) == list(b.columns)
                        and len(a) == len(b)
                        and a.equals(b)
                    )
                    tag = (
                        f"MATCH {len(a)}" if ok else f"MISMATCH {len(a)}/{len(b)}"
                    )
                break
            except Exception as e:  # noqa: BLE001 — harness must finish
                ok = False
                tag = f"ERR {repr(e)[:120]}"
                if attempt == 1 and not _session_alive(spark):
                    print(
                        f"[{i}/{len(allq)}] {name}: session dead — "
                        "restarting JVM and retrying once",
                        flush=True,
                    )
                    try:
                        spark.stop()
                    except Exception:  # noqa: BLE001
                        pass
                    spark = _fresh_session()
                    continue
                break
        if not ok:
            fails.append(name)
        # the r10 lesson as code: flat-memory sweep on any heap
        registry.release_query_state(spark)
        print(f"[{i}/{len(allq)}] {name}: {tag} {time.time()-t0:.1f}s", flush=True)

    print(
        f"done: {len(allq)} queries, {len(fails)} fails in "
        f"{time.time()-t_start:.0f}s  fails={fails}",
        flush=True,
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
