#!/usr/bin/env python3
"""Local oracle harness mimicking the driver's correctness gate:
run graft.Verify at a given SF, then execute each oracle_sql.json entry in
DuckDB over the same parquet tables and compare (columns sorted by name,
rows sorted, values hashed). Dev tool only — NOT part of the Spark library.

Crash-proofing (round-10 verdict #1: the driver's CORRECTNESS_r10.json came
back `{}` while every query passes — the compare step most plausibly blew a
time/memory budget and nothing partial survived): verdicts now STREAM to a
results file after every single query (atomic tmp+rename), and each verdict
carries the DuckDB seconds it cost, so a mid-run kill leaves a parseable
partial artifact that also says where the time went.

Usage: python3 tools/check.py [sfdir] [outdir] [results.json]
"""
import json, sys, glob, os, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RESULTS = sys.argv[3] if len(sys.argv) > 3 else os.path.join(OUT, "check_results.json")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical textual form per cell
    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if v != v:
                return "<nan>"
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    # stringify BEFORE sorting: pandas sort_values on ndarray/list cells
    # raises (unhashable) — sort the canonical string rows instead
    rows = [[cell(v) for v in row] for row in df.itertuples(index=False)]
    rows.sort()
    return rows, list(df.columns)


def flush(results, done, total):
    """Atomically rewrite the partial results artifact after every query."""
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"done": done, "total": total, "results": results},
                  f, indent=1, default=str)
    os.replace(tmp, RESULTS)


def main():
    import duckdb, pandas as pd
    with open(os.path.join(OUT, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    # Manifest-aware enumeration (round-11 advice): result dirs alone are
    # NOT evidence of this run's coverage — a reused outDir keeps the
    # previous run's parquet for queries a dead tranche never reached, and
    # comparing those reads green. The manifest (rewritten after every
    # query by graft.Verify) is the source of truth for what THIS run
    # attempted: entries whose status is not 'ok' are forced to that
    # status here, and dirs with no manifest entry are flagged stale.
    manifest = {}
    mpath = os.path.join(OUT, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    names = [n for n in sorted(os.listdir(OUT))
             if os.path.isdir(os.path.join(OUT, n))]
    # manifest entries with no result dir at all (e.g. 'died' before the
    # first write) must still surface as rows in the artifact
    names += [n for n in sorted(manifest) if n not in names]
    for qi, name in enumerate(names):
        if manifest:
            st = manifest.get(name)
            if st is None:
                results[name] = {"status": "stale_result",
                                 "err": "result dir present but query not "
                                        "in this run's manifest"}
                flush(results, qi + 1, len(names))
                continue
            if st != "ok":
                results[name] = {"status": st}
                flush(results, qi + 1, len(names))
                continue
        d = os.path.join(OUT, name)
        t0 = time.time()
        parquets = sorted(glob.glob(f"{d}/*.parquet"))
        if not parquets:
            # a manifest-ok entry whose result dir is missing/empty must
            # surface as its own status, not fall through to the compare
            # as an empty DataFrame and read rowcount/schema_mismatch
            # (round-12 advisor, low: that misattributes the failure)
            results[name] = {"status": "missing_result",
                             "err": "manifest says ok but no parquet under "
                                    + d}
            flush(results, qi + 1, len(names))
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in parquets], ignore_index=True)
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(spark_df),
                             "sec": round(time.time() - t0, 2)}
            flush(results, qi + 1, len(names))
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            # record the seconds HERE too: a budget-blowing oracle that
            # dies after minutes must show its cost, not read as 0 s in
            # the slow-oracle report
            results[name] = {"status": "oracle_error", "err": str(e)[:300],
                             "sec": round(time.time() - t0, 2)}
            flush(results, qi + 1, len(names))
            continue
        sv, sc = norm(spark_df)
        ov, oc = norm(oracle_df)
        sec = round(time.time() - t0, 2)
        if sc != oc:
            results[name] = {"status": "schema_mismatch", "spark": sc, "oracle": oc}
        elif len(sv) != len(ov):
            results[name] = {"status": "rowcount_mismatch", "spark": len(sv), "oracle": len(ov)}
        elif sv != ov:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b][:3]
            results[name] = {"status": "value_mismatch", "rows": len(sv),
                             "first_diffs": [{"row": i, "spark": a, "oracle": b}
                                             for i, a, b in diffs]}
        else:
            results[name] = {"status": "MATCH", "rows": len(sv)}
        results[name]["sec"] = sec
        flush(results, qi + 1, len(names))
        if sec > 3:
            print(f"[check] SLOW {name}: {sec}s", file=sys.stderr)
    ok = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(json.dumps(results, indent=1, default=str))
    slow = sorted(((r.get("sec", 0), n) for n, r in results.items()),
                  reverse=True)[:15]
    print("\nslowest oracles:", file=sys.stderr)
    for sec, n in slow:
        print(f"  {sec:7.2f}s {n}", file=sys.stderr)
    print(f"\n{ok}/{len([n for n in results if n in oracles])} oracle matches; "
          f"{len(results)} queries total; "
          f"{sum(r.get('sec', 0) for r in results.values()):.0f}s compare time")
    return 0 if ok == len([n for n in results if n in oracles]) else 1


if __name__ == "__main__":
    sys.exit(main())
