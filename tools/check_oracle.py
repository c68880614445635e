#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --scale [sfDir] [verifyOutDir]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views of
the sfDir parquet tables, and compares against the Spark parquet dump at
<verifyOutDir>/<name>/ — columns sorted by name, rows sorted by all columns,
exact value equality.

--scale (r15 verdict task 6): the second-scale-factor vacuity audit.
Seven r15 gate fixtures were vacuous at sf0.01 specifically (all-distinct
corpus, no ts ties, groups smaller than any sketch accuracy, ...), so
scale-dependence is the known failure pattern. This mode runs Verify over
SCALE_GATES — the most data-dependent gate families (dedup/store, funnel/
retention/session, geo ranges, quantiles, seeded draws, global cuts) — at
sf0.1 (default) and hash-compares them against DuckDB. A round-close
check, not per-commit: it forks an sbt Verify run (~5 min at sf0.1).
"""
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The most data-dependent gates: oracle semantics that bind (or go
# vacuous) as group sizes, duplicate rates, tie density, and range
# coverage move with the scale factor.
SCALE_GATES = [
    # dedup + incremental stores (duplicate-rate-dependent)
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_incremental",
    "q_dedup_incremental_near", "q_dedup_store_exact", "q_dedup_store_near",
    "q_line_dedup", "q_url_dedup",
    # event analytics (tie/chain-length-dependent)
    "q_funnel", "q_funnel_increase", "q_sequence_match",
    "q_retention_flags", "q_sessionize",
    # range joins (boundary-coverage-dependent)
    "q_geoip",
    # quantiles (group-size vs sketch-accuracy-dependent)
    "q_link_stats_pct", "q_link_stats_pct_approx",
    # seeded draws + global threshold cuts (population-dependent)
    "q_dsir", "q_quota_sample", "q_quality_band", "q_vocab",
    # bucket-histogram audits (collision structure moves with the corpus)
    "q_minhash_bands", "q_simhash_bands",
    # ANN quality/cost audits (r16 verdict task 4): recall and probe-cost
    # depend on the embedding distribution and cell occupancy — the
    # original scale-bound-vacuity example (nprobe blindness at sf0.01)
    "q_ann_recall", "q_ann_probes", "q_ann_lsh",
    # degree distribution (documents grows 500 -> 5,000 at sf0.1, moving
    # every quantile and the hub share)
    "q_graph_degrees",
    # estimator calibration (pair jaccard spectrum widens with the corpus)
    "q_minhash_calibration",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # datetimes → ns, strip tz for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # Completeness gate: Verify writes errors.json (always, empty when
    # clean) and an output dir per declared query. A query that errored or
    # vanished is a hard FAIL here, never a silent omission.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: verify ERRORED: {msg[:300]}")
        failures += 1
    missing = [n for n in sorted(oracle) if n not in errors
               and not os.path.isdir(f"{out_dir}/{n}")]
    for name in missing:
        print(f"FAIL {name}: no output dir and no error recorded — query vanished")
        failures += 1
    # The inverse omission: a query that DUMPED but has no oracle entry
    # would silently skip every value check here (and the driver records
    # only a weak rows-only entry). Surface each one so an accidentally
    # dropped oracleSql line is visible in local runs — informational,
    # since deliberate rows-only gates (q_compression_ratio: no DuckDB
    # deflate) are a documented state, and a SUBSET Verify run dumps a
    # filtered oracle_sql.json on purpose.
    for entry in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, entry)) and entry not in oracle:
            print(f"NOORACLE {entry}: dumped but value-unchecked "
                  f"(rows-only at the driver)")
    for name, sql in sorted(oracle.items()):
        if name in errors or name in missing:
            continue
        try:
            want = normalize(con.sql(sql).df())
            got = normalize(
                con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            failures += 1
            continue
        # Driver-hash parity: the driver hashes rendered values, so an
        # int64 Spark column vs a float64 oracle column (DuckDB HUGEINT →
        # pandas float64, e.g. SUM(BIGINT)) hash-mismatches even when the
        # values compare equal. Flag any int/float kind split as FAIL.
        kind_bad = [c for c in want.columns
                    if {want[c].dtype.kind, got[c].dtype.kind} == {"i", "f"}]
        if kind_bad:
            print(f"FAIL {name}: int/float dtype split on {kind_bad} "
                  f"(driver hash would mismatch)")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(want, got, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            failures += 1
    return failures


def scale_invariants(out_dir: str) -> int:
    """Structural expectations at the second scale factor, beyond the
    hash-compare (r17 verdict task 6): PASS/FAIL equality would still
    pass if a fixture regression collapsed a genuinely scale-dependent
    surface on BOTH engines at once. q_minhash_calibration's S-curve is
    the scale-dependent gate: its (matches x jacc_band) bucket table
    grew 47 -> 58 buckets from sf0.01 to sf0.1, and a collapsed curve
    (e.g. a shingle/permutation regression making every pair agree)
    would flatten it to a handful of buckets while remaining
    hash-equal. Pin the COVERAGE of both axes at sf0.1."""
    failures = 0
    try:
        df = duckdb.sql("SELECT * FROM parquet_scan("
                        f"'{out_dir}/q_minhash_calibration/*.parquet')").df()
    except Exception as e:
        print(f"FAIL scale-invariant q_minhash_calibration: unreadable: {e}")
        return 1
    buckets = len(df)
    n_matches = df["matches"].nunique()
    n_bands = df["jacc_band"].nunique()
    # measured at sf0.1: 58 buckets, matches spanning >=10 distinct
    # agreement levels, >=6 distinct jaccard deciles; bounds leave room
    # for fixture drift but fire on any collapse of either axis
    checks = [
        ("bucket count", buckets, 50),
        ("distinct matches levels", n_matches, 10),
        ("distinct jaccard bands", n_bands, 6),
    ]
    for label, got, floor_ in checks:
        if got < floor_:
            print(f"FAIL scale-invariant q_minhash_calibration: {label} "
                  f"{got} < {floor_} (S-curve collapsed?)")
            failures += 1
    if failures == 0:
        print(f"PASS scale-invariant q_minhash_calibration "
              f"({buckets} buckets, {n_matches} matches levels, "
              f"{n_bands} bands)")
    return failures


def scale_audit(sf_dir: str, out_dir: str) -> int:
    """Fork a subset Verify run at the second scale factor, then compare."""
    # the forked Verify runs with cwd=repo while main() resolves against
    # THIS process's cwd — absolutize both so relative arguments can't
    # write one tree and compare another
    sf_dir = os.path.abspath(sf_dir)
    out_dir = os.path.abspath(out_dir)
    gates = ",".join(SCALE_GATES)
    print(f"[scale] verifying {len(SCALE_GATES)} data-dependent gates "
          f"against {sf_dir} (sbt Verify run follows)")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir} {gates}"],
        cwd=repo)
    if rc != 0:
        print(f"FAIL scale-audit: Verify exited {rc}")
        return 1
    return main(sf_dir, out_dir) + scale_invariants(out_dir)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--scale"]:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_sf01"
        sys.exit(1 if scale_audit(sf, out) else 0)
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
