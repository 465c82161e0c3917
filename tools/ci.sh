#!/usr/bin/env bash
# One-shot round-state replay: reproduces the driver's gates locally
# without the driver — (1) sbt test, (2) the full Verify dump at sf0.01 +
# DuckDB oracle compare (tools/check_oracle.py, the strictest local
# approximation of CORRECTNESS_r{N}.json), (3) the FULL-SWEEP adversarial
# differential audit (r13 — every query against the hostile corpus), and
# (4) a leak grep mirroring LEAKCHECK.json's pattern families. Exit 0 iff
# all four gates pass.
#
# Usage: tools/ci.sh [sf_dir] [out_dir]
#   sf_dir  default /root/testdata/sf0.01  (the driver's correctness SF)
#   out_dir default target/ci-verify       (wiped per run: Verify deletes
#                                           failed-query dirs, but a RENAMED
#                                           query would leave stale parquet)
#
# Second oracle gate at sf1 (r11): both r10 scale bugs (e22 BIGINT
# overflow, q46 broadcast death) were value-domain-dependent — invisible
# to the sf0.01 hash. Run the same gate against the GenData corpus to
# catch that class by hash instead of by probe:
#   SPARK_GRAFT_CONF="spark.graft.sketch.k=2097152,spark.graft.sketch.topkCap=262144,spark.graft.sketch.pctCap=4194304,spark.graft.sketch.skewCap=2097152" \
#     tools/ci.sh spark-warehouse/sf1 target/ci-verify-sf1
# The conf raises the sketch capacities past sf1's value domains
# (1.11M distinct orderkeys/group, 200k partkeys/group, 2.0M raw
# rows/group for the pct sketch — quantiles weight duplicates, so its
# cap tracks COUNT, not distinct) so the lossless-below-capacity oracle
# contract keeps holding one decade up;
# Verify reads SPARK_GRAFT_CONF like BenchOne. Use SPARK_GRAFT_CPUS=16
# for the sf1 run — 32 threads × the raised sketch buffers OOM a 24g
# heap. Measured r11 (this box, 16 threads/32g): Verify 367 s + DuckDB
# compare 314 s ≈ 11 min, 146/146 pass. The first run paid off
# immediately: it caught the absolute-DF-cap collapse of the d5 family
# (0 rows at 10× density) and sc3's non-total ORDER BY — both invisible
# at sf0.01 (BENCHNOTES r11).
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-target/ci-verify}"
FAILURES=0

note() { printf '\n== %s ==\n' "$*"; }

note "gate 1/4: sbt test"
if sbt -batch test; then
  echo "[ci] sbt test: PASS"
else
  echo "[ci] sbt test: FAIL"
  FAILURES=$((FAILURES + 1))
fi

note "gate 2/4: Verify @ ${SF_DIR} + DuckDB oracle compare"
rm -rf "$OUT_DIR"
if sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" \
    && python3 tools/check_oracle.py "$OUT_DIR" "$SF_DIR"; then
  echo "[ci] verify+oracle: PASS"
else
  echo "[ci] verify+oracle: FAIL"
  FAILURES=$((FAILURES + 1))
fi

note "gate 3/4: full-sweep adversarial differential audit"
# r12's lesson: scoped audits rot — 11 t-family queries regressed to the
# raw split formula because later-added call sites never re-ran the
# scoped audit. The audit scope must match the claim scope AUTOMATICALLY:
# regenerate the hostile corpus from the gate SF and run the ENTIRE query
# surface against it. Skippable only explicitly (CI_SKIP_ADV=1, e.g. when
# iterating on one family with a scoped run instead).
if [ "${CI_SKIP_ADV:-0}" = "1" ]; then
  echo "[ci] adversarial audit: SKIPPED (CI_SKIP_ADV=1)"
else
  ADV_CORPUS="${ADV_CORPUS:-target/ci-adv-corpus}"
  ADV_OUT="${ADV_OUT:-target/ci-adv-out}"
  rm -rf "$ADV_OUT"
  if python3 tools/gen_adversarial.py "$SF_DIR" "$ADV_CORPUS" \
      && sbt -batch "runMain graft.Verify $ADV_CORPUS $ADV_OUT" \
      && python3 tools/check_oracle.py "$ADV_OUT" "$ADV_CORPUS"; then
    echo "[ci] adversarial audit: PASS"
  else
    echo "[ci] adversarial audit: FAIL"
    FAILURES=$((FAILURES + 1))
  fi
fi

note "gate 4/4: leak grep (LEAKCHECK pattern families)"
# Same families LEAKCHECK.json reports on; patterns target the proprietary
# shapes the brief forbids. Scans tracked source + docs, not target/.
LEAK_HITS=$(git ls-files '*.scala' '*.sbt' '*.md' '*.py' '*.sh' \
  | xargs grep -nEi \
      -e 'import (com|io)\.(anthropic|axiom)' \
      -e 'https?://[a-z0-9.-]*\.(anthropic|axiom-internal)' \
      -e 's3://[a-z0-9-]*(internal|anthropic)' \
      -e 'slack\.com/archives' \
      -e '(api|secret)[_-]?key[[:space:]]*=[[:space:]]*["'"'"'][A-Za-z0-9]{16,}' \
      -e 'AXON_[A-Z_]+' \
      2>/dev/null | grep -v 'tools/ci.sh')
if [ -z "$LEAK_HITS" ]; then
  echo "[ci] leak grep: PASS (0 hits)"
else
  echo "[ci] leak grep: FAIL"
  echo "$LEAK_HITS"
  FAILURES=$((FAILURES + 1))
fi

note "summary"
if [ "$FAILURES" -eq 0 ]; then
  echo "[ci] ALL GATES PASS"
else
  echo "[ci] $FAILURES gate(s) FAILED"
fi
exit "$FAILURES"
