#!/bin/sh
# Canonical test-count aggregation over the ScalaTest JUnit XML reports —
# the round-close source of truth for the counts quoted in README.md and
# SURVEY.md. Three rounds in a row the hand-edited numbers missed the XML
# aggregate by one (r17 verdict item 3); the sync is now this script's
# output, never a hand count.
#
# Usage: tools/test_counts.sh [reports-dir]   (default target/test-reports)
# Prints: "<suites> suites, <tests> tests, <failures> failures, <errors> errors"
# Exit 1 when the directory is missing/empty (run `sbt test` first).
dir="${1:-target/test-reports}"
set -- "$dir"/TEST-*.xml
[ -e "$1" ] || { echo "no reports in $dir — run 'sbt test' first" >&2; exit 1; }
# one <testsuite ...> root element per file; sum its counters
awk '
  /<testsuite[ >]/ {
    suites++
    for (i = 1; i <= NF; i++) {
      if ($i ~ /^tests="/)    { gsub(/[^0-9]/, "", $i); tests    += $i }
      if ($i ~ /^failures="/) { gsub(/[^0-9]/, "", $i); failures += $i }
      if ($i ~ /^errors="/)   { gsub(/[^0-9]/, "", $i); errors   += $i }
    }
  }
  END { printf "%d suites, %d tests, %d failures, %d errors\n", \
        suites, tests, failures, errors }
' "$@"
