#!/bin/bash
# Repeat-run discipline for the cross-process race spec: a single green
# run of a race proves nothing, so run ForkedCommitSpec N times (default
# 20) in one sbt session and stop at the first failure. VERDICT r6
# "Next round" #1 sets the bar: >= 20 consecutive green runs.
set -u
N="${1:-20}"
# A non-numeric N would make seq emit nothing and 'sbt -batch' run zero
# commands, reporting exit=0 as if all runs were green (ADVICE r7).
case "$N" in ''|*[!0-9]*|0) echo "racetest: N must be a positive integer, got '$N'" >&2; exit 2;; esac
cd "$(dirname "$0")/.." || exit 1
CMDS=""
for _ in $(seq "$N"); do CMDS="$CMDS \"testOnly graft.ForkedCommitSpec\""; done
eval "sbt -batch $CMDS"
rc=$?
echo "racetest: exit=$rc (0 means all $N runs green; sbt stops at the first red)"
exit $rc
