#!/bin/sh
# Oracle gate: run the FULL query registry against the DuckDB oracle at
# sf0.001 and stamp the verified src/main content. The pre-commit hook
# (tools/hooks/pre-commit) compares the stamp against what is being
# committed, so no registry query can land unexecuted (the round-6 q90
# failure mode). Usage:
#   tools/gate.sh            # sf0.001 sweep (~2 min)
#   GATE_FULL=1 tools/gate.sh  # also sf0.01 (the driver's gate scale)
set -e
cd "$(git rev-parse --show-toplevel)"

# self-heal the hook installation (.git/hooks is not version-controlled)
if ! cmp -s tools/hooks/pre-commit .git/hooks/pre-commit 2>/dev/null; then
  cp tools/hooks/pre-commit .git/hooks/pre-commit
  chmod +x .git/hooks/pre-commit
  echo "[gate] installed pre-commit hook"
fi

out=/tmp/gate_out_001
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $out" >/tmp/gate_sbt.log 2>&1 || {
  echo "[gate] sbt Verify failed — tail of log:"; tail -20 /tmp/gate_sbt.log; exit 1; }
python3 tools/check_oracle.py /root/testdata/sf0.001 "$out"

if [ "${GATE_FULL:-0}" = "1" ]; then
  out01=/tmp/gate_out_01
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out01" >/tmp/gate_sbt01.log 2>&1 || {
    echo "[gate] sbt Verify (sf0.01) failed — tail of log:"; tail -20 /tmp/gate_sbt01.log; exit 1; }
  python3 tools/check_oracle.py /root/testdata/sf0.01 "$out01"
fi

# stamp = digest of the working-tree src/main that just verified green;
# the hook requires staged src/main == working tree, so this digest also
# describes the staged content being committed
find src/main -type f | LC_ALL=C sort | xargs sha1sum | sha1sum | cut -d' ' -f1 > .gate_stamp
echo "[gate] green — stamped $(cat .gate_stamp)"
