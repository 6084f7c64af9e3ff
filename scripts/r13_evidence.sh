#!/bin/bash
# Round-13 evidence refresh — run serially on an idle machine (tmux).
# Regenerates every judge-read artifact ON THE ROUND HEAD; order puts the
# timing-sensitive steps (bench, scaling) last so nothing overlaps them.
cd /root/repo
export PYTHONPATH=/root/repo
set -x
python scripts/check_parity.py /root/testdata/sf0.01 > scripts/parity_run_r13.log 2>&1
python scripts/check_parity.py /root/testdata/sf0.1 > scripts/parity_run_r13_sf01.log 2>&1
python scripts/plan_audit.py > scripts/plan_audit_r13.log 2>&1
python scripts/layout_invariance_audit.py > scripts/layout_invariance_audit_r13.log 2>&1
python scripts/layout_invariance_audit.py --reshard > scripts/layout_invariance_reshard_r13.log 2>&1
python scripts/layout_invariance_audit.py --ansi > scripts/ansi_invariance_audit_r13.log 2>&1
python scripts/dirty_parity_audit.py > scripts/dirty_parity_audit_r13.log 2>&1
python scripts/dump_plans.py > /tmp/dump_plans_r13.log 2>&1
python bench.py > /tmp/bench_r13_stdout.log 2> /tmp/bench_r13_stderr.log
python scripts/scaling_curve.py --fresh > /tmp/scaling_fresh_r13.log 2>&1
python scripts/scaling_curve.py --sf1 > /tmp/scaling_sf1_r13.log 2>&1
echo R13_EVIDENCE_DONE > /tmp/r13_done.flag
