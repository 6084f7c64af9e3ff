#!/bin/bash
# Round-14 evidence refresh — run serially on an idle machine (tmux).
# Regenerates every judge-read artifact ON THE ROUND HEAD; order puts the
# timing-sensitive steps (bench, scaling) last so nothing overlaps them.
cd /root/repo
export PYTHONPATH=/root/repo
set -x
python scripts/check_parity.py /root/testdata/sf0.01 > scripts/parity_run_r14.log 2>&1
python scripts/check_parity.py /root/testdata/sf0.1 > scripts/parity_run_r14_sf01.log 2>&1
python scripts/plan_audit.py > scripts/plan_audit_r14.log 2>&1
python scripts/layout_invariance_audit.py > scripts/layout_invariance_audit_r14.log 2>&1
python scripts/layout_invariance_audit.py --reshard > scripts/layout_invariance_reshard_r14.log 2>&1
python scripts/layout_invariance_audit.py --ansi > scripts/ansi_invariance_audit_r14.log 2>&1
python scripts/dirty_parity_audit.py > scripts/dirty_parity_audit_r14.log 2>&1
python scripts/dump_plans.py > /tmp/dump_plans_r14.log 2>&1
python bench.py > /tmp/bench_r14_stdout.log 2> /tmp/bench_r14_stderr.log
python scripts/scaling_curve.py --fresh > /tmp/scaling_fresh_r14.log 2>&1
python scripts/scaling_curve.py --sf1 > /tmp/scaling_sf1_r14.log 2>&1
echo R14_EVIDENCE_DONE > /tmp/r14_done.flag
