"""sf1 dress-rehearsal GATE (round-11 judge item 6).

`scripts/scaling_curve.py --sf1` is the full rehearsal artifact
(SCALING.md §sf1); this is its thin in-suite tripwire: the three cheapest
rehearsal queries run at sf0.1 and at the consistent ×10 sf1 build, and
each t(sf1)/t(sf0.1) ratio must stay under 3× — so a plan regression that
only shows at scale (a join flipping to a driver broadcast, a window
collapsing to one task, a filter no longer pruning) trips here instead of
in a manual rehearsal run. The measured rehearsal ratios are 1.3–1.6×
(overhead-bound at this size), so 3× is generous against timing noise
while far below the ~10× a data-proportional regression would show.

Gating: skipped cleanly when /tmp space is short (the sf1 build lives
under /tmp, which the round driver wipes) or when the one-command build
fails — the same availability-gate discipline as the delta MERGE test.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF01 = "/root/testdata/sf0.1"
_MIN_FREE_BYTES = 2 << 30  # sf1 is ~10x the 17 MB sf0.1; 2 GiB is ample

# the three cheapest SF1_SUITE members with honest end-to-end warm paths
# (near_dup_pairs is cheaper but its warm run reads a persisted layout)
_GATE_QUERIES = ["pricing_summary", "events_sessionize", "join_three_way"]
_MAX_RATIO = 3.0


@pytest.fixture(scope="module")
def sf1_dir():
    from scripts.scaling_curve import SF1_DIR

    if shutil.disk_usage("/tmp").free < _MIN_FREE_BYTES:
        pytest.skip("insufficient /tmp space for the sf1 build")
    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(_REPO, "scripts", "scaling_curve.py"),
                "--build-sf1",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        if proc.returncode != 0:
            pytest.skip(f"sf1 build failed: {proc.stderr[-500:]}")
    return SF1_DIR


def test_sf1_ratio_under_gate(sf1_dir):
    # the rehearsal's own child protocol (fresh process per SF, the full
    # local[N] session, 1 cold + median of 3 warm): ratios are only
    # comparable to the SCALING.md expectations under the rehearsal's
    # parallelism — in the suite's local[4] session a healthy
    # data-proportional shuffle join already reads ~4x on the 10x step,
    # which the gate must not confuse with a regression.
    from scripts.scaling_curve import _run_child

    # wall-clock ratios are only meaningful on an otherwise-idle machine:
    # a concurrent build/audit slows the two child runs UNEVENLY (they run
    # back-to-back, minutes apart) and fakes a regression. The skip is
    # LOUD (reason carries the measured load) and can be disabled for an
    # idle-adjudication run with SF1_GATE_IGNORE_LOAD=1, so CI skips are
    # an explicit visible choice rather than a silently weakened gate.
    load, cpus = os.getloadavg()[0], os.cpu_count() or 1
    if load > 0.5 * cpus and not os.environ.get("SF1_GATE_IGNORE_LOAD"):
        pytest.skip(
            f"machine under load (loadavg {load:.1f} on {cpus} cpus) — "
            "wall-clock ratio gate unreliable; set SF1_GATE_IGNORE_LOAD=1 "
            "to force"
        )

    ratios: dict[str, float] = {}
    attempts: list[dict[str, float]] = []
    for attempt in (1, 2):  # re-measure once before declaring a regression
        t01 = _run_child(_SF01, _GATE_QUERIES, mem="8g")
        t1 = _run_child(sf1_dir, _GATE_QUERIES, mem="8g")
        ratios = {
            n: t1[n] / max(t01[n], 1e-9)
            for n in _GATE_QUERIES
            if n in t01 and n in t1
        }
        assert len(ratios) == len(_GATE_QUERIES)
        attempts.append({n: round(r, 2) for n, r in ratios.items()})
        if all(r < _MAX_RATIO for r in ratios.values()):
            break
        # a borderline first failure must leave a trace even when the
        # retry passes — print it so "passed on attempt 2" is visible in
        # the -s/-rA output, not silently swallowed
        print(
            f"sf1 gate attempt {attempt} over {_MAX_RATIO}x: {attempts[-1]}"
            " — retrying once",
            flush=True,
        )
    bad = {n: round(r, 2) for n, r in ratios.items() if r >= _MAX_RATIO}
    assert not bad, (
        f"sf1/sf0.1 wall-clock ratio >= {_MAX_RATIO}x on a 10x data step: "
        f"{bad} (all attempts: {attempts}) "
        "— a plan regression that only shows at scale; compare against "
        "SCALING.md §sf1 and re-run scripts/scaling_curve.py --sf1"
    )
