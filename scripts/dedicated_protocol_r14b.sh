#!/bin/bash
# r14 adjudication, second pass: the first pass's calibration bracket
# (A 0.96 -> B 1.439) showed the machine slowed mid-run, contaminating
# the later readings. Re-run those queries with a PER-QUERY calibration
# bracket so each reading carries its own machine-speed context.
set -u
cd /root/repo
OUT=scripts/dedicated_protocol_r14b.log
: > "$OUT"
for q in stream_session_window text_unigram_rarity \
         graph_kcore_membership graph_link_prediction; do
  echo "== cal before $q ==" >> "$OUT"
  python bench.py --calibrate 2>/dev/null | tail -1 >> "$OUT"
  echo "== $q dedicated ==" >> "$OUT"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python bench.py --only "$q" --protocol dedicated 2>/dev/null \
    | tail -1 >> "$OUT"
done
echo "== cal final ==" >> "$OUT"
python bench.py --calibrate 2>/dev/null | tail -1 >> "$OUT"
echo DONE >> "$OUT"
