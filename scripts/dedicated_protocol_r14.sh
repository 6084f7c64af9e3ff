#!/bin/bash
# r14 adjudication runs (timing-sensitive — run ALONE on an idle machine):
#  - VERDICT r13 item 3: dedicated-session (§12 protocol: fresh process,
#    2 warmups, median of 7) readings ×2 for the five BIMODAL anchors not
#    yet migrated to the dedicated protocol.
#  - VERDICT r13 item 4: the same protocol for the two graph-family creep
#    queries (1.13–1.16× two rounds running), bracketed by calibration A/B
#    so "machine vs code" is decided by data.
set -u
cd /root/repo
OUT=scripts/dedicated_protocol_r14.log
: > "$OUT"
echo "== calibration A ==" >> "$OUT"
python bench.py --calibrate 2>/dev/null | tail -1 >> "$OUT"
for q in embed_cosine_topk embed_ann_topk embed_ann_multiprobe \
         stream_session_window text_unigram_rarity \
         graph_kcore_membership graph_link_prediction; do
  for i in 1 2; do
    echo "== $q dedicated #$i ==" >> "$OUT"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python bench.py --only "$q" --protocol dedicated 2>/dev/null \
      | tail -1 >> "$OUT"
  done
done
echo "== calibration B ==" >> "$OUT"
python bench.py --calibrate 2>/dev/null | tail -1 >> "$OUT"
echo DONE >> "$OUT"
