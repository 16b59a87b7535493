#!/bin/bash
# Back-to-back A/B bracket: runs .r16_profile.py on the SAME query list
# in the base worktree (/tmp/r16_base) and the working tree, minutes
# apart, so host drift is bracketed. Usage:
#   .r16_bracket.sh out_tag query1 query2 ...
set -u
TAG="$1"; shift
export SPARK_GRAFT_CPUS=32
export R16_PASSES="${R16_PASSES:-3}"
cd /tmp/r16_base && python .r16_profile.py "$@" >/tmp/r16_${TAG}_A.log 2>&1
cp /tmp/r16_profile.json /tmp/r16_${TAG}_A.json
cd /root/repo && python .r16_profile.py "$@" >/tmp/r16_${TAG}_B.log 2>&1
cp /tmp/r16_profile.json /tmp/r16_${TAG}_B.json
python3 - "$TAG" <<'EOF'
import json, sys
tag = sys.argv[1]
a = json.load(open(f"/tmp/r16_{tag}_A.json"))
b = json.load(open(f"/tmp/r16_{tag}_B.json"))
print(f"{'query':32s} {'base':>7s} {'new':>7s} {'delta':>7s}  (build: base->new)")
for k in a:
    if k in b:
        d = b[k]["total_min"] - a[k]["total_min"]
        print(f"{k:32s} {a[k]['total_min']:7.3f} {b[k]['total_min']:7.3f} {d:+7.3f}  "
              f"({a[k]['build_min']:.2f}->{b[k]['build_min']:.2f} / "
              f"{a[k]['exec_min']:.2f}->{b[k]['exec_min']:.2f})")
EOF
