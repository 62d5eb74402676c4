#!/bin/bash
# Round-4 scaling campaign: replicated interleaved cells at 100k and 1.6M.
set -x
cd /root/repo
mkdir -p /tmp/cbruns4
# phase 1: n=100k, 5 interleaved reps, both profiles
REPS=5 PROFILES="full fast" CLUSTER_OUT=/tmp/cbruns4/c100k.jsonl \
  tools/run_cluster_scaling.sh 100000 /dev/shm/graft-c100k > /tmp/cbruns4/c100k.log 2>&1
# phase 2: n=1.6M, 3 interleaved reps, full profile
REPS=3 PROFILES=full CLUSTER_OUT=/tmp/cbruns4/c1600k.jsonl \
  tools/run_cluster_scaling.sh 1600000 /dev/shm/graft-c1600k > /tmp/cbruns4/c1600k.log 2>&1
echo CAMPAIGN_DONE
