#!/bin/bash
# The reference-scale quad run (results/quad_full): 500 frames /
# 10 submaps / capacity 10 / 512^3 mesh, with the fresh-process prewarm
# pass populating the persistent XLA cache first (compiles in an aged
# process run ~10x slower on the axon tunnel, CLAUDE.md rule 7).
#
# Usage: bash scripts/run_quad_full.sh [extra demo flags...]
set -e
cd "$(dirname "$0")/.."
ARGS="--synthetic --scene quad --num_frames 500 --submap_size 50
      --capacity 10 --mesh_resolution 512 --save_dir results/quad_full"
echo "=== prewarm pass (fresh process, AOT compiles only) ==="
timeout 3600 python -u demo/full_slam_newer_college.py $ARGS --prewarm_only "$@"
echo "=== run ==="
timeout 14400 python -u demo/full_slam_newer_college.py $ARGS "$@"
