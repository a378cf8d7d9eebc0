#!/usr/bin/env bash
# CI gate: the one command every change must pass before commit.
# Mirrors the role of the reference's Azure Pipelines `make distcheck`
# (/root/reference/azure-pipelines.yml:1-19) for this repo:
#   1. full unit-test suite on a virtual 8-device CPU mesh
#   2. single-chip compile check of the driver entry point
#   3. multi-chip sharding dry run (8 virtual devices)
# The real-hardware complement (kernel-vs-XLA equality on the chip this
# CPU gate cannot reach) is `python bench/chip_check.py` — run it after
# any kernel change; latest all-green record in docs/STATUS.md.
set -euo pipefail
cd "$(dirname "$0")"

echo "== pytest (virtual 8-device CPU mesh) =="
python -m pytest tests/ -x -q

echo "== entry() compile check + dryrun_multichip(8) =="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python __graft_entry__.py 8

echo "ci.sh: ALL GREEN"
