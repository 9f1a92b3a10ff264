#!/usr/bin/env bash
# Multi-host TPU launch (↔ DiverGen/launch.sh:1-27, which plumbed AzureML
# RANK/NODE_COUNT env into torch.distributed). On TPU pods, one process per
# host runs the same command; jax.distributed.initialize() reads the TPU
# runtime's own rendezvous (no MASTER_ADDR needed on Cloud TPU). For
# non-TPU multi-host setups set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
# / JAX_PROCESS_ID before calling.
set -euo pipefail

CONFIG=${1:?usage: launch.sh <config.yaml> [extra train_net args...]}
shift || true

exec python train_net.py --config-file "$CONFIG" --multi-host "$@"
